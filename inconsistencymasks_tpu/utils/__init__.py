from .csv_io import write_results_csv

__all__ = ["write_results_csv"]
