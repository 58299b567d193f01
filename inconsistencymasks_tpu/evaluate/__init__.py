from .benchmark import benchmark_binary, benchmark_hela, benchmark_multiclass

__all__ = ["benchmark_binary", "benchmark_hela", "benchmark_multiclass"]
