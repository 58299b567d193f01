from .hela import get_cell_count, get_min_dist, get_pos_contours, mod_pos_size

__all__ = ["get_cell_count", "get_min_dist", "get_pos_contours",
           "mod_pos_size"]
