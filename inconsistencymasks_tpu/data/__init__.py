from .loader import (
    Dataset,
    list_pngs,
    load_hela_dataset,
    load_image_mask_dataset,
    load_images,
    stream_batches,
)

__all__ = [
    "Dataset", "list_pngs", "load_hela_dataset", "load_image_mask_dataset",
    "load_images", "stream_batches",
]
