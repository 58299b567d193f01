"""Class-id <-> color tables for the multiclass datasets.

Reference: SUIM/SUIM_class_mapping.py:3-38 and
Cityscapes/Cityscapes_class_mapping.py:1-120.  In both datasets **class 0 is
reserved for the Inconsistency Mask** and the original dataset classes are
shifted by +1 (reference SUIM/00_SUIM_convert_bmp_to_png_masks.py,
Cityscapes/00_Cityscapes_resize_images_and_masks.py); Cityscapes' license
plate keeps its original sentinel id -1.
"""

from __future__ import annotations

import numpy as np

# (class_id, rgb, description) — SUIM with the IM class prepended at id 0.
SUIM_CLASSES = [
    (0, (211, 211, 211), "IM"),
    (1, (0, 0, 0), "Background (waterbody)"),
    (2, (0, 0, 255), "Human divers"),
    (3, (0, 255, 0), "Aquatic plants and sea-grass"),
    (4, (0, 255, 255), "Wrecks and ruins"),
    (5, (255, 0, 0), "Robots (AUVs/ROVs/instruments)"),
    (6, (255, 0, 255), "Reefs and invertebrates"),
    (7, (255, 255, 0), "Fish and vertebrates"),
    (8, (255, 255, 255), "Sea-floor and rocks"),
]

# Cityscapes class names in original gtFine order (ids 0..33 + license plate).
_CITYSCAPES_NAMES = [
    "Unlabeled", "Ego vehicle", "Rectification border", "Out of roi",
    "Static", "Dynamic", "Ground", "Road", "Sidewalk", "Parking",
    "Rail track", "Building", "Wall", "Fence", "Guard rail", "Bridge",
    "Tunnel", "Pole", "Polegroup", "Traffic light", "Traffic sign",
    "Vegetation", "Terrain", "Sky", "Person", "Rider", "Car", "Truck",
    "Bus", "Caravan", "Trailer", "Train", "Motorcycle", "Bicycle",
]

# The palette the reference assigns to consecutive class ids (same palette for
# the original and the +1-shifted table; id -> color is positional).
_PALETTE = [
    (0, 0, 0), (0, 0, 128), (0, 128, 0), (0, 128, 128),
    (128, 0, 0), (128, 0, 128), (128, 128, 0), (128, 128, 128),
    (0, 0, 64), (0, 0, 192), (0, 128, 64), (0, 128, 192),
    (128, 0, 64), (128, 0, 192), (128, 128, 64), (128, 128, 192),
    (0, 64, 0), (0, 64, 128), (0, 192, 0), (0, 192, 128),
    (128, 64, 0), (128, 64, 128), (128, 192, 0), (128, 192, 128),
    (0, 64, 64), (0, 64, 192), (0, 192, 64), (0, 192, 192),
    (128, 64, 64), (128, 64, 192), (128, 192, 64), (128, 192, 192),
    (64, 0, 0), (64, 0, 128), (64, 128, 0),
]

CITYSCAPES_CLASSES = (
    [(0, _PALETTE[0], "IM")]
    + [(i + 1, _PALETTE[i + 1], name) for i, name in enumerate(_CITYSCAPES_NAMES)]
    + [(-1, (192, 192, 192), "License plate")]
)

CITYSCAPES_CLASSES_ORG = (
    [(i, _PALETTE[i], name) for i, name in enumerate(_CITYSCAPES_NAMES)]
    + [(-1, (192, 192, 192), "License plate")]
)


def _color_to_class(table):
    return {rgb: cid for cid, rgb, _ in table}


def _class_to_color(table):
    return {cid: rgb for cid, rgb, _ in table}


COLOR_TO_CLASS_MAPPING_SUIM = _color_to_class(SUIM_CLASSES)
CLASS_TO_COLOR_MAPPING_SUIM = _class_to_color(SUIM_CLASSES)
COLOR_TO_CLASS_MAPPING_SUIM_ORG = {
    rgb: cid - 1 for cid, rgb, _ in SUIM_CLASSES if cid >= 1}

COLOR_TO_CLASS_MAPPING_CITYSCAPES = _color_to_class(CITYSCAPES_CLASSES)
CLASS_TO_COLOR_MAPPING_CITYSCAPES = _class_to_color(CITYSCAPES_CLASSES)
COLOR_TO_CLASS_MAPPING_CITYSCAPES_ORG = _color_to_class(CITYSCAPES_CLASSES_ORG)

SUIM_CLASS_DESCRIPTION = {cid: desc for cid, _, desc in SUIM_CLASSES}
CITYSCAPES_CLASS_DESCRIPTION = {cid: desc for cid, _, desc in CITYSCAPES_CLASSES}


def class_to_color_lut(mapping: dict, num_classes: int) -> np.ndarray:
    """(num_classes, 3) uint8 LUT for vectorised class-id -> RGB conversion
    (replaces the reference's per-pixel dict loop in
    functions.py:6127-6149 ``convert_class_to_color_mask``)."""
    lut = np.zeros((num_classes, 3), dtype=np.uint8)
    for cid, rgb in mapping.items():
        if 0 <= cid < num_classes:
            lut[cid] = rgb
    return lut


def color_mask_to_class_ids(color_mask: np.ndarray, mapping: dict,
                            default: int = 0) -> np.ndarray:
    """Vectorised RGB mask -> class-id mask (reference converts BMP masks
    per-color in SUIM/00_SUIM_convert_bmp_to_png_masks.py)."""
    h, w = color_mask.shape[:2]
    out = np.full((h, w), default, dtype=np.int32)
    for rgb, cid in mapping.items():
        match = np.all(color_mask == np.asarray(rgb, dtype=color_mask.dtype),
                       axis=-1)
        out[match] = cid
    return out
