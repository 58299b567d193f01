"""Directory-layout registry, reproducing the reference's path contract.

The reference defines ~180 module-level constants in ``paths.py:10-201``; the
layout (original_data / train_full / train_labeled / train_labeled_aug /
train_unlabeled / val / test / models / csv, with HeLa's per-channel subdirs)
is the public on-disk API of the pipeline — generations communicate through
it.  Here the same names are generated from the per-dataset base dirs in
config.ini so user scripts can ``from inconsistencymasks_tpu import paths``
exactly as they would import the reference's ``paths``.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

from .config import FrameworkConfig, load_config

_J = os.path.join

# HeLa channel subdirectories (reference paths.py:46-50: brightfield/alive/
# dead/pos/mod_position)
HELA_CHANNELS = ("brightfield", "alive", "dead", "pos", "mod_position")
_HELA_CHANNEL_SUFFIX = {
    "brightfield": "BRIGHTFIELD",
    "alive": "ALIVE",
    "dead": "DEAD",
    "pos": "POS",
    "mod_position": "MOD_POS",
}


def build_paths(cfg: FrameworkConfig) -> SimpleNamespace:
    """Build the full constant set for all four datasets."""
    ns = SimpleNamespace()
    p = ns.__dict__

    # ----------------------------------------------------------- ISIC 2018
    base = cfg.isic_2018.base_dir
    p["ISIC_2018_BASE_DIR"] = base
    org = _J(base, "original_data")
    p["ISIC_2018_ORG_TRAIN_IMAGES_DIR"] = _J(org, "ISIC2018_Task1-2_Training_Input")
    p["ISIC_2018_ORG_TRAIN_MASKS_DIR"] = _J(org, "ISIC2018_Task1_Training_GroundTruth")
    p["ISIC_2018_ORG_VAL_IMAGES_DIR"] = _J(org, "ISIC2018_Task1-2_Validation_Input")
    p["ISIC_2018_ORG_VAL_MASKS_DIR"] = _J(org, "ISIC2018_Task1_Validation_GroundTruth")
    p["ISIC_2018_ORG_TEST_IMAGES_DIR"] = _J(org, "ISIC2018_Task1-2_Test_Input")
    p["ISIC_2018_ORG_TEST_MASKS_DIR"] = _J(org, "ISIC2018_Task1_Test_GroundTruth")
    for split, const in [("train_full", "TRAIN_FULL"), ("val", "VAL"),
                         ("test", "TEST"), ("train_unlabeled", "TRAIN_UNLABELED")]:
        p[f"ISIC_2018_{const}_IMAGES_DIR"] = _J(base, split, "images")
        p[f"ISIC_2018_{const}_MASKS_DIR"] = _J(base, split, "masks")
    p["ISIC_2018_TRAIN_LABELED_MAIN_DIR"] = _J(base, "train_labeled")
    p["ISIC_2018_TRAIN_LABELED_IMAGES_DIR"] = _J(base, "train_labeled", "images")
    p["ISIC_2018_TRAIN_LABELED_MASKS_DIR"] = _J(base, "train_labeled", "masks")
    p["ISIC_2018_TRAIN_LABELED_AUG_MAIN_DIR"] = _J(base, "train_labeled_aug")
    p["ISIC_2018_TRAIN_LABELED_AUG_IMAGES_DIR"] = _J(base, "train_labeled_aug", "images")
    p["ISIC_2018_TRAIN_LABELED_AUG_MASKS_DIR"] = _J(base, "train_labeled_aug", "masks")
    p["ISIC_2018_MODEL_DIR"] = _J(base, "models")
    p["ISIC_2018_CSV_DIR"] = _J(base, "csv")

    # ---------------------------------------------------------------- HeLa
    base = cfg.hela.base_dir
    p["HELA_BASE_DIR"] = base
    p["HELA_ORG_DIR"] = _J(base, "original_data")
    for split, const in [
        (_J("original_data", "train"), "ORG_TRAIN"),
        (_J("original_data", "val"), "ORG_VAL"),
        (_J("original_data", "test"), "ORG_TEST"),
        ("train_full", "TRAIN_FULL"),
        ("train_labeled", "TRAIN_LABELED"),
        ("train_labeled_aug", "TRAIN_LABELED_AUG"),
        ("train_unlabeled", "TRAIN_UNLABELED"),
        ("val", "VAL"),
        ("test", "TEST"),
    ]:
        p[f"HELA_{const}_DIR"] = _J(base, split)
        for chan in HELA_CHANNELS:
            p[f"HELA_{const}_{_HELA_CHANNEL_SUFFIX[chan]}_DIR"] = _J(base, split, chan)
    p["HELA_MODEL_DIR"] = _J(base, "models")
    p["HELA_CSV_DIR"] = _J(base, "csv")

    # ---------------------------------------------------------------- SUIM
    base = cfg.suim.base_dir
    p["SUIM_BASE_DIR"] = base
    org = _J(base, "original_data")
    p["SUIM_ORG_DATA_DIR"] = org
    for split, const in [("train_full", "ORG_TRAIN_FULL"),
                         ("train_labeled", "ORG_TRAIN_LABELED"),
                         ("train_unlabeled", "ORG_TRAIN_UNLABELED"),
                         ("val", "ORG_VAL")]:
        p[f"SUIM_{const}_IMAGES_DIR"] = _J(org, split, "images")
        p[f"SUIM_{const}_MASKS_DIR"] = _J(org, split, "masks")
    p["SUIM_ORG_TRAIN_VAL_IMAGES_DIR"] = _J(org, "train_val", "images")
    p["SUIM_ORG_TRAIN_VAL_MASKS_BMP_DIR"] = _J(org, "train_val", "masks")
    p["SUIM_ORG_TRAIN_VAL_MASKS_PNG_DIR"] = _J(org, "train_val", "masks_png")
    p["SUIM_ORG_TEST_IMAGES_DIR"] = _J(org, "TEST", "images")
    p["SUIM_ORG_TEST_MASKS_BMP_PATH"] = _J(org, "TEST", "masks")
    p["SUIM_ORG_TEST_MASKS_PNG_PATH"] = _J(org, "TEST", "masks_png")
    for split, const in [("train_full", "TRAIN_FULL"),
                         ("train_labeled", "TRAIN_LABELED"),
                         ("train_labeled_aug", "TRAIN_LABELED_AUG"),
                         ("val", "VAL"), ("test", "TEST"),
                         ("train_unlabeled", "TRAIN_UNLABELED")]:
        p[f"SUIM_{const}_MAIN_DIR"] = _J(base, split)
        p[f"SUIM_{const}_IMAGES_DIR"] = _J(base, split, "images")
        p[f"SUIM_{const}_MASKS_DIR"] = _J(base, split, "masks")
    p["SUIM_MODEL_DIR"] = _J(base, "models")
    p["SUIM_CSV_DIR"] = _J(base, "csv")

    # ---------------------------------------------------------- Cityscapes
    base = cfg.cityscapes.base_dir
    p["CITYSCAPES_BASE_DIR"] = base
    org = _J(base, "original_data")
    p["CITYSCAPES_ORG_DATA_DIR"] = org
    p["CITYSCAPES_ORG_TRAIN_IMAGES_DIR"] = _J(org, "leftImg8bit", "train")
    p["CITYSCAPES_ORG_TRAIN_MASKS_DIR"] = _J(org, "gtFine", "train")
    p["CITYSCAPES_ORG_VAL_IMAGES_DIR"] = _J(org, "leftImg8bit", "val")
    p["CITYSCAPES_ORG_VAL_MASKS_DIR"] = _J(org, "gtFine", "val")
    p["CITYSCAPES_ORG_VAL_TEST_IMAGES_DIR"] = _J(org, "val_test", "images")
    p["CITYSCAPES_ORG_VAL_TEST_MASKS_DIR"] = _J(org, "val_test", "masks")
    for split, const in [("train_full", "TRAIN_FULL"),
                         ("train_labeled", "TRAIN_LABELED"),
                         ("train_labeled_aug", "TRAIN_LABELED_AUG"),
                         ("train_unlabeled", "TRAIN_UNLABELED"),
                         ("val", "VAL"), ("test", "TEST")]:
        p[f"CITYSCAPES_{const}_MAIN_DIR"] = _J(base, split)
        p[f"CITYSCAPES_{const}_IMAGES_DIR"] = _J(base, split, "images")
        p[f"CITYSCAPES_{const}_MASKS_DIR"] = _J(base, split, "masks")
    p["CITYSCAPES_MODEL_DIR"] = _J(base, "models")
    p["CITYSCAPES_CSV_DIR"] = _J(base, "csv")

    return ns


# Module-level constants for drop-in compatibility with `import paths`.
_cfg = None
try:
    _cfg = load_config()
except FileNotFoundError:
    pass

if _cfg is not None:
    globals().update(build_paths(_cfg).__dict__)


def refresh(cfg: FrameworkConfig | None = None) -> None:
    """Re-derive all module constants (e.g. after changing $IM_CONFIG)."""
    global _cfg
    _cfg = cfg or load_config()
    globals().update(build_paths(_cfg).__dict__)
