#!/usr/bin/env python
"""Resize ISIC originals to 256^2 PNGs; strip _segmentation suffix.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu import paths
from inconsistencymasks_tpu.config import load_config
from inconsistencymasks_tpu.preprocess import preprocess_isic

if __name__ == "__main__":
    cfg = load_config().isic_2018
    preprocess_isic(
        [(paths.ISIC_2018_ORG_TRAIN_IMAGES_DIR,
          paths.ISIC_2018_TRAIN_FULL_IMAGES_DIR),
         (paths.ISIC_2018_ORG_VAL_IMAGES_DIR, paths.ISIC_2018_VAL_IMAGES_DIR),
         (paths.ISIC_2018_ORG_TEST_IMAGES_DIR,
          paths.ISIC_2018_TEST_IMAGES_DIR)],
        [(paths.ISIC_2018_ORG_TRAIN_MASKS_DIR,
          paths.ISIC_2018_TRAIN_FULL_MASKS_DIR),
         (paths.ISIC_2018_ORG_VAL_MASKS_DIR, paths.ISIC_2018_VAL_MASKS_DIR),
         (paths.ISIC_2018_ORG_TEST_MASKS_DIR,
          paths.ISIC_2018_TEST_MASKS_DIR)],
        cfg.image_height, cfg.image_width)

