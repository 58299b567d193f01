#!/usr/bin/env python
"""Resize by 0.2 (dims up to mult. of 16); mask ids +1 where >0.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu import paths
from inconsistencymasks_tpu.config import load_config
from inconsistencymasks_tpu.preprocess import cityscapes_resize

if __name__ == "__main__":
    cfg = load_config().cityscapes
    cityscapes_resize(paths.CITYSCAPES_ORG_TRAIN_IMAGES_DIR,
                      paths.CITYSCAPES_ORG_TRAIN_MASKS_DIR,
                      paths.CITYSCAPES_TRAIN_FULL_IMAGES_DIR,
                      paths.CITYSCAPES_TRAIN_FULL_MASKS_DIR,
                      cfg.resize_factor)
    cityscapes_resize(paths.CITYSCAPES_ORG_VAL_IMAGES_DIR,
                      paths.CITYSCAPES_ORG_VAL_MASKS_DIR,
                      paths.CITYSCAPES_ORG_VAL_TEST_IMAGES_DIR,
                      paths.CITYSCAPES_ORG_VAL_TEST_MASKS_DIR,
                      cfg.resize_factor)

