#!/usr/bin/env python
"""Split org train_val into train_full/val, then labeled/unlabeled.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu import paths
from inconsistencymasks_tpu.preprocess import split_image_mask_dirs

if __name__ == "__main__":
    split_image_mask_dirs(paths.SUIM_ORG_TRAIN_VAL_IMAGES_DIR,
                          paths.SUIM_ORG_TRAIN_VAL_MASKS_PNG_DIR,
                          paths.SUIM_ORG_DATA_DIR, ["train_full", "val"],
                          0.1, 42, image_ext=".jpg")
    split_image_mask_dirs(paths.SUIM_ORG_TRAIN_FULL_IMAGES_DIR,
                          paths.SUIM_ORG_TRAIN_FULL_MASKS_DIR,
                          paths.SUIM_ORG_DATA_DIR,
                          ["train_unlabeled", "train_labeled"], 0.1, 42,
                          image_ext=".jpg")

