#!/usr/bin/env python
"""Split train into labeled/unlabeled (0.9) and org val into val/test.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu import paths
from inconsistencymasks_tpu.config import load_config
from inconsistencymasks_tpu.preprocess import split_image_mask_dirs

if __name__ == "__main__":
    seed = load_config().defaults.seed
    split_image_mask_dirs(paths.CITYSCAPES_TRAIN_FULL_IMAGES_DIR,
                          paths.CITYSCAPES_TRAIN_FULL_MASKS_DIR,
                          paths.CITYSCAPES_BASE_DIR,
                          ["train_labeled", "train_unlabeled"], 0.9, seed)
    split_image_mask_dirs(paths.CITYSCAPES_ORG_VAL_TEST_IMAGES_DIR,
                          paths.CITYSCAPES_ORG_VAL_TEST_MASKS_DIR,
                          paths.CITYSCAPES_BASE_DIR, ["val", "test"], 0.5,
                          seed)

