#!/usr/bin/env python
"""Split train_full into 10 % labeled / 90 % unlabeled (seed 42).

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
    cfg = load_config()
    split_image_mask_dirs(paths.ISIC_2018_TRAIN_FULL_IMAGES_DIR,
                          paths.ISIC_2018_TRAIN_FULL_MASKS_DIR,
                          paths.ISIC_2018_BASE_DIR,
                          ["train_labeled", "train_unlabeled"], 0.9,
                          cfg.defaults.seed)

