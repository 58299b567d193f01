#!/usr/bin/env python
"""Seeded shuffle split: first 10 % of crops labeled.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu import paths
from inconsistencymasks_tpu.config import load_config
from inconsistencymasks_tpu.preprocess import hela_split_labeled_unlabeled

if __name__ == "__main__":
    cfg = load_config()
    hela_split_labeled_unlabeled(paths.HELA_TRAIN_FULL_DIR,
                                 paths.HELA_TRAIN_LABELED_DIR,
                                 paths.HELA_TRAIN_UNLABELED_DIR,
                                 cfg.defaults.seed,
                                 cfg.hela.use_mod_pos_size)

