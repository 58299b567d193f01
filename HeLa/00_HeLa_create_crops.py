#!/usr/bin/env python
"""Sliding 256^2 crops (overlap 0.6) over the 4 HeLa channels.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os
from inconsistencymasks_tpu import paths
from inconsistencymasks_tpu.config import load_config
from inconsistencymasks_tpu.preprocess import hela_create_crops

if __name__ == "__main__":
    cfg = load_config().hela
    for split in ("train_full", "val", "test"):
        hela_create_crops(os.path.join(paths.HELA_ORG_DIR, split),
                          os.path.join(paths.HELA_BASE_DIR, split),
                          use_mod_pos_size=cfg.use_mod_pos_size)

