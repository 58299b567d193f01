#!/usr/bin/env python
"""IM+ = IM + noisy-student-style augmentation of blocked pairs.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu.pipeline import make_adapter, \
    run_im_plus_stage

if __name__ == "__main__":
    ad = make_adapter("cityscapes", default_n_values=(2,))
    run_im_plus_stage(ad)

