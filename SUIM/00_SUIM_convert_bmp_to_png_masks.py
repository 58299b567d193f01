#!/usr/bin/env python
"""Color BMP masks -> class-id PNGs (IM-shifted SUIM mapping).

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu import paths
from inconsistencymasks_tpu.class_mappings import COLOR_TO_CLASS_MAPPING_SUIM
from inconsistencymasks_tpu.preprocess import suim_convert_bmp_masks

if __name__ == "__main__":
    suim_convert_bmp_masks(paths.SUIM_ORG_TRAIN_VAL_MASKS_BMP_DIR,
                           paths.SUIM_ORG_TRAIN_VAL_MASKS_PNG_DIR,
                           COLOR_TO_CLASS_MAPPING_SUIM)
    suim_convert_bmp_masks(paths.SUIM_ORG_TEST_MASKS_BMP_PATH,
                           paths.SUIM_ORG_TEST_MASKS_PNG_PATH,
                           COLOR_TO_CLASS_MAPPING_SUIM)

