#!/usr/bin/env python
"""Two random 256-512 px crops per image resized to 256^2.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu import paths
from inconsistencymasks_tpu.preprocess import suim_create_random_crops

if __name__ == "__main__":
    for img_dir, mask_dir, out in [
        (paths.SUIM_ORG_TRAIN_FULL_IMAGES_DIR,
         paths.SUIM_ORG_TRAIN_FULL_MASKS_DIR, paths.SUIM_TRAIN_FULL_MAIN_DIR),
        (paths.SUIM_ORG_TRAIN_LABELED_IMAGES_DIR,
         paths.SUIM_ORG_TRAIN_LABELED_MASKS_DIR,
         paths.SUIM_TRAIN_LABELED_MAIN_DIR),
        (paths.SUIM_ORG_TRAIN_UNLABELED_IMAGES_DIR,
         paths.SUIM_ORG_TRAIN_UNLABELED_MASKS_DIR,
         paths.SUIM_TRAIN_UNLABELED_MAIN_DIR),
        (paths.SUIM_ORG_VAL_IMAGES_DIR, paths.SUIM_ORG_VAL_MASKS_DIR,
         paths.SUIM_VAL_MAIN_DIR),
        (paths.SUIM_ORG_TEST_IMAGES_DIR, paths.SUIM_ORG_TEST_MASKS_PNG_PATH,
         paths.SUIM_TEST_MAIN_DIR),
    ]:
        suim_create_random_crops(img_dir, mask_dir, out, 2)

