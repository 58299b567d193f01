#!/usr/bin/env python
"""Generate the numbered zero-arg pipeline scripts (the reference CLI
contract: same script names, run in order, no arguments).  Each script is a
thin wrapper over inconsistencymasks_tpu.pipeline / .preprocess."""

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADER = '''\
#!/usr/bin/env python
"""{doc}

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
'''


def w(path, doc, body):
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        f.write(HEADER.format(doc=doc))
        f.write(body)
        f.write("\n")
    print("wrote", path)


ADAPTER = {
    "ISIC_2018": "isic", "HeLa": "hela", "SUIM": "suim",
    "Cityscapes": "cityscapes",
}


def training_body(key, call, n_grid=None):
    import re
    runners = sorted(set(re.findall(r"\brun_\w+", call)))
    # n_grid: the reference script's `for n in range(a, b)` grid when it
    # differs from the (2, 3, 4) default — passed as default_n_values so
    # the IM_N_VALUES smoke-test knob still overrides it.
    mk = (f'make_adapter("{key}")' if n_grid is None
          else f'make_adapter("{key}", default_n_values={n_grid!r})')
    return f'''
from inconsistencymasks_tpu.pipeline import make_adapter, \\
    {", ".join(runners)}

if __name__ == "__main__":
    ad = {mk}
    {call}
'''


# Reference n grids per (dataset, stage) where they differ from the
# (2, 3, 4) default — each is `for n in range(2, 3)` i.e. n=2 ONLY in the
# reference script (citations: HeLa/11:58, Cityscapes/11:59, HeLa/12:150,
# SUIM/13:155, Cityscapes/12:155, HeLa/13:58, ISIC_2018/14:151,
# HeLa/14:150, Cityscapes/14:155, SUIM/15:155, SUIM/16:65).
N2 = (2,)
N_GRIDS = {
    ("HeLa", "imp"): N2, ("Cityscapes", "imp"): N2,
    ("HeLa", "impp"): N2, ("SUIM", "impp"): N2, ("Cityscapes", "impp"): N2,
    ("HeLa", "aimp"): N2,
    ("ISIC_2018", "aimpp"): N2, ("HeLa", "aimpp"): N2,
    ("Cityscapes", "aimpp"): N2, ("SUIM", "aimpp"): N2,
}


# stage -> (script number per dataset, call)
# ISIC/HeLa/Cityscapes use 02..14; SUIM shifts by +1 after 02 (crops).
def emit_dataset(prefix, key, numbers):
    n = numbers
    w(f"{prefix}/{n['full']}_{prefix}_full_dataset.py",
      "FDT: supervised training on the full labeled set.",
      training_body(key, 'run_supervised_stage(ad, "full_dataset", '
                         'ad.train_full_dir)'))
    w(f"{prefix}/{n['subset']}_{prefix}_subset.py",
      "LDT: supervised training on the 10 % labeled subset.",
      training_body(key, 'run_supervised_stage(ad, "subset", '
                         'ad.train_labeled_dir)'))
    w(f"{prefix}/{n['subset_aug']}_{prefix}_subset_aug.py",
      "ALDT: augment the labeled subset 9x, then supervised training.",
      training_body(key, "run_aldt_stage(ad)"))
    w(f"{prefix}/{n['cs']}_{prefix}_consistency_loss.py",
      "Consistency-loss semi-supervised training (3 aug strengths).",
      training_body(key, "run_consistency_stage(ad)"))
    w(f"{prefix}/{n['me']}_{prefix}_model_ensemble.py",
      "Model-ensemble pseudo-labeling over 5 generations.",
      training_body(key, "run_model_ensemble_stage(ad)"))
    w(f"{prefix}/{n['ie']}_{prefix}_input_ensemble.py",
      "Input-ensemble (TTA) pseudo-labeling over 5 generations.",
      training_body(key, "run_input_ensemble_stage(ad)"))
    w(f"{prefix}/{n['ns']}_{prefix}_noisy_student.py",
      "Noisy-Student self-training with growing alpha/noise.",
      training_body(key, "run_noisy_student_stage(ad)"))
    w(f"{prefix}/{n['im']}_{prefix}_IM.py",
      "Inconsistency-Mask pseudo-labeling over 5 generations.",
      training_body(key, "run_im_stage(ad)"))
    w(f"{prefix}/{n['imp']}_{prefix}_IM+.py",
      "IM+ = IM + noisy-student-style augmentation of blocked pairs.",
      training_body(key, "run_im_plus_stage(ad)",
                    n_grid=N_GRIDS.get((prefix, "imp"))))
    w(f"{prefix}/{n['impp']}_{prefix}_IM++.py",
      "IM++ = IM+ + on-the-fly EvalNet-IM ensemble + adaptive 1-5x "
      "augmentation.",
      training_body(key, "run_im_plus_plus_stage(ad)",
                    n_grid=N_GRIDS.get((prefix, "impp"))))
    w(f"{prefix}/{n['aimp']}_{prefix}_aug_IM+.py",
      "AIM+ = IM+ seeded from ALDT models and the augmented labeled set.",
      training_body(
          key, 'run_im_plus_stage(ad, approach="aug_IM_plus", '
               'seed_approach="subset_aug", '
               'labeled_source=ad.train_labeled_aug_dir, '
               'keep_unaugmented=True)',
          n_grid=N_GRIDS.get((prefix, "aimp"))))
    aimpp_name = (f"{prefix}/15_SUIM_aug_IBAs++.py" if prefix == "SUIM"
                  else f"{prefix}/{n['aimpp']}_{prefix}_aug_IM++.py")
    w(aimpp_name,
      "AIM++ = IM++ seeded from ALDT models and the augmented labeled set.",
      training_body(
          key, 'run_im_plus_plus_stage(ad, approach="aug_IM_plus_plus", '
               'seed_approach="subset_aug", '
               'labeled_source=ad.train_labeled_aug_dir, '
               'evalnet_tag="evalnet_aug_im")',
          n_grid=N_GRIDS.get((prefix, "aimpp"))))


NUM_STD = dict(full="02", subset="03", subset_aug="04", cs="05", me="06",
               ie="07", ns="08", im="09", imp="11", impp="12", aimp="13",
               aimpp="14")
NUM_SUIM = dict(full="03", subset="04", subset_aug="05", cs="06", me="07",
                ie="08", ns="09", im="10", imp="12", impp="13", aimp="14",
                aimpp="15")

emit_dataset("ISIC_2018", "isic", NUM_STD)
emit_dataset("HeLa", "hela", NUM_STD)
emit_dataset("Cityscapes", "cityscapes", NUM_STD)
emit_dataset("SUIM", "suim", NUM_SUIM)

# ------------------------------------------------------- evalnet scripts
w("ISIC_2018/10_ISIC_2018_evalnet.py",
  "EvalNet quality-filtering loop (single EvalNet).",
  training_body("isic", "run_evalnet_segnet_stage(ad, variant=\"single\")"))
w("ISIC_2018/10_ISIC_2018_evalnet_ensemble.py",
  "EvalNet-ensemble quality-filtering loop.",
  training_body("isic", "run_evalnet_segnet_stage(ad)"))
w("HeLa/10_HeLa_evalnet_miou_ensemble.py",
  "Two-head EvalNet-mIoU ensemble filtering loop.",
  training_body("hela", "run_evalnet_segnet_stage(ad)"))
w("SUIM/11_SUIM_evalnet_miou.py",
  "Two-head EvalNet-mIoU (single) filtering loop.",
  training_body("suim", "run_evalnet_segnet_stage(ad, variant=\"single\")"))
w("SUIM/11_SUIM_evalnet_miou_ensemble.py",
  "Two-head EvalNet-mIoU ensemble filtering loop.",
  training_body("suim", "run_evalnet_segnet_stage(ad)"))
w("Cityscapes/10_Cityscapes_evalnet_miou_ensemble.py",
  "Two-head EvalNet-mIoU ensemble filtering loop.",
  training_body("cityscapes", "run_evalnet_segnet_stage(ad)"))
w("SUIM/16_SUIM_GT_IM++.py",
  "GT-IM++ oracle: IM++ with true-GT mIoU instead of an EvalNet.",
  training_body("suim",
                'run_im_plus_plus_stage(ad, approach="GT_IM_plus_plus", '
                'use_gt_oracle=True)', n_grid=N2))

# ------------------------------------------------ preprocessing scripts
w("ISIC_2018/00_ISIC_2018_preprocess_images.py",
  "Resize ISIC originals to 256^2 PNGs; strip _segmentation suffix.", '''
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
''')
w("ISIC_2018/01_ISIC_2018_split_original_train.py",
  "Split train_full into 10 % labeled / 90 % unlabeled (seed 42).", '''
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
''')
w("HeLa/00_HeLa_create_crops.py",
  "Sliding 256^2 crops (overlap 0.6) over the 4 HeLa channels.", '''
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
''')
w("HeLa/01_HeLa_split_train_in_labeled_and_unlabeled.py",
  "Seeded shuffle split: first 10 % of crops labeled.", '''
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
''')
w("SUIM/00_SUIM_convert_bmp_to_png_masks.py",
  "Color BMP masks -> class-id PNGs (IM-shifted SUIM mapping).", '''
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
''')
w("SUIM/01_SUIM_split_original_train_val.py",
  "Split org train_val into train_full/val, then labeled/unlabeled.", '''
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
''')
w("SUIM/02_SUIM_create_crops.py",
  "Two random 256-512 px crops per image resized to 256^2.", '''
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
''')
w("Cityscapes/00_Cityscapes_resize_images_and_masks.py",
  "Resize by 0.2 (dims up to mult. of 16); mask ids +1 where >0.", '''
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
''')
w("Cityscapes/01_Cityscapes_split_original_train_val.py",
  "Split train into labeled/unlabeled (0.9) and org val into val/test.", '''
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
''')

# class-mapping compatibility shims (reference import contract)
w("SUIM/SUIM_class_mapping.py",
  "Class mapping shim re-exporting inconsistencymasks_tpu.class_mappings.",
  '''
from inconsistencymasks_tpu.class_mappings import (
    COLOR_TO_CLASS_MAPPING_SUIM, COLOR_TO_CLASS_MAPPING_SUIM_ORG,
    CLASS_TO_COLOR_MAPPING_SUIM, SUIM_CLASS_DESCRIPTION as CLASS_DESCRIPTION)
''')
w("Cityscapes/Cityscapes_class_mapping.py",
  "Class mapping shim re-exporting inconsistencymasks_tpu.class_mappings.",
  '''
from inconsistencymasks_tpu.class_mappings import (
    COLOR_TO_CLASS_MAPPING_CITYSCAPES, COLOR_TO_CLASS_MAPPING_CITYSCAPES_ORG,
    CLASS_TO_COLOR_MAPPING_CITYSCAPES,
    CITYSCAPES_CLASS_DESCRIPTION as CLASS_DESCRIPTION)
''')
print("done")
