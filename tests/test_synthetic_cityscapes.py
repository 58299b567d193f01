"""The structured Cityscapes-like proxy
(data/synthetic.make_cityscapes_like_dataset) feeds the Cityscapes-arm
quality run (tools/run_quality_cityscapes.py): reference split protocol
Cityscapes/01_Cityscapes_split_original_train_val.py:49-62, shifted
35-class mapping Cityscapes_class_mapping.py:42-120 (class 0 = IM)."""

import os

import cv2
import numpy as np

from inconsistencymasks_tpu.data.synthetic import make_cityscapes_like_dataset


def test_cityscapes_like_layout_and_splits(tmp_path):
    base = str(tmp_path / "Cityscapes") + os.sep
    make_cityscapes_like_dataset(base, n_train=10, n_val=3, n_test=2,
                                 labeled_frac=0.2, seed=7)
    counts = {}
    for split in ("train_labeled", "train_unlabeled", "val", "test"):
        for sub in ("images", "masks"):
            d = os.path.join(base, split, sub)
            assert os.path.isdir(d), f"missing {split}/{sub}"
        imgs = sorted(os.listdir(os.path.join(base, split, "images")))
        assert imgs == sorted(os.listdir(os.path.join(base, split,
                                                      "masks")))
        counts[split] = len(imgs)
    # 20 % labeled split of n_train (reference 01: test_size=0.9 -> 10 %
    # by default), full val/test
    assert counts == {"train_labeled": 2, "train_unlabeled": 8,
                      "val": 3, "test": 2}


def test_cityscapes_like_content_properties(tmp_path):
    base = str(tmp_path / "Cityscapes") + os.sep
    make_cityscapes_like_dataset(base, n_train=8, n_val=4, n_test=2,
                                 seed=3)
    split = os.path.join(base, "val")
    classes = set()
    sky_share = road_share = 0.0
    names = sorted(os.listdir(os.path.join(split, "masks")))
    for name in names:
        img = cv2.imread(os.path.join(split, "images", name))
        m = cv2.imread(os.path.join(split, "masks", name),
                       cv2.IMREAD_GRAYSCALE)
        # real-task geometry: 0.2x resize of 1024x2048 rounded to /16
        # (Cityscapes/00:20-35, config.ini [CITYSCAPES])
        assert img.shape == (208, 416, 3) and img.dtype == np.uint8
        assert m.shape == (208, 416)
        classes |= set(np.unique(m).tolist())
        sky_share += float((m == 24).mean()) / len(names)
        road_share += float((m == 8).mean()) / len(names)
    # class 0 is reserved for IM (shifted mapping) and ids stay in range
    assert 0 not in classes
    assert max(classes) <= 34
    # every street frame has sky (24) and road (8) as dominant stuff
    assert sky_share > 0.1
    assert road_share > 0.1
    # a scene inventory rich enough for a 35-class mIoU benchmark
    assert len(classes) >= 10
