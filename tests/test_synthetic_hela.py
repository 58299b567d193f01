"""The structured HeLa-like proxy (data/synthetic.make_hela_like_dataset)
feeds the HeLa-arm quality run (tools/run_quality_hela.py): reference
channel layout HeLa/00_HeLa_create_crops.py:20-224, mod_pos_size radius
rule HeLa/00:149-196."""

import os

import cv2
import numpy as np

from inconsistencymasks_tpu.data.synthetic import make_hela_like_dataset

CHANNELS = ("brightfield", "alive", "dead", "pos", "mod_position")


def test_hela_like_layout_and_channels(tmp_path):
    base = str(tmp_path / "HeLa") + os.sep
    make_hela_like_dataset(base, n_train=10, n_val=3, n_test=2,
                           labeled_frac=0.2, h=128, w=128, seed=7)
    counts = {}
    for split in ("train_labeled", "train_unlabeled", "val", "test"):
        names = None
        for ch in CHANNELS:
            d = os.path.join(base, split, ch)
            assert os.path.isdir(d), f"missing {split}/{ch}"
            cur = sorted(os.listdir(d))
            assert names is None or cur == names  # same files per channel
            names = cur
        counts[split] = len(names)
    # 20 % labeled split of n_train, full val/test
    assert counts == {"train_labeled": 2, "train_unlabeled": 8,
                      "val": 3, "test": 2}


def test_hela_like_content_properties(tmp_path):
    base = str(tmp_path / "HeLa") + os.sep
    make_hela_like_dataset(base, n_train=6, n_val=2, n_test=2,
                           h=256, w=256, seed=3)
    split = os.path.join(base, "val")
    name = sorted(os.listdir(os.path.join(split, "brightfield")))[0]

    def read(ch):
        img = cv2.imread(os.path.join(split, ch, name),
                         cv2.IMREAD_GRAYSCALE)
        assert img is not None and img.shape == (256, 256)
        return img

    bf, alive, dead, pos, mod = (read(c) for c in CHANNELS)
    assert bf.dtype == np.uint8
    # masks are binary
    for m in (alive, dead, pos, mod):
        assert set(np.unique(m)) <= {0, 255}
    # plausible coverage at 256^2 (cells present, not saturated)
    assert 0.01 < (alive > 0).mean() < 0.5
    assert 0 < (dead > 0).mean() < 0.2
    # every pos disc marks a cell centre; mod_position uses the clamped
    # min-dist radius >= the fixed pos radius, so mod must cover pos
    assert (pos > 0).sum() > 0
    assert ((pos > 0) & ~(mod > 0)).sum() == 0
    assert (mod > 0).sum() >= (pos > 0).sum()
