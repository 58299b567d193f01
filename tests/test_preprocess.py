"""Preprocessing oracles: splits, crops, mask conversion."""

import os

import cv2
import numpy as np

from inconsistencymasks_tpu.class_mappings import (
    COLOR_TO_CLASS_MAPPING_SUIM, SUIM_CLASSES)
from inconsistencymasks_tpu.preprocess import (cityscapes_resize,
                                               hela_create_crops,
                                               _sliding_positions,
                                               split_image_mask_dirs,
                                               suim_convert_bmp_masks)


def test_split_matches_sklearn(tmp_path, rng):
    img_dir, mask_dir = str(tmp_path / "i"), str(tmp_path / "m")
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    for i in range(20):
        cv2.imwrite(os.path.join(img_dir, f"f{i:02d}.png"),
                    rng.randint(0, 255, (8, 8, 3)).astype(np.uint8))
        cv2.imwrite(os.path.join(mask_dir, f"f{i:02d}.png"),
                    rng.randint(0, 2, (8, 8)).astype(np.uint8) * 255)
    out = str(tmp_path / "out")
    split_image_mask_dirs(img_dir, mask_dir, out,
                          ["train_labeled", "train_unlabeled"], 0.9, 42)
    labeled = os.listdir(os.path.join(out, "train_labeled", "images"))
    unlabeled = os.listdir(os.path.join(out, "train_unlabeled", "images"))
    assert len(labeled) == 2 and len(unlabeled) == 18
    # same call again is deterministic
    from sklearn.model_selection import train_test_split
    a, _ = train_test_split(sorted(os.listdir(img_dir)), test_size=0.9,
                            random_state=42)
    assert sorted(labeled) == sorted(a)


def test_sliding_positions_cover_image():
    pos = _sliding_positions(512, 512, 256, 0.6)
    assert all(0 <= x <= 256 and 0 <= y <= 256 for x, y in pos)
    # full coverage of corners
    assert (0, 0) in pos
    assert any(x == 256 for x, _ in pos) and any(y == 256 for _, y in pos)


def test_hela_crops(tmp_path, rng):
    org = str(tmp_path / "org")
    for chan in ("brightfield", "alive", "dead", "mod_position"):
        os.makedirs(os.path.join(org, chan))
        cv2.imwrite(os.path.join(org, chan, "img0.png"),
                    rng.randint(0, 255, (512, 512)).astype(np.uint8))
    out = str(tmp_path / "crops")
    hela_create_crops(org, out, crop_size=256, overlap=0.6)
    crops = os.listdir(os.path.join(out, "brightfield"))
    assert len(crops) > 1
    c = cv2.imread(os.path.join(out, "brightfield", crops[0]), 0)
    assert c.shape == (256, 256)
    # non-brightfield channels are thresholded binary
    a = cv2.imread(os.path.join(out, "alive", crops[0]), 0)
    assert set(np.unique(a)).issubset({0, 255})


def test_suim_bmp_conversion(tmp_path):
    src = str(tmp_path / "bmp")
    os.makedirs(src)
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = (255, 0, 0)           # BGR blue = RGB (0,0,255) Human divers
    img[4:] = (255, 255, 255)       # Sea-floor
    cv2.imwrite(os.path.join(src, "m.bmp"), img)
    out = str(tmp_path / "png")
    suim_convert_bmp_masks(src, out, COLOR_TO_CLASS_MAPPING_SUIM)
    m = cv2.imread(os.path.join(out, "m.png"), 0)
    assert set(np.unique(m)) == {2, 8}  # divers=2, sea-floor=8 (IM shift)


def test_cityscapes_resize_shift_quirk(tmp_path, rng):
    """Mask ids +1 where >0; class 0 stays 0 (reference quirk)."""
    img_dir = str(tmp_path / "leftImg8bit" / "cityA")
    mask_dir = str(tmp_path / "gtFine" / "cityA")
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    img = rng.randint(0, 255, (100, 200, 3)).astype(np.uint8)
    mask = np.zeros((100, 200), np.uint8)
    mask[:50] = 7
    cv2.imwrite(os.path.join(img_dir, "a_b_c_leftImg8bit.png"), img)
    cv2.imwrite(os.path.join(mask_dir, "a_b_c_gtFine_labelIds.png"), mask)
    oi, om = str(tmp_path / "oi"), str(tmp_path / "om")
    cityscapes_resize(str(tmp_path / "leftImg8bit"),
                      str(tmp_path / "gtFine"), oi, om, 0.2)
    m = cv2.imread(os.path.join(om, "a_b_c.png"), 0)
    assert m.shape[0] % 16 == 0 and m.shape[1] % 16 == 0
    assert set(np.unique(m)) == {0, 8}  # 7 -> 8; 0 stays 0


def test_im_shifted_suim_table_consistency():
    for cid, rgb, _ in SUIM_CLASSES:
        assert COLOR_TO_CLASS_MAPPING_SUIM[rgb] == cid
