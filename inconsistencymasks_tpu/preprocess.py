"""Dataset preprocessing + splitting (the 00/01/02 scripts' engines).

Host-side by nature (file-format conversion, resizing, dataset splits);
faithful to the reference's semantics including its quirks:

- ISIC (reference ISIC_2018/00:33-58): resize to HxW, masks lose their
  ``_segmentation`` suffix; split = sklearn train_test_split(test_size=0.9,
  random_state=SEED) -> (train_labeled 10 %, train_unlabeled 90 %)
  (01:21-57).
- HeLa (HeLa/00:20-224): sliding 256^2 crops with overlap 0.6 over the 4
  channels; non-brightfield channels thresholded at 10; position circles
  redrawn via mod_pos_size.  Split: seeded shuffle, first 10 % labeled
  (01:30-37).
- SUIM (SUIM/00): color BMP masks thresholded <128 -> 0 else 255, then
  color -> class id with the IM-shifted mapping (class 0 reserved for IM;
  unmapped colors fall to 0).  Splits (01): train_val -> train_full/val
  (0.1), then train_full -> train_unlabeled(90 %)/train_labeled(10 %).
  Crops (02): 2 random square crops (256..512 px) per image resized to
  256^2 (nearest for masks).
- Cityscapes (Cityscapes/00): resize by factor 0.2, dims rounded UP to a
  multiple of 16, nearest for masks; mask ids shifted +1 EXCEPT value 0
  which stays 0 (the reference's ``np.where(mask > 0, mask + 1, mask)`` —
  the original 'Unlabeled' class 0 therefore collides with the IM class;
  reproduced faithfully).  Split (01): train -> labeled/unlabeled (0.9),
  org val_test -> val/test (0.5).
"""

from __future__ import annotations

import os
import random
import shutil
from typing import Optional, Sequence

import cv2
import numpy as np
from sklearn.model_selection import train_test_split

from .postproc.hela import get_min_dist, get_pos_contours


# ---------------------------------------------------------------- generic

def split_image_mask_dirs(images_dir: str, masks_dir: str, output_dir: str,
                          subset_names: Sequence[str], split_ratio: float,
                          seed: int = 42,
                          image_ext: Optional[str] = None,
                          mask_ext: str = ".png") -> None:
    """sklearn-based pair split writing {subset}/{images,masks}
    (reference ISIC_2018/01:21-57 / SUIM/01:15-60)."""
    image_files = sorted(os.listdir(images_dir))
    if image_ext is None:
        part_a, part_b = train_test_split(image_files,
                                          test_size=split_ratio,
                                          random_state=seed)
        subsets = {subset_names[0]: part_a, subset_names[1]: part_b}
        for subset, files in subsets.items():
            img_out = os.path.join(output_dir, subset, "images")
            mask_out = os.path.join(output_dir, subset, "masks")
            os.makedirs(img_out, exist_ok=True)
            os.makedirs(mask_out, exist_ok=True)
            for f in files:
                shutil.copy(os.path.join(images_dir, f),
                            os.path.join(img_out, f))
                shutil.copy(os.path.join(masks_dir, f),
                            os.path.join(mask_out, f))
    else:
        stems = sorted(os.path.splitext(f)[0] for f in image_files)
        part_a, part_b = train_test_split(stems, test_size=split_ratio,
                                          random_state=seed)
        subsets = {subset_names[0]: part_a, subset_names[1]: part_b}
        for subset, files in subsets.items():
            img_out = os.path.join(output_dir, subset, "images")
            mask_out = os.path.join(output_dir, subset, "masks")
            os.makedirs(img_out, exist_ok=True)
            os.makedirs(mask_out, exist_ok=True)
            for f in files:
                shutil.copy(os.path.join(images_dir, f + image_ext),
                            os.path.join(img_out, f + image_ext))
                shutil.copy(os.path.join(masks_dir, f + mask_ext),
                            os.path.join(mask_out, f + mask_ext))


# ------------------------------------------------------------------- ISIC

def preprocess_isic(org_pairs_images, org_pairs_masks, height, width):
    """Resize originals to (width, height) PNGs; strip ``_segmentation``
    from mask names (reference ISIC_2018/00:33-58)."""
    for in_dir, out_dir in org_pairs_images:
        if not os.path.isdir(in_dir):
            continue
        os.makedirs(out_dir, exist_ok=True)
        for fname in sorted(os.listdir(in_dir)):
            img = cv2.imread(os.path.join(in_dir, fname))
            if img is None:
                continue
            cv2.imwrite(os.path.join(out_dir, f"{fname[:-4]}.png"),
                        cv2.resize(img, (width, height)))
    for in_dir, out_dir in org_pairs_masks:
        if not os.path.isdir(in_dir):
            continue
        os.makedirs(out_dir, exist_ok=True)
        for fname in sorted(os.listdir(in_dir)):
            img = cv2.imread(os.path.join(in_dir, fname))
            if img is None:
                continue
            # '{stem}_segmentation.png' -> '{stem}.png' (17 chars dropped)
            cv2.imwrite(os.path.join(out_dir, f"{fname[:-17]}.png"),
                        cv2.resize(img, (width, height)))


# ------------------------------------------------------------------- HeLa

def _sliding_positions(img_h, img_w, crop, overlap):
    """reference HeLa/00:36-81."""
    x_count = round(img_w / (crop * (1 - overlap)))
    y_count = round(img_h / (crop * (1 - overlap)))
    x_move, y_move = img_w / x_count, img_h / y_count
    out = []
    for i in range(x_count):
        for j in range(y_count):
            x = min(int(i * x_move), img_w - crop)
            y = min(int(j * y_move), img_h - crop)
            out.append((x, y))
    return out


def hela_create_crops(org_split_dir: str, crop_split_dir: str,
                      crop_size: int = 256, overlap: float = 0.6,
                      use_mod_pos_size: bool = True) -> None:
    """Sliding-window crops over the 4 HeLa channels
    (reference HeLa/00:85-147)."""
    channels = ["brightfield", "alive", "dead",
                "mod_position" if use_mod_pos_size else "position"]
    bf_dir = os.path.join(org_split_dir, "brightfield")
    if not os.path.isdir(bf_dir):
        return
    for img_name in sorted(os.listdir(bf_dir)):
        bf = cv2.imread(os.path.join(bf_dir, img_name),
                        cv2.IMREAD_GRAYSCALE)
        if bf is None:
            continue
        positions = _sliding_positions(bf.shape[0], bf.shape[1], crop_size,
                                       overlap)
        stem = os.path.splitext(img_name)[0]
        for count, (x1, y1) in enumerate(positions):
            for chan in channels:
                src_name = (img_name if chan == "brightfield"
                            else f"{stem}.png")
                src = os.path.join(org_split_dir, chan, src_name)
                if not os.path.exists(src):
                    continue
                g = cv2.imread(src, cv2.IMREAD_GRAYSCALE)
                if chan != "brightfield":
                    g = cv2.threshold(g, 10, 255, cv2.THRESH_BINARY)[1]
                cut = g[y1:y1 + crop_size, x1:x1 + crop_size]
                out = os.path.join(crop_split_dir, chan)
                os.makedirs(out, exist_ok=True)
                cv2.imwrite(os.path.join(out, f"{stem}_{count}.png"), cut)


def hela_mod_pos_size_dir(in_path: str, out_path: str,
                          max_pos_circle_size: int = 8,
                          min_pos_circle_size: int = 3) -> None:
    """Redraw position circles clamped by neighbour distance
    (reference HeLa/00:149-196)."""
    os.makedirs(out_path, exist_ok=True)
    for name in sorted(os.listdir(in_path)):
        img = cv2.imread(os.path.join(in_path, name))
        if img is None:
            continue
        positions = get_pos_contours(img)
        h, w = img.shape[:2]
        out = np.zeros((h, w, 3), np.uint8)
        for pos in positions:
            md = get_min_dist(pos, positions)
            size = max(min(int(md // 4), max_pos_circle_size),
                       min_pos_circle_size)
            cv2.circle(out, (pos[0], pos[1]), size, (255, 255, 255), -1)
        out = cv2.blur(out, (2, 2))
        out[out < 254] = 0
        cv2.imwrite(os.path.join(out_path, name), out)


def hela_split_labeled_unlabeled(train_full_dir: str, labeled_dir: str,
                                 unlabeled_dir: str, seed: int = 42,
                                 use_mod_pos_size: bool = True) -> None:
    """Seeded shuffle, first 10 % labeled (reference HeLa/01:30-57)."""
    folders = ["brightfield", "alive", "dead",
               "mod_position" if use_mod_pos_size else "position"]
    names = os.listdir(os.path.join(train_full_dir, "brightfield"))
    random.seed(seed)
    random.shuffle(names)
    split = int(len(names) * 0.10)
    labeled, unlabeled = names[:split], names[split:]
    for folder in folders:
        for target_dir, files in ((labeled_dir, labeled),
                                  (unlabeled_dir, unlabeled)):
            os.makedirs(os.path.join(target_dir, folder), exist_ok=True)
            for n in files:
                src = os.path.join(train_full_dir, folder, n)
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(target_dir, folder, n))


# ------------------------------------------------------------------- SUIM

def suim_convert_bmp_masks(input_folder: str, output_folder: str,
                           color_to_class_mapping: dict) -> None:
    """Color BMP -> class-id PNG (reference SUIM/00:15-50): channels
    thresholded <128 -> 0 else 255 first; unmapped colors fall to 0."""
    os.makedirs(output_folder, exist_ok=True)
    for fname in sorted(os.listdir(input_folder)):
        if not fname.lower().endswith(".bmp"):
            continue
        img = cv2.imread(os.path.join(input_folder, fname))
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = np.where(img < 128, 0, 255)
        class_img = np.zeros(img.shape[:2], np.uint8)
        for rgb, cid in color_to_class_mapping.items():
            class_img[np.all(img == np.asarray(rgb), axis=-1)] = cid
        cv2.imwrite(os.path.join(output_folder,
                                 f"{os.path.splitext(fname)[0]}.png"),
                    class_img)


def suim_create_random_crops(image_folder: str, mask_folder: str,
                             main_output_path: str,
                             num_crops_per_image: int = 2,
                             target: int = 256, min_crop: int = 256,
                             max_crop: int = 512,
                             seed: Optional[int] = None) -> None:
    """2 random square crops per image resized to 256^2
    (reference SUIM/02:13-60).  The reference's RNG is unseeded; pass
    ``seed`` for reproducible pipelines."""
    if seed is not None:
        np.random.seed(seed)
        random.seed(seed)
    images_out = os.path.join(main_output_path, "images")
    masks_out = os.path.join(main_output_path, "masks")
    os.makedirs(images_out, exist_ok=True)
    os.makedirs(masks_out, exist_ok=True)
    image_files = sorted(f for f in os.listdir(image_folder)
                         if f.endswith(".jpg"))
    for i, fname in enumerate(image_files):
        img = cv2.imread(os.path.join(image_folder, fname))
        mask = cv2.imread(os.path.join(mask_folder, f"{fname[:-4]}.png"),
                          cv2.IMREAD_GRAYSCALE)
        if img is None or mask is None:
            continue
        h, w = img.shape[:2]
        for j in range(num_crops_per_image):
            crop = np.random.randint(min_crop, min(max_crop, max(h, w)))
            if h >= crop and w >= crop:
                x = random.randint(0, w - crop)
                y = random.randint(0, h - crop)
                ic = cv2.resize(img[y:y + crop, x:x + crop],
                                (target, target))
                mc = cv2.resize(mask[y:y + crop, x:x + crop],
                                (target, target),
                                interpolation=cv2.INTER_NEAREST)
            else:
                ic = cv2.resize(img, (target, target))
                mc = cv2.resize(mask, (target, target),
                                interpolation=cv2.INTER_NEAREST)
            cv2.imwrite(os.path.join(images_out,
                                     f"{fname[:-4]}_{i}_{j}.png"), ic)
            cv2.imwrite(os.path.join(masks_out,
                                     f"{fname[:-4]}_{i}_{j}.png"), mc)


# ------------------------------------------------------------- Cityscapes

def cityscapes_resize(img_dir: str, mask_dir: str, save_img_dir: str,
                      save_mask_dir: str, factor: float,
                      base: int = 16) -> None:
    """Per-city recursive resize; mask ids shifted +1 where >0
    (reference Cityscapes/00:21-66, quirk preserved: original class 0
    stays 0)."""
    os.makedirs(save_img_dir, exist_ok=True)
    os.makedirs(save_mask_dir, exist_ok=True)

    def resize(path, is_mask):
        img = cv2.imread(path)
        new = (int(img.shape[1] * factor), int(img.shape[0] * factor))
        new = (base * int(np.ceil(new[0] / base)),
               base * int(np.ceil(new[1] / base)))
        interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
        return cv2.resize(img, new, interpolation=interp)

    for root, _, files in os.walk(img_dir):
        city = os.path.split(root)[1]
        for fname in sorted(files):
            if not fname.endswith(".png"):
                continue
            common = "_".join(fname.split("_")[:-1])
            mask_path = os.path.join(mask_dir, city,
                                     common + "_gtFine_labelIds.png")
            if not os.path.exists(mask_path):
                continue
            cv2.imwrite(os.path.join(save_img_dir, common + ".png"),
                        resize(os.path.join(root, fname), False))
            m = resize(mask_path, True)
            m = np.where(m > 0, m + 1, m)
            cv2.imwrite(os.path.join(save_mask_dir, common + ".png"), m)
