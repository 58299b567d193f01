"""EvalNet training datasets: labels.csv + (image, mask) pair loading.

The reference streams these through Python generators that re-read PNGs
every batch (reference functions.py:4778-4984); image names are recovered
from the mask name by splitting on ``'___'`` (functions.py:4805-4808).
Here the whole set is decoded once into RAM arrays and streamed to device.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import cv2
import numpy as np
import pandas as pd


@dataclass
class EvalNetDataset:
    images: np.ndarray        # (N, H, W, Ca) uint8
    masks: np.ndarray         # (N, H, W, Cb) uint8 (binary/one-hot/stacked)
    labels: np.ndarray        # (N,) or (N, C) f32 — IoU targets
    detection: Optional[np.ndarray] = None  # (N, C) f32 for miou variants
    names: list = None

    def __len__(self):
        return self.images.shape[0]


def _base_image_name(mask_name: str) -> str:
    if "___" in mask_name:
        return mask_name.split("___")[0] + ".png"
    return mask_name


def _read_labels(main_path: str) -> pd.DataFrame:
    return pd.read_csv(os.path.join(main_path, "labels.csv"), header=None,
                       sep=";")


def load_evalnet_dataset_binary(main_path: str,
                                channels: int = 3) -> EvalNetDataset:
    """(image, mask, IoU) triplets for the single-head EvalNet (reference
    generator functions.py:4778-4860)."""
    df = _read_labels(main_path)
    images_dir = os.path.join(main_path, "images")
    masks_dir = os.path.join(main_path, "masks")
    imgs, masks, labels, names = [], [], [], []
    for _, row in df.iterrows():
        mask_name, label = str(row[0]), float(row[1])
        img_name = _base_image_name(mask_name)
        img = cv2.imread(os.path.join(images_dir, img_name))
        m = cv2.imread(os.path.join(masks_dir, mask_name), 0)
        if img is None or m is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if channels == 1:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None]
        imgs.append(img)
        masks.append(m[..., None])
        labels.append(label)
        names.append(mask_name)
    return EvalNetDataset(np.stack(imgs), np.stack(masks),
                          np.asarray(labels, np.float32), names=names)


def load_evalnet_dataset_multiclass(main_path: str, num_classes: int,
                                    channels: int = 3,
                                    classwise: bool = False
                                    ) -> EvalNetDataset:
    """Masks are one-hot over num_classes (the reference feeds one-hot to
    the mIoU EvalNet, functions.py:5810); classwise=True reads per-class
    IoU + detection label columns."""
    df = _read_labels(main_path)
    images_dir = os.path.join(main_path, "images")
    masks_dir = os.path.join(main_path, "masks")
    imgs, masks, labels, dets, names = [], [], [], [], []
    for _, row in df.iterrows():
        mask_name = str(row[0])
        img = cv2.imread(os.path.join(images_dir,
                                      _base_image_name(mask_name)))
        m = cv2.imread(os.path.join(masks_dir, mask_name), 0)
        if img is None or m is None:
            continue
        imgs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        onehot = np.eye(num_classes, dtype=np.uint8)[
            np.clip(m, 0, num_classes - 1)]
        masks.append(onehot)
        if classwise:
            vals = row[1:].to_numpy(dtype=np.float32)
            labels.append(vals[:num_classes])
            dets.append(vals[num_classes:2 * num_classes])
        else:
            labels.append(float(row[1]))
        names.append(mask_name)
    return EvalNetDataset(
        np.stack(imgs), np.stack(masks),
        np.asarray(labels, np.float32),
        detection=np.asarray(dets, np.float32) if classwise else None,
        names=names)


def load_evalnet_dataset_hela(main_path: str) -> EvalNetDataset:
    """Brightfield + stacked (alive, dead, mod_position) masks with
    per-channel IoU + detection labels (reference generator
    functions.py:4862-4925)."""
    df = _read_labels(main_path)
    bf_dir = os.path.join(main_path, "brightfield")
    imgs, masks, labels, dets, names = [], [], [], [], []
    for _, row in df.iterrows():
        mask_name = str(row[0])
        img_name = _base_image_name(mask_name)
        bf = cv2.imread(os.path.join(bf_dir, img_name), 0)
        if bf is None:
            bf = cv2.imread(os.path.join(bf_dir, mask_name), 0)
        if bf is None:
            continue
        chans = []
        ok = True
        for chan in ("alive", "dead", "mod_position"):
            m = cv2.imread(os.path.join(main_path, chan, mask_name), 0)
            if m is None:
                ok = False
                break
            chans.append((m > 127).astype(np.uint8))
        if not ok:
            continue
        imgs.append(bf[..., None])
        masks.append(np.stack(chans, axis=-1))
        vals = row[1:].to_numpy(dtype=np.float32)
        labels.append(vals[:3])
        dets.append(vals[3:6])
        names.append(mask_name)
    return EvalNetDataset(np.stack(imgs), np.stack(masks),
                          np.asarray(labels, np.float32),
                          detection=np.asarray(dets, np.float32),
                          names=names)
