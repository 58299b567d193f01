"""Synthetic tiny datasets in the reference's on-disk layout — used by the
test suite and by `bench.py` smoke paths when no real data is mounted."""

from __future__ import annotations

import os

import cv2
import numpy as np


def _write(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, arr)


def make_binary_dataset(base_dir: str, *, n_labeled: int = 8, n_val: int = 4,
                        n_test: int = 4, n_unlabeled: int = 8,
                        h: int = 64, w: int = 64, seed: int = 0) -> None:
    """ISIC-style layout: {split}/{images,masks} with blob masks."""
    rng = np.random.RandomState(seed)

    def blob_pair():
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(w // 4, 3 * w // 4)
        r = rng.randint(min(h, w) // 8, min(h, w) // 4)
        cv2.circle(mask, (cx, cy), r, 255, -1)
        img[mask > 0] = (img[mask > 0] * 0.5 + 100).astype(np.uint8)
        return img, mask

    for split, n in (("train_labeled", n_labeled), ("val", n_val),
                     ("test", n_test), ("train_unlabeled", n_unlabeled)):
        for i in range(n):
            img, mask = blob_pair()
            _write(os.path.join(base_dir, split, "images",
                                f"{split}_{i:03d}.png"), img)
            _write(os.path.join(base_dir, split, "masks",
                                f"{split}_{i:03d}.png"), mask)


def make_multiclass_dataset(base_dir: str, *, num_classes: int = 9,
                            n_labeled: int = 8, n_val: int = 4,
                            n_test: int = 4, n_unlabeled: int = 8,
                            h: int = 64, w: int = 64, seed: int = 0) -> None:
    """SUIM/Cityscapes-style layout with integer class-id masks (class 0
    reserved for IM, so synthetic gt uses 1..num_classes-1)."""
    rng = np.random.RandomState(seed)
    for split, n in (("train_labeled", n_labeled), ("val", n_val),
                     ("test", n_test), ("train_unlabeled", n_unlabeled)):
        for i in range(n):
            img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
            mask = rng.randint(1, num_classes, (h // 8, w // 8)).astype(np.uint8)
            mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
            _write(os.path.join(base_dir, split, "images",
                                f"{split}_{i:03d}.png"), img)
            _write(os.path.join(base_dir, split, "masks",
                                f"{split}_{i:03d}.png"), mask)


def make_hela_dataset(base_dir: str, *, n_labeled: int = 6, n_val: int = 4,
                      n_test: int = 4, n_unlabeled: int = 6,
                      h: int = 64, w: int = 64, seed: int = 0) -> None:
    """HeLa layout: per-channel dirs brightfield/alive/dead/pos/mod_position."""
    rng = np.random.RandomState(seed)
    for split, n in (("train_labeled", n_labeled), ("val", n_val),
                     ("test", n_test), ("train_unlabeled", n_unlabeled)):
        for i in range(n):
            name = f"{split}_{i:03d}.png"
            bf = rng.randint(0, 255, (h, w)).astype(np.uint8)
            alive = np.zeros((h, w), np.uint8)
            dead = np.zeros((h, w), np.uint8)
            pos = np.zeros((h, w), np.uint8)
            for _ in range(rng.randint(1, 4)):
                cy, cx = rng.randint(8, h - 8), rng.randint(8, w - 8)
                target = alive if rng.rand() < 0.7 else dead
                cv2.circle(target, (cx, cy), rng.randint(3, 7), 255, -1)
                cv2.circle(pos, (cx, cy), 3, 255, -1)
            _write(os.path.join(base_dir, split, "brightfield", name), bf)
            _write(os.path.join(base_dir, split, "alive", name), alive)
            _write(os.path.join(base_dir, split, "dead", name), dead)
            _write(os.path.join(base_dir, split, "pos", name), pos)
            _write(os.path.join(base_dir, split, "mod_position", name), pos)
