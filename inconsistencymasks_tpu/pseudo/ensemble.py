"""Model-ensemble pseudo-labelers (reference functions.py:1864-1988 writers,
2409-2562 voters): K models vote on every pixel.

- binary: unanimous hard vote — sum of thresholded masks == K -> 255
  (functions.py:2424-2436);
- multiclass hard: intersection-else-0 (functions.py:2439-2467);
- multiclass soft: mean softmax -> argmax (functions.py:2533-2562);
- HeLa soft: mean probabilities -> threshold, position circles redrawn from
  contours (functions.py:2471-2528).

The voting + thresholding fuses with the K-model batched inference into one
XLA program per batch.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import eval_batches, load_images
from ..ops import bitpack
from .engine import StackedEnsemble
from ..postproc.hela import get_min_dist, get_pos_contours
from ..utils.io_pool import flushes_writes, imwrite_async


@jax.jit
def _binary_unanimous(probs, threshold):
    votes = (probs > threshold).astype(jnp.int32).sum(axis=0)  # (B,H,W,1)
    k = probs.shape[0]
    return ((votes >= k) * 255).astype(jnp.uint8)


@jax.jit
def _multiclass_soft(probs):
    mean = jnp.mean(probs, axis=0)
    return jnp.argmax(mean, axis=-1).astype(jnp.uint8)


@jax.jit
def _multiclass_hard(probs):
    cm = jnp.argmax(probs, axis=-1).astype(jnp.int32)           # (K,B,H,W)
    agree = jnp.all(cm == cm[0:1], axis=0)
    return jnp.where(agree, cm[0], 0).astype(jnp.uint8)


@jax.jit
def _hela_soft(probs, threshold):
    mean = jnp.mean(probs, axis=0)                               # (B,H,W,3)
    return ((mean > threshold) * 255).astype(jnp.uint8)


@jax.jit
def _pack_binary(probs, threshold):
    return bitpack.packbits2d(_binary_unanimous(probs, threshold)[..., 0])


@jax.jit
def _pack_hela(probs, threshold):
    m = jnp.moveaxis(_hela_soft(probs, threshold), -1, 1)   # (B,3,H,W)
    return bitpack.packbits2d(m)


@flushes_writes
def create_pseudo_labels_model_ensemble_binary(
        module, models: Sequence, images_dir: str, main_output_path: str, *,
        channels: int = 3, threshold: float = 0.5, batch_size: int = 128,
        ensemble: Optional[StackedEnsemble] = None) -> None:
    ens = ensemble or StackedEnsemble(module, models)
    ds = load_images(images_dir, channels)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    cursor = 0
    width = ds.images.shape[2]
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        probs = ens.predict_probs(jnp.asarray(images))
        # bit-packed across the slow device->host link (8 px/byte)
        packed = _pack_binary(probs, threshold)
        masks = bitpack.unpackbits2d(np.asarray(packed),
                                     width) * np.uint8(255)
        for i in range(valid):
            name = ds.names[cursor + i]
            bgr = (cv2.cvtColor(images[i], cv2.COLOR_RGB2BGR)
                   if channels == 3 else images[i])
            imwrite_async(os.path.join(main_output_path, "images", name), bgr)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        masks[i])
        cursor += valid


@flushes_writes
def create_pseudo_labels_model_ensemble_multiclass(
        module, models: Sequence, images_dir: str, main_output_path: str, *,
        channels: int = 3, soft: bool = True, batch_size: int = 128,
        ensemble: Optional[StackedEnsemble] = None) -> None:
    ens = ensemble or StackedEnsemble(module, models)
    ds = load_images(images_dir, channels)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    vote = _multiclass_soft if soft else _multiclass_hard
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        probs = ens.predict_probs(jnp.asarray(images))
        masks = np.asarray(vote(probs))
        for i in range(valid):
            name = ds.names[cursor + i]
            bgr = (cv2.cvtColor(images[i], cv2.COLOR_RGB2BGR)
                   if channels == 3 else images[i])
            imwrite_async(os.path.join(main_output_path, "images", name), bgr)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        masks[i])
        cursor += valid


@flushes_writes
def create_pseudo_labels_model_ensemble_hela(
        module, models: Sequence, bf_images_dir: str, main_output_path: str,
        *, threshold: float = 0.5, max_pos_circle_size: int = 8,
        min_pos_circle_size: int = 3, batch_size: int = 128,
        ensemble: Optional[StackedEnsemble] = None) -> None:
    ens = ensemble or StackedEnsemble(module, models)
    ds = load_images(bf_images_dir, 1)
    for sub in ("brightfield", "alive", "dead", "mod_position"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        probs = ens.predict_probs(jnp.asarray(images))
        packed = _pack_hela(probs, threshold)
        masks = np.moveaxis(bitpack.unpackbits2d(
            np.asarray(packed), ds.images.shape[2]), 1, -1) * np.uint8(255)
        h, w = masks.shape[1:3]
        for i in range(valid):
            name = ds.names[cursor + i]
            positions = get_pos_contours(masks[i, :, :, 2])
            pos_mask = np.zeros((h, w, 3), np.uint8)
            for p in positions:
                md = get_min_dist(p, positions) if len(positions) > 1 else 99
                size = max(min(int(md // 4), max_pos_circle_size),
                           min_pos_circle_size)
                cv2.circle(pos_mask, (p[0], p[1]), size,
                           (255, 255, 255), -1)
            imwrite_async(os.path.join(main_output_path, "brightfield", name),
                        images[i, ..., 0])
            imwrite_async(os.path.join(main_output_path, "alive", name),
                        masks[i, :, :, 0])
            imwrite_async(os.path.join(main_output_path, "dead", name),
                        masks[i, :, :, 1])
            imwrite_async(os.path.join(main_output_path, "mod_position", name),
                        pos_mask)
        cursor += valid
