"""Noisy-Student pseudo-labelers (reference functions.py:3243-3416):
teacher predicts the unlabeled set, then the (image, pseudo-label) pair is
jointly geometric+photometric augmented with a per-generation noise
schedule (the schedule and growing student alpha live in the scripts,
e.g. reference ISIC_2018/08_ISIC_2018_noisy_student.py:41-45, 108).

Transfer-minimal protocol: the device computes ONLY the thresholded /
argmax'ed teacher mask, which crosses the slow relay bit-packed (binary /
HeLa) or nibble-packed (multiclass <= 16 classes); the augmentation runs
host-side cv2 (ops/augment_host — the reference's own semantics) on the
ORIGINAL images the host already holds, so no image pixels ever cross
device->host.  HeLa parity detail: the reference augments the raw float
channel predictions and thresholds AFTER augmentation
(functions.py:3343-3349) — the geometric ops (flips/rot90) are pixel
permutations, so threshold-then-augment is exactly equivalent; the
photometric noise touches only the image, and outputs carry the ``_aug``
suffix.
"""

from __future__ import annotations

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import eval_batches, load_images
from ..ops import bitpack
from ..ops.augment import AugmentParams
from ..ops.augment_host import augment_image_and_masks_host
from ..postproc.hela import get_min_dist, get_pos_contours
from ..utils.io_pool import flushes_writes, imwrite_async

_JIT_CACHE: dict = {}


def _packed_mask_fn(module, kind: str, threshold: float = 0.5,
                    nibble: bool = True):
    """Jitted teacher-forward -> packed-mask program per (module, kind)."""
    key = (module, kind, threshold, nibble)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        if kind == "binary":
            def impl(v, x):
                probs = module.apply(v, x, train=False)
                return bitpack.packbits2d(probs[..., 0] > threshold)
        elif kind == "multiclass":
            def impl(v, x):
                probs = module.apply(v, x, train=False)
                pred = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
                return (bitpack.packnibbles2d(pred) if nibble else pred)
        else:                                   # hela: 3 binary channels
            def impl(v, x):
                probs = module.apply(v, x, train=False)
                m = jnp.moveaxis(probs >= threshold, -1, 1)  # (B,3,H,W)
                return bitpack.packbits2d(m)
        fn = jax.jit(impl)
        _JIT_CACHE[key] = fn
    return fn


def _params(max_blur, max_noise, alpha_range, beta_range, free_rotation):
    return AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(alpha_range),
        brightness_beta=tuple(beta_range),
        free_rotation=free_rotation)


@flushes_writes
def create_pseudo_labels_noisy_student_binary(
        module, variables, images_dir: str, main_output_path: str, *,
        channels: int = 3, threshold: float = 0.5,
        brightness_range_alpha=(0.5, 1.5), brightness_range_beta=(-25, 25),
        max_blur: int = 3, max_noise: int = 25, free_rotation: bool = True,
        batch_size: int = 128, seed: int = 0) -> None:
    ds = load_images(images_dir, channels)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    p = _params(max_blur, max_noise, brightness_range_alpha,
                brightness_range_beta, free_rotation)
    rng = np.random.RandomState(seed)
    fwd = _packed_mask_fn(module, "binary", threshold)

    w = ds.images.shape[2]
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        packed = fwd(variables, jnp.asarray(images))
        masks = bitpack.unpackbits2d(np.asarray(packed), w) * np.uint8(255)
        for i in range(valid):
            name = ds.names[cursor + i]
            aug_img, (aug_mask,) = augment_image_and_masks_host(
                rng, images[i], [masks[i]], p)
            bgr = (cv2.cvtColor(aug_img, cv2.COLOR_RGB2BGR)
                   if channels == 3 else aug_img)
            imwrite_async(os.path.join(main_output_path, "images", name), bgr)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        aug_mask)
        cursor += valid


@flushes_writes
def create_pseudo_labels_noisy_student_multiclass(
        module, variables, images_dir: str, main_output_path: str, *,
        channels: int = 3, num_classes: int = 16,
        brightness_range_alpha=(0.5, 1.5),
        brightness_range_beta=(-25, 25), max_blur: int = 3,
        max_noise: int = 25, free_rotation: bool = True,
        batch_size: int = 128, seed: int = 0) -> None:
    ds = load_images(images_dir, channels)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    p = _params(max_blur, max_noise, brightness_range_alpha,
                brightness_range_beta, free_rotation)
    rng = np.random.RandomState(seed)
    nibble = num_classes <= 16
    fwd = _packed_mask_fn(module, "multiclass", nibble=nibble)

    w = ds.images.shape[2]
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        packed = fwd(variables, jnp.asarray(images))
        masks = (bitpack.unpacknibbles2d(np.asarray(packed), w) if nibble
                 else np.asarray(packed))
        for i in range(valid):
            name = ds.names[cursor + i]
            aug_img, (aug_mask,) = augment_image_and_masks_host(
                rng, images[i], [masks[i]], p)
            bgr = (cv2.cvtColor(aug_img, cv2.COLOR_RGB2BGR)
                   if channels == 3 else aug_img)
            imwrite_async(os.path.join(main_output_path, "images", name), bgr)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        aug_mask)
        cursor += valid


@flushes_writes
def create_pseudo_labels_noisy_student_hela(
        module, variables, images_dir: str, main_output_path: str, *,
        threshold: float = 0.5, brightness_range_alpha=(0.5, 1.5),
        brightness_range_beta=(-25, 25), max_blur: int = 3,
        max_noise: int = 25, free_rotation: bool = True,
        max_pos_circle_size: int = 8, min_pos_circle_size: int = 3,
        batch_size: int = 128, seed: int = 0) -> None:
    """HeLa: thresholded channel masks jointly augmented with the image
    (geometry is a pixel permutation, so this equals the reference's
    augment-floats-then-threshold, functions.py:3294-3367), position
    circles redrawn from the augmented position channel, suffix ``_aug``."""
    ds = load_images(images_dir, 1)
    for sub in ("brightfield", "alive", "dead", "mod_position"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    p = _params(max_blur, max_noise, brightness_range_alpha,
                brightness_range_beta, free_rotation)
    rng = np.random.RandomState(seed)
    fwd = _packed_mask_fn(module, "hela", threshold)

    h, w = ds.images.shape[1:3]
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        packed = fwd(variables, jnp.asarray(images))
        masks = np.moveaxis(bitpack.unpackbits2d(np.asarray(packed), w),
                            1, -1) * np.uint8(255)           # (B,H,W,3)
        for i in range(valid):
            stem = ds.names[cursor + i][:-4]
            aug_img, (aug_mask,) = augment_image_and_masks_host(
                rng, images[i], [masks[i]], p)
            positions = get_pos_contours(aug_mask[:, :, 2])
            pos_mask = np.zeros((h, w, 3), np.uint8)
            for pos in positions:
                md = get_min_dist(pos, positions) if len(positions) > 1 else 99
                size = max(min(int(md // 4), max_pos_circle_size),
                           min_pos_circle_size)
                cv2.circle(pos_mask, (pos[0], pos[1]), size,
                           (255, 255, 255), -1)
            imwrite_async(os.path.join(main_output_path, "brightfield",
                                     f"{stem}_aug.png"),
                        aug_img[..., 0] if aug_img.ndim == 3 else aug_img)
            imwrite_async(os.path.join(main_output_path, "alive",
                                     f"{stem}_aug.png"), aug_mask[:, :, 0])
            imwrite_async(os.path.join(main_output_path, "dead",
                                     f"{stem}_aug.png"), aug_mask[:, :, 1])
            imwrite_async(os.path.join(main_output_path, "mod_position",
                                     f"{stem}_aug.png"), pos_mask)
        cursor += valid
