"""Noisy-Student pseudo-labelers (reference functions.py:3243-3416):
teacher predicts the unlabeled set, then the (image, pseudo-label) pair is
jointly geometric+photometric augmented with a per-generation noise
schedule (the schedule and growing student alpha live in the scripts,
e.g. reference ISIC_2018/08_ISIC_2018_noisy_student.py:41-45, 108).

On TPU the teacher forward AND the joint augmentation run as one program
per batch; the host only writes PNGs.  HeLa parity detail: the reference
augments the raw float channel predictions and thresholds AFTER augmentation
(functions.py:3343-3349), and suffixes outputs with ``_aug``.
"""

from __future__ import annotations

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import eval_batches, load_images
from ..ops import augment
from ..postproc.hela import get_min_dist, get_pos_contours
from ..utils.io_pool import flushes_writes, imwrite_async

_JIT_CACHE: dict = {}


def _forward(module):
    fn = _JIT_CACHE.get(module)
    if fn is None:
        fn = jax.jit(lambda v, x: module.apply(v, x, train=False))
        _JIT_CACHE[module] = fn
    return fn


def _params(max_blur, max_noise, alpha_range, beta_range, free_rotation):
    return augment.AugmentParams(
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
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def fused(variables, images, rng):
        probs = module.apply(variables, images, train=False)
        mask = ((probs[..., 0] > threshold) * 255).astype(jnp.uint8)
        aug_img, aug_masks = augment.augment_image_and_masks(
            rng, images, [mask], p)
        return aug_img, aug_masks[0]

    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        key, sub_key = jax.random.split(key)
        aug_img, aug_mask = fused(variables, jnp.asarray(images), sub_key)
        aug_img, aug_mask = np.asarray(aug_img), np.asarray(aug_mask)
        for i in range(valid):
            name = ds.names[cursor + i]
            bgr = (cv2.cvtColor(aug_img[i], cv2.COLOR_RGB2BGR)
                   if channels == 3 else aug_img[i])
            imwrite_async(os.path.join(main_output_path, "images", name), bgr)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        aug_mask[i])
        cursor += valid


@flushes_writes
def create_pseudo_labels_noisy_student_multiclass(
        module, variables, images_dir: str, main_output_path: str, *,
        channels: int = 3, brightness_range_alpha=(0.5, 1.5),
        brightness_range_beta=(-25, 25), max_blur: int = 3,
        max_noise: int = 25, free_rotation: bool = True,
        batch_size: int = 128, seed: int = 0) -> None:
    ds = load_images(images_dir, channels)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    p = _params(max_blur, max_noise, brightness_range_alpha,
                brightness_range_beta, free_rotation)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def fused(variables, images, rng):
        probs = module.apply(variables, images, train=False)
        mask = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
        aug_img, aug_masks = augment.augment_image_and_masks(
            rng, images, [mask], p)
        return aug_img, aug_masks[0]

    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        key, sub_key = jax.random.split(key)
        aug_img, aug_mask = fused(variables, jnp.asarray(images), sub_key)
        aug_img, aug_mask = np.asarray(aug_img), np.asarray(aug_mask)
        for i in range(valid):
            name = ds.names[cursor + i]
            bgr = (cv2.cvtColor(aug_img[i], cv2.COLOR_RGB2BGR)
                   if channels == 3 else aug_img[i])
            imwrite_async(os.path.join(main_output_path, "images", name), bgr)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        aug_mask[i])
        cursor += valid


@flushes_writes
def create_pseudo_labels_noisy_student_hela(
        module, variables, images_dir: str, main_output_path: str, *,
        threshold: float = 0.5, brightness_range_alpha=(0.5, 1.5),
        brightness_range_beta=(-25, 25), max_blur: int = 3,
        max_noise: int = 25, free_rotation: bool = True,
        max_pos_circle_size: int = 8, min_pos_circle_size: int = 3,
        batch_size: int = 128, seed: int = 0) -> None:
    """HeLa: augment FLOAT channel predictions jointly with the image,
    threshold afterwards, redraw position circles, suffix ``_aug``
    (reference functions.py:3294-3367)."""
    ds = load_images(images_dir, 1)
    for sub in ("brightfield", "alive", "dead", "mod_position"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    p = _params(max_blur, max_noise, brightness_range_alpha,
                brightness_range_beta, free_rotation)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def fused(variables, images, rng):
        probs = module.apply(variables, images, train=False)  # (B,H,W,3) f32
        # joint geometric augmentation over image + float masks; photometric
        # noise on the image only
        aug_img, aug_masks = augment.augment_image_and_masks(
            rng, images, [probs], p)
        m = ((aug_masks[0] >= threshold) * 255).astype(jnp.uint8)
        return aug_img, m

    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        key, sub_key = jax.random.split(key)
        aug_img, masks = fused(variables, jnp.asarray(images), sub_key)
        aug_img, masks = np.asarray(aug_img), np.asarray(masks)
        h, w = masks.shape[1:3]
        for i in range(valid):
            stem = ds.names[cursor + i][:-4]
            positions = get_pos_contours(masks[i, :, :, 2])
            pos_mask = np.zeros((h, w, 3), np.uint8)
            for pos in positions:
                md = get_min_dist(pos, positions) if len(positions) > 1 else 99
                size = max(min(int(md // 4), max_pos_circle_size),
                           min_pos_circle_size)
                cv2.circle(pos_mask, (pos[0], pos[1]), size,
                           (255, 255, 255), -1)
            imwrite_async(os.path.join(main_output_path, "brightfield",
                                     f"{stem}_aug.png"), aug_img[i, ..., 0])
            imwrite_async(os.path.join(main_output_path, "alive",
                                     f"{stem}_aug.png"), masks[i, :, :, 0])
            imwrite_async(os.path.join(main_output_path, "dead",
                                     f"{stem}_aug.png"), masks[i, :, :, 1])
            imwrite_async(os.path.join(main_output_path, "mod_position",
                                     f"{stem}_aug.png"), pos_mask)
        cursor += valid
