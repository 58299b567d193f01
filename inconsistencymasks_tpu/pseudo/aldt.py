"""ALDT augmented-labeled-set creation (reference functions.py:2567-2719):
``num_images`` (default 9) augmented copies of every labeled image+mask are
written as ``{stem}_aug_{n}.png`` next to (optionally) the originals.

On TPU each copy-index n augments the WHOLE labeled set as one fused
program; the host only encodes PNGs.
"""

from __future__ import annotations

import os
import shutil

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import list_pngs
from ..ops import augment
from ..utils.io_pool import flushes_writes, imwrite_async


@flushes_writes
def create_augment_images_and_masks_binary(
        images_path: str, masks_path: str, main_output_path: str, *,
        num_images: int = 9, copy_org: bool = True, channels: int = 3,
        brightness_range_alpha=(0.5, 1.5), brightness_range_beta=(-25, 25),
        max_blur: int = 3, max_noise: int = 25, free_rotation: bool = True,
        batch_size: int = 32, seed: int = 0) -> None:
    images_out = os.path.join(main_output_path, "images")
    masks_out = os.path.join(main_output_path, "masks")
    os.makedirs(images_out, exist_ok=True)
    os.makedirs(masks_out, exist_ok=True)

    names = list_pngs(images_path)
    if copy_org:
        for n in names:
            shutil.copy(os.path.join(images_path, n),
                        os.path.join(images_out, n))
            shutil.copy(os.path.join(masks_path, n),
                        os.path.join(masks_out, n))

    p = augment.AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)
    key = jax.random.PRNGKey(seed)

    for start in range(0, len(names), batch_size):
        chunk = names[start:start + batch_size]
        imgs, masks = [], []
        for n in chunk:
            if channels == 3:
                imgs.append(cv2.imread(os.path.join(images_path, n)))
            else:
                imgs.append(cv2.imread(os.path.join(images_path, n),
                                       0)[..., None])
            masks.append(cv2.imread(os.path.join(masks_path, n), 0))
        imgs_j = jnp.asarray(np.stack(imgs))
        masks_j = jnp.asarray(np.stack(masks))
        for copy_idx in range(num_images):
            key, k = jax.random.split(key)
            aug_img, aug_masks = augment.augment_image_and_masks(
                k, imgs_j, [masks_j], p)
            aug_img = np.asarray(aug_img)
            aug_mask = np.asarray(aug_masks[0])
            for i, n in enumerate(chunk):
                oi = aug_img[i] if channels == 3 else aug_img[i][..., 0]
                imwrite_async(os.path.join(
                    images_out, f"{n[:-4]}_aug_{copy_idx}.png"), oi)
                imwrite_async(os.path.join(
                    masks_out, f"{n[:-4]}_aug_{copy_idx}.png"), aug_mask[i])


# multiclass shares the binary writer's layout/semantics (integer masks
# survive the geometric transforms unchanged; brightness/noise touch the
# image only)
create_augment_images_and_masks_multiclass = \
    create_augment_images_and_masks_binary


@flushes_writes
def create_augment_images_and_masks_hela(
        main_input_path: str, main_output_path: str, *, num_images: int = 9,
        copy_org: bool = True, free_rotation: bool = True,
        brightness_range_alpha=(0.7, 1.3), brightness_range_beta=(-15, 15),
        max_blur: int = 3, max_noise: int = 25, batch_size: int = 32,
        seed: int = 0) -> None:
    """HeLa per-channel variant (reference functions.py:2614-2719)."""
    chans = ("brightfield", "alive", "dead", "mod_position")
    for c in chans:
        os.makedirs(os.path.join(main_output_path, c), exist_ok=True)
    bf_dir = os.path.join(main_input_path, "brightfield")
    names = list_pngs(bf_dir)
    if copy_org:
        for c in chans:
            for n in names:
                shutil.copy(os.path.join(main_input_path, c, n),
                            os.path.join(main_output_path, c, n))

    p = augment.AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)
    key = jax.random.PRNGKey(seed)

    for start in range(0, len(names), batch_size):
        chunk = names[start:start + batch_size]
        bf, masks = [], []
        for n in chunk:
            bf.append(cv2.imread(os.path.join(bf_dir, n), 0)[..., None])
            masks.append(np.stack(
                [cv2.imread(os.path.join(main_input_path, c, n), 0)
                 for c in chans[1:]], axis=-1))
        bf_j = jnp.asarray(np.stack(bf))
        masks_j = jnp.asarray(np.stack(masks))
        for copy_idx in range(num_images):
            key, k = jax.random.split(key)
            aug_img, aug_masks = augment.augment_image_and_masks(
                k, bf_j, [masks_j], p)
            aug_img = np.asarray(aug_img)
            aug_mask = np.asarray(aug_masks[0])
            for i, n in enumerate(chunk):
                stem = f"{n[:-4]}_aug_{copy_idx}.png"
                imwrite_async(os.path.join(main_output_path, "brightfield",
                                         stem), aug_img[i][..., 0])
                for ci, c in enumerate(chans[1:]):
                    imwrite_async(os.path.join(main_output_path, c, stem),
                                aug_mask[i][..., ci])
