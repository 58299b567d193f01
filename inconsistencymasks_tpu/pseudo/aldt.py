"""ALDT augmented-labeled-set creation (reference functions.py:2567-2719):
``num_images`` (default 9) augmented copies of every labeled image+mask are
written as ``{stem}_aug_{n}.png`` next to (optionally) the originals.

These writers read PNGs from disk and write PNGs to disk, so they run the
augmentation ON THE HOST with cv2 (ops/augment_host.py) exactly as the
reference does — a device round trip would cost a ~200 KB/image download
over this environment's ~1 MB/s relay for zero benefit.  (Also used by the
IM+/IM++ stages to expand the blocked pairs, reference 11_*_IM+.py:81-86.)
"""

from __future__ import annotations

import os
import shutil

import cv2
import numpy as np

from ..data.loader import list_pngs
from ..ops.augment import AugmentParams
from ..ops.augment_host import augment_image_and_masks_host
from ..utils.io_pool import flushes_writes, imwrite_async


@flushes_writes
def create_augment_images_and_masks_binary(
        images_path: str, masks_path: str, main_output_path: str, *,
        num_images: int = 9, copy_org: bool = True, channels: int = 3,
        brightness_range_alpha=(0.5, 1.5), brightness_range_beta=(-25, 25),
        max_blur: int = 3, max_noise: int = 25, free_rotation: bool = True,
        seed: int = 0, **_ignored) -> None:
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

    p = AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)
    rng = np.random.RandomState(seed)

    for n in names:
        # BGR in, BGR out — no round trip through RGB needed
        img = (cv2.imread(os.path.join(images_path, n)) if channels == 3
               else cv2.imread(os.path.join(images_path, n), 0))
        mask = cv2.imread(os.path.join(masks_path, n), 0)
        for copy_idx in range(num_images):
            aug_img, (aug_mask,) = augment_image_and_masks_host(
                rng, img, [mask], p)
            imwrite_async(os.path.join(
                images_out, f"{n[:-4]}_aug_{copy_idx}.png"), aug_img)
            imwrite_async(os.path.join(
                masks_out, f"{n[:-4]}_aug_{copy_idx}.png"), aug_mask)


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
        max_blur: int = 3, max_noise: int = 25, seed: int = 0,
        **_ignored) -> None:
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

    p = AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)
    rng = np.random.RandomState(seed)

    for n in names:
        bf = cv2.imread(os.path.join(bf_dir, n), 0)
        mask_stack = np.stack(
            [cv2.imread(os.path.join(main_input_path, c, n), 0)
             for c in chans[1:]], axis=-1)
        for copy_idx in range(num_images):
            aug_bf, (aug_mask,) = augment_image_and_masks_host(
                rng, bf, [mask_stack], p)
            stem = f"{n[:-4]}_aug_{copy_idx}.png"
            imwrite_async(os.path.join(main_output_path, "brightfield",
                                     stem), aug_bf)
            for ci, c in enumerate(chans[1:]):
                imwrite_async(os.path.join(main_output_path, c, stem),
                            aug_mask[..., ci])
