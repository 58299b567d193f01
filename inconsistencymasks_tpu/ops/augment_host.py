"""Host-side cv2/NumPy augmentation — the reference's own semantics
(functions.py:1463-1594 photometric, 2725-2828 joint image+mask pipeline)
executed where the reference executes them: on the host.

Why this exists next to the on-device ``ops.augment``: writers whose
inputs AND outputs live on the host (ALDT's 9x labeled-set expansion, the
IM+ augmentation of blocked pairs, EvalNet IM datagen's 50 % augmentation)
gain nothing from a device round trip — and on this environment's relay
the device->host image download (~200 KB/image at ~1 MB/s) dominates their
wall-clock.  Augmenting with cv2 on the host removes the transfer entirely
and is byte-faithful to the reference's cv2 calls.

Semantics mirror ``ops.augment`` exactly (same half-open randint bounds,
same op order: geometry -> brightness -> blur -> noise for the joint
pipeline; blur -> noise -> brightness for the image-only one), driven by a
``np.random.RandomState``.
"""

from __future__ import annotations

from typing import List, Sequence

import cv2
import numpy as np

from .augment import AugmentParams


def _geometry(rng: np.random.RandomState, arrays: Sequence[np.ndarray],
              free_rotation: bool) -> List[np.ndarray]:
    """One shared random flip/rot draw applied to every array
    (reference functions.py:2744-2766; ops.augment._geometric_single)."""
    fh = bool(rng.randint(0, 2)) if free_rotation else False
    fv = bool(rng.randint(0, 2))
    rot = int(rng.randint(0, 4)) if free_rotation else 0
    out = []
    for a in arrays:
        x = a[::-1] if fh else a
        x = x[:, ::-1] if fv else x
        if rot:
            # match ops.augment: 1 = clockwise, 2 = 180, 3 = ccw
            x = np.rot90(x, k=-rot, axes=(0, 1))
        out.append(np.ascontiguousarray(x))
    return out


def _brightness(rng: np.random.RandomState, img: np.ndarray,
                p: AugmentParams) -> np.ndarray:
    """p=1/2 convertScaleAbs (reference functions.py:1541-1567)."""
    if rng.randint(0, 2):
        alpha = rng.uniform(*p.brightness_alpha)
        beta = rng.uniform(*p.brightness_beta)
        img = cv2.convertScaleAbs(img, alpha=alpha, beta=beta)
        if img.ndim == 2:
            img = img[..., None]
    return img


def _blur(rng: np.random.RandomState, img: np.ndarray,
          p: AugmentParams) -> np.ndarray:
    """Kernel index ~ randint(0, max_blur+1); 1/2/3 -> 3/5/7 Gaussian
    (reference functions.py:1481-1506)."""
    if p.max_blur > 0:
        choice = int(rng.randint(0, p.max_blur + 1))
        if choice:
            ks = (3, 5, 7)[choice - 1]
            squeeze = img.ndim == 3 and img.shape[-1] == 1
            out = cv2.GaussianBlur(img, (ks, ks), 0)
            img = out[..., None] if squeeze else out
    return img


def _noise(rng: np.random.RandomState, img: np.ndarray,
           p: AugmentParams) -> np.ndarray:
    """Integer noise ~ randint(-max_noise, max_noise), clipped
    (reference functions.py:1463-1478)."""
    if p.max_noise > 0:
        noise = rng.randint(-p.max_noise, p.max_noise,
                            size=img.shape).astype(np.int32)
        img = np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)
    return img


def augment_image_and_masks_host(rng: np.random.RandomState,
                                 image: np.ndarray,
                                 masks: Sequence[np.ndarray],
                                 p: AugmentParams):
    """Joint augmentation of ONE (H, W[, C]) uint8 image + its masks:
    geometry (shared) -> brightness -> blur -> noise (image only) —
    reference functions.py:2779-2828."""
    outs = _geometry(rng, [image, *masks], p.free_rotation)
    img, mask_outs = outs[0], outs[1:]
    img = _brightness(rng, img, p)
    img = _blur(rng, img, p)
    img = _noise(rng, img, p)
    return img, mask_outs


def photometric_host(rng: np.random.RandomState, image: np.ndarray,
                     p: AugmentParams) -> np.ndarray:
    """Image-only pipeline: blur -> noise -> brightness
    (reference functions.py:1570-1594)."""
    img = _blur(rng, image, p)
    img = _noise(rng, img, p)
    return _brightness(rng, img, p)
