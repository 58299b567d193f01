"""On-device stochastic augmentation (replaces the reference's host-side
cv2/NumPy augmentation, reference functions.py:1463-1594 and 2725-2828).

Statistical parity notes (bitwise parity is impossible: the reference uses
unseeded Python/NumPy RNG):

- noise: integer noise ~ randint(-max_noise, max_noise) (half-open, like
  np.random.randint), added in widened precision, clipped to [0, 255]
  (reference functions.py:1463-1478).
- blur: a kernel size is drawn from randint(0, max_blur); 1/2/3 select
  Gaussian 3x3/5x5/7x7 (reference functions.py:1481-1506).  We use OpenCV's
  exact small-kernel coefficients ([1,2,1]/4, [1,4,6,4,1]/16,
  [2,7,14,18,14,7,2]/64) and REFLECT_101 borders, as depthwise convs.
- brightness: with probability 1/2, convertScaleAbs with
  alpha ~ U(a0, a1), beta ~ U(b0, b1): round(x*alpha+beta) saturated to
  uint8 (reference functions.py:1541-1567).
- geometry: random up-down flip, left-right flip and rot90 k in {0..3}
  applied consistently to the image and all masks; FREE_ROTATION=False
  restricts to the left-right flip only (reference functions.py:2744-2766).

Ordering parity: the joint image+mask augmenter applies geometry ->
brightness -> blur -> noise (reference functions.py:2779-2828); the
image-only augmenter used by consistency training / TTA applies blur ->
noise -> brightness (reference functions.py:1570-1594).  ``photometric``
takes ``brightness_first`` to cover both.

Everything is vmapped per-sample so one fused XLA program augments a whole
batch with independent randomness.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AugmentParams(NamedTuple):
    max_blur: int = 3
    max_noise: int = 25
    brightness_alpha: Tuple[float, float] = (0.5, 1.5)
    brightness_beta: Tuple[float, float] = (-25.0, 25.0)
    free_rotation: bool = True


# OpenCV's fixed small Gaussian kernels (getGaussianKernel with sigma=0).
_CV2_GAUSS = {
    3: np.array([1, 2, 1], np.float32) / 4.0,
    5: np.array([1, 4, 6, 4, 1], np.float32) / 16.0,
    7: np.array([2, 7, 14, 18, 14, 7, 2], np.float32) / 64.0,
}


def _reflect101_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """cv2 BORDER_REFLECT_101 padding on the H, W axes of (H, W, C)."""
    return jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")


def _gauss_blur2d(img_f32: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """(H, W, C) float32 -> Gaussian-blurred, cv2 small-kernel parity."""
    k1 = _CV2_GAUSS[ksize]
    k2 = jnp.asarray(np.outer(k1, k1))                  # (k, k)
    pad = ksize // 2
    x = _reflect101_pad(img_f32, pad)                   # (H+2p, W+2p, C)
    c = x.shape[-1]
    lhs = x[None]                                       # NHWC
    rhs = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return out[0]


def _round_saturate_u8(x: jnp.ndarray) -> jnp.ndarray:
    """cvRound (half-to-even) + saturate_cast<uchar>."""
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def _convert_scale_abs_u8(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.convertScaleAbs: |round(value)| then saturate to uint8 — the
    absolute value is part of the contract (negative results fold back into
    the positive range)."""
    return jnp.clip(jnp.abs(jnp.round(x)), 0, 255).astype(jnp.uint8)


def _photometric_single(key: jax.Array, img: jnp.ndarray,
                        p: AugmentParams, brightness_first: bool
                        ) -> jnp.ndarray:
    """Augment one (H, W, C) uint8 image."""
    k_blur, k_noise, k_bcoin, k_alpha, k_beta = jax.random.split(key, 5)

    def brightness(im_u8):
        coin = jax.random.bernoulli(k_bcoin)
        alpha = jax.random.uniform(k_alpha, (), minval=p.brightness_alpha[0],
                                   maxval=p.brightness_alpha[1])
        beta = jax.random.uniform(k_beta, (), minval=p.brightness_beta[0],
                                  maxval=p.brightness_beta[1])
        adj = _convert_scale_abs_u8(im_u8.astype(jnp.float32) * alpha + beta)
        return jnp.where(coin, adj, im_u8)

    def blur_noise(im_u8):
        f = im_u8.astype(jnp.float32)
        if p.max_blur > 0:
            choice = jax.random.randint(k_blur, (), 0, p.max_blur + 1)
            variants = [f]
            for ks in (3, 5, 7)[:p.max_blur]:
                variants.append(_gauss_blur2d(f, ks))
            f = jax.lax.switch(jnp.clip(choice, 0, len(variants) - 1),
                               [lambda v=v: v for v in variants])
            im_u8 = _round_saturate_u8(f)
        if p.max_noise > 0:
            noise = jax.random.randint(k_noise, im_u8.shape, -p.max_noise,
                                       p.max_noise, dtype=jnp.int32)
            im_u8 = jnp.clip(im_u8.astype(jnp.int32) + noise,
                             0, 255).astype(jnp.uint8)
        return im_u8

    if brightness_first:
        return blur_noise(brightness(img))
    return brightness(blur_noise(img))


def photometric(rng: jax.Array, images: jnp.ndarray, params: AugmentParams,
                brightness_first: bool = False) -> jnp.ndarray:
    """Per-sample photometric augmentation of a (B, H, W, C) uint8 batch."""
    keys = jax.random.split(rng, images.shape[0])
    fn = functools.partial(_photometric_single, p=params,
                           brightness_first=brightness_first)
    return jax.vmap(lambda k, im: fn(k, im))(keys, images)


def _geometric_single(key: jax.Array, arrays: Sequence[jnp.ndarray],
                      free_rotation: bool) -> list:
    """Apply one random flip/rot draw to several (H, W[, C]) arrays."""
    k_fh, k_fv, k_rot = jax.random.split(key, 3)
    fh = jax.random.bernoulli(k_fh) if free_rotation else jnp.asarray(False)
    fv = jax.random.bernoulli(k_fv)
    rot = (jax.random.randint(k_rot, (), 0, 4) if free_rotation
           else jnp.zeros((), jnp.int32))

    out = []
    for a in arrays:
        x = jnp.where(fh, jnp.flip(a, axis=0), a)
        x = jnp.where(fv, jnp.flip(x, axis=1), x)
        if free_rotation:
            # rot index: 0 none, 1 cw, 2 180, 3 ccw  (square inputs only)
            x = jax.lax.switch(rot, [
                lambda v: v,
                lambda v: jnp.rot90(v, k=-1, axes=(0, 1)),
                lambda v: jnp.rot90(v, k=2, axes=(0, 1)),
                lambda v: jnp.rot90(v, k=1, axes=(0, 1)),
            ], x)
        out.append(x)
    return out


def augment_image_and_masks(rng: jax.Array, images: jnp.ndarray,
                            masks: Sequence[jnp.ndarray],
                            params: AugmentParams):
    """Joint geometric+photometric augmentation of a batch.

    images: (B, H, W, C) uint8; each mask: (B, H, W[, Cm]).
    Geometry is shared between image and masks per sample; photometric noise
    touches only the image.  Mirrors reference functions.py:2779-2828
    (geometry -> brightness -> blur -> noise).
    """
    b = images.shape[0]
    k_geo, k_photo = jax.random.split(rng)
    geo_keys = jax.random.split(k_geo, b)

    def per_sample(key, img, *msks):
        outs = _geometric_single(key, [img, *msks], params.free_rotation)
        return tuple(outs)

    outs = jax.vmap(per_sample)(geo_keys, images, *masks)
    img_out, mask_outs = outs[0], list(outs[1:])
    img_out = photometric(k_photo, img_out, params, brightness_first=True)
    return img_out, mask_outs


def random_flip_and_rotation(rng: jax.Array,
                             images: jnp.ndarray) -> jnp.ndarray:
    """Image-only random D4 (reference functions.py:1509-1537), batched."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda k, im: _geometric_single(k, [im], True)[0]
                    )(keys, images)
