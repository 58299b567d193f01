"""Device-side bit-packing for binary masks.

The relay between this host and the TPU moves device->host traffic at
~1 MB/s, so downloading full (H, W) uint8 masks (64 KB each at 256^2)
dominates production wall-clock (benchmarks download one mask per image
per candidate; IM generation used to download whole blocked images).
Packing 8 binary pixels per byte ON DEVICE cuts the transfer 8x, and the
blocked image/mask PNGs are composed on the host from the ORIGINAL images
it already holds (``image[im > 0] = 0`` is a pure mask-out, reference
functions.py:2867-2874 — byte-identical to the device blockout).

numpy's bit order for ``unpackbits`` is MSB-first; the device dot below
uses the same weights so round-trips are exact.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_WEIGHTS = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)


def packbits2d(mask) -> jnp.ndarray:
    """(..., H, W) bool/int -> (..., H, W//8) uint8, MSB-first (numpy
    ``unpackbits`` compatible).  W must be a multiple of 8."""
    m = (mask > 0).astype(jnp.int32)
    shape = m.shape
    w = shape[-1]
    if w % 8:
        # pad the last byte with zeros like np.packbits; unpackbits2d's
        # ``width`` argument truncates the padding on the way back.
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, 8 - w % 8)])
        w = m.shape[-1]
    m = m.reshape(shape[:-1] + (w // 8, 8))
    packed = jnp.sum(m * _WEIGHTS, axis=-1)
    return packed.astype(jnp.uint8)


def unpackbits2d(packed: np.ndarray, width: int) -> np.ndarray:
    """(..., H, W//8) uint8 -> (..., H, W) uint8 in {0, 1} (host)."""
    bits = np.unpackbits(np.asarray(packed), axis=-1)
    return bits[..., :width]


def packnibbles2d(classmap) -> jnp.ndarray:
    """(..., H, W) integer class map with values < 16 -> (..., H, W//2)
    uint8, 2 pixels per byte (high nibble first).  W must be even after
    zero-padding (handled like packbits2d)."""
    m = classmap.astype(jnp.int32)
    w = m.shape[-1]
    if w % 2:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, 1)])
    m = m.reshape(m.shape[:-1] + (m.shape[-1] // 2, 2))
    packed = m[..., 0] * 16 + m[..., 1]
    return packed.astype(jnp.uint8)


def unpacknibbles2d(packed: np.ndarray, width: int) -> np.ndarray:
    """(..., H, W//2) uint8 -> (..., H, W) uint8 class map (host)."""
    p = np.asarray(packed)
    out = np.empty(p.shape[:-1] + (p.shape[-1] * 2,), np.uint8)
    out[..., 0::2] = p >> 4
    out[..., 1::2] = p & 0x0F
    return out[..., :width]


# jitted entry points for call sites OUTSIDE a jit (eager dispatch is
# ~1 s/op on this backend)
import jax as _jax          # noqa: E402

packbits2d_jit = _jax.jit(packbits2d)
packnibbles2d_jit = _jax.jit(packnibbles2d)
