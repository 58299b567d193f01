"""On-device binary/multiclass morphology.

The reference erodes/dilates inconsistency masks with cv2 and ones-kernels on
the host (reference functions.py:2858-2864, 3043-3051).  On TPU these are
min/max pooling windows (``lax.reduce_window``), which XLA fuses into the
surrounding pseudo-label program.

cv2 border parity: ``cv2.erode``'s default borderValue is +inf (border never
shrinks the foreground) and ``cv2.dilate``'s is -inf, which for uint8 masks
equals padding with 255 / 0 respectively — exactly reduce_window's behaviour
with max/min identity padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool(x: jnp.ndarray, kernel: int, is_max: bool) -> jnp.ndarray:
    """Same-size min/max pool over the last two ... (H, W) axes.

    Implemented as SEPARABLE 1-D pools built from padded static slices —
    measured slightly faster than ``lax.reduce_window`` on TPU and fuses
    better into surrounding elementwise programs.  Padding uses the pool's
    identity element (cv2 border parity: erode pads +inf, dilate -inf)."""
    if kernel <= 0:
        return x
    if is_max:
        ident = (jnp.iinfo(x.dtype).min
                 if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf)
        combine = jnp.maximum
    else:
        ident = (jnp.iinfo(x.dtype).max
                 if jnp.issubdtype(x.dtype, jnp.integer) else jnp.inf)
        combine = jnp.minimum
    lo = kernel // 2
    hi = kernel - 1 - lo

    def pool_axis(v, axis):
        pad_width = [(0, 0)] * v.ndim
        pad_width[axis] = (lo, hi)
        p = jnp.pad(v, pad_width, constant_values=ident)
        size = v.shape[axis]
        out = lax.slice_in_dim(p, 0, size, axis=axis)
        for s in range(1, kernel):
            out = combine(out, lax.slice_in_dim(p, s, s + size, axis=axis))
        return out

    x = pool_axis(x, x.ndim - 2)
    return pool_axis(x, x.ndim - 1)


def erode(mask: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """cv2.erode with a ones (kernel x kernel) element, 1 iteration.
    Works on (..., H, W) of any numeric dtype."""
    return _pool(mask, kernel, is_max=False)


def dilate(mask: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """cv2.dilate with a ones (kernel x kernel) element, 1 iteration."""
    return _pool(mask, kernel, is_max=True)


def dilate_multiclass(mask: jnp.ndarray, num_classes: int,
                      kernel: int = 3) -> jnp.ndarray:
    """Per-class dilation of an integer class map, skipping class 0
    (reference functions.py:3075-3100 ``dilate_mask``).

    The reference dilates each present class's binary mask and OVERWRITES in
    ascending class order, so higher class ids win at boundaries.  We
    replicate by dilating all one-hot planes and taking, per pixel, the
    highest class id whose dilated plane is set (falling back to 0).
    """
    onehot = jax.nn.one_hot(mask, num_classes, axis=-1, dtype=jnp.uint8)
    onehot = jnp.moveaxis(onehot, -1, 0)                # (C, ..., H, W)
    dil = dilate(onehot, kernel)                        # (C, ..., H, W)
    ids = jnp.arange(num_classes, dtype=jnp.int32)
    ids = ids.reshape((num_classes,) + (1,) * (dil.ndim - 1))
    candidate = jnp.where(dil > 0, ids, 0)
    candidate = candidate.at[0].set(0)                  # class 0 never wins
    return jnp.max(candidate, axis=0).astype(mask.dtype)
