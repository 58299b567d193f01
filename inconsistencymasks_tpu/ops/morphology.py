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
    """Same-size min/max pool over the last two ... (H, W) axes."""
    if kernel <= 0:
        return x
    window = (1,) * (x.ndim - 2) + (kernel, kernel)
    strides = (1,) * x.ndim
    pad = kernel // 2
    padding = [(0, 0)] * (x.ndim - 2) + [(pad, kernel - 1 - pad)] * 2
    if is_max:
        init, op = -jnp.inf, lax.max
        if jnp.issubdtype(x.dtype, jnp.integer):
            init = jnp.iinfo(x.dtype).min
    else:
        init, op = jnp.inf, lax.min
        if jnp.issubdtype(x.dtype, jnp.integer):
            init = jnp.iinfo(x.dtype).max
    return lax.reduce_window(x, jnp.asarray(init, x.dtype), op,
                             window, strides, padding)


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
