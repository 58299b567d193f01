"""D4 (flip/rot90) test-time-augmentation transforms, on device.

The reference enumerates 13 transforms — identity plus (flip_h, flip_v,
rot in {90cw, 180, 90ccw}) for all four flip combinations — and their
inverses (reference functions.py:1597-1762).  The enumeration ORDER is part
of the contract (the TTA voters index into it), so we reproduce it exactly:

    idx 0      : identity
    idx 1..12  : (fh, fv, r) for fh in (0,1) for fv in (0,1) for r in (1,2,3)

where, following cv2 conventions on (H, W, ...) arrays:
    fh=1 -> cv2.flip(img, 0)  == flip rows    (up-down)
    fv=1 -> cv2.flip(img, 1)  == flip columns (left-right)
    r=1  -> ROTATE_90_CLOCKWISE        == np.rot90(img, k=-1)
    r=2  -> ROTATE_180                 == np.rot90(img, k=2)
    r=3  -> ROTATE_90_COUNTERCLOCKWISE == np.rot90(img, k=1)

Forward order: flip rows, flip cols, then rotate; the inverse undoes the
rotation first.  Note the group has 8 distinct elements; the 13-entry list
intentionally repeats five of them with TTA-relevant multiplicity, exactly
like the reference.

All ops work on batched arrays with H, W as the two axes following the batch
axis: (B, H, W) or (B, H, W, C).  90-degree rotations swap H/W and are only
used for square inputs (the reference likewise only applies them to the
square ISIC/HeLa/SUIM images).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

# (flip_rows, flip_cols, rot) per transform index.
TRANSFORMS: Tuple[Tuple[int, int, int], ...] = tuple(
    [(0, 0, 0)] + [(fh, fv, r) for fh in (0, 1) for fv in (0, 1)
                   for r in (1, 2, 3)]
)
NUM_TRANSFORMS = len(TRANSFORMS)  # 13

_H_AXIS, _W_AXIS = 1, 2  # batched layout (B, H, W[, C])


def _rot90(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """np.rot90 in the (H, W) plane of a batched array."""
    return jnp.rot90(x, k=k, axes=(_H_AXIS, _W_AXIS))


def apply_transform(x: jnp.ndarray, idx: int) -> jnp.ndarray:
    """Apply transform ``idx`` (static Python int) to a batched array."""
    fh, fv, r = TRANSFORMS[idx]
    if fh:
        x = jnp.flip(x, axis=_H_AXIS)
    if fv:
        x = jnp.flip(x, axis=_W_AXIS)
    if r == 1:          # 90 clockwise
        x = _rot90(x, -1)
    elif r == 2:
        x = _rot90(x, 2)
    elif r == 3:        # 90 counter-clockwise
        x = _rot90(x, 1)
    return x


def invert_transform(x: jnp.ndarray, idx: int) -> jnp.ndarray:
    """Undo transform ``idx``: inverse rotation first, then the flips
    (reference functions.py:1651-1668)."""
    fh, fv, r = TRANSFORMS[idx]
    if r == 1:
        x = _rot90(x, 1)
    elif r == 2:
        x = _rot90(x, 2)
    elif r == 3:
        x = _rot90(x, -1)
    if fv:
        x = jnp.flip(x, axis=_W_AXIS)
    if fh:
        x = jnp.flip(x, axis=_H_AXIS)
    return x


def generate_all_transformations(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W[, C]) -> (13, B, H, W[, C]) stacked views (square H == W).
    Mirrors reference functions.py:1597-1630."""
    return jnp.stack([apply_transform(x, i) for i in range(NUM_TRANSFORMS)],
                     axis=0)


def restore_all_transformations(views: jnp.ndarray) -> jnp.ndarray:
    """(13, B, H, W[, C]) predictions back to the original frame.
    Mirrors reference functions.py:1636-1672."""
    return jnp.stack([invert_transform(views[i], i)
                      for i in range(NUM_TRANSFORMS)], axis=0)


def apply_transforms_indexed(x: jnp.ndarray,
                             indices: Sequence[int]) -> jnp.ndarray:
    """Stack the given subset of transforms: (len(idx), B, H, W[, C]).
    Backs the 'n random transformations' TTA mode (reference
    functions.py:1675-1725) — the host samples ``indices`` once per batch and
    the device applies them (shape-static, so jit caches per index tuple)."""
    return jnp.stack([apply_transform(x, i) for i in indices], axis=0)


def restore_transforms_indexed(views: jnp.ndarray,
                               indices: Sequence[int]) -> jnp.ndarray:
    """Inverse of :func:`apply_transforms_indexed`."""
    return jnp.stack([invert_transform(views[k], i)
                      for k, i in enumerate(indices)], axis=0)
