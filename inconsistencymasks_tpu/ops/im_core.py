"""The Inconsistency-Mask core — the heart of the framework.

Reference semantics (functions.py:3104-3137):

binary (``pred_masks_to_im_binary``):
    stack K thresholded masks; pred = pixels where ALL K agree on 1;
    IM = pixels where the K models disagree (0 < sum < K).
multiclass (``pred_masks_to_im_multiclass``):
    pred = argmax class where ALL K argmaxes are equal, else 0 (= IM class);
    IM = disagreement indicator.

The reference computes this per image on host NumPy after K separate
``model.predict`` calls (functions.py:3140-3238).  Here the whole chain —
K-model inference (vmapped stacked params), threshold/argmax, disagreement,
optional erode/dilate, and the gray-out of image+label — is ONE fused XLA
program over a full batch (see pseudo/engine.py).  These functions are the
batched pure-math core, each validated against a NumPy oracle in
tests/test_im_core.py.

All functions take a leading model axis K and a batch axis B:
probs (K, B, H, W, C) or class maps (K, B, H, W).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BinaryIM(NamedTuple):
    pred_mask: jnp.ndarray   # (B, H, W, C) uint8 in {0, 255}
    im: jnp.ndarray          # (B, H, W) uint8 in {0, 255} (any-channel OR)
    im_size: jnp.ndarray     # (B,) int32 — disagreeing pixel count (per ch.)
    pred_size: jnp.ndarray   # (B,) int32 — unanimous-1 pixel count


class MulticlassIM(NamedTuple):
    pred_mask: jnp.ndarray   # (B, H, W) class ids, 0 where inconsistent
    im: jnp.ndarray          # (B, H, W) uint8 in {0, 255}
    im_size: jnp.ndarray     # (B,) int32


def binary_im(pred_masks: jnp.ndarray) -> BinaryIM:
    """(K, B, H, W, C) binary {0,1} masks -> unanimous pred + IM.

    Matches reference functions.py:3104-3120: for C > 1 (HeLa's 3 channels)
    the per-channel IMs are combined by max (functions.py:3199-3200) and the
    im_size is the sum over channels (functions.py:3200).
    """
    m = pred_masks.astype(jnp.int32)
    k = m.shape[0]
    s = jnp.sum(m, axis=0)                               # (B, H, W, C)
    pred = (s == k)
    im_per_ch = jnp.logical_and(s != 0, s != k)
    pred_size = jnp.sum(pred.astype(jnp.int32), axis=(1, 2, 3))
    im_size = jnp.sum(im_per_ch.astype(jnp.int32), axis=(1, 2, 3))
    im = jnp.max(im_per_ch, axis=-1)                     # (B, H, W)
    return BinaryIM(
        pred_mask=(pred.astype(jnp.uint8) * 255),
        im=(im.astype(jnp.uint8) * 255),
        im_size=im_size,
        pred_size=pred_size,
    )


def multiclass_im(class_maps: jnp.ndarray) -> MulticlassIM:
    """(K, B, H, W) integer argmax maps -> intersection pred + IM.

    Matches reference functions.py:3123-3137: agreement means all K equal
    the first model's class; disagreeing pixels get class 0 (the reserved IM
    class).
    """
    agree = jnp.all(class_maps == class_maps[0:1], axis=0)   # (B, H, W)
    pred = jnp.where(agree, class_maps[0], 0)
    im = jnp.logical_not(agree)
    return MulticlassIM(
        pred_mask=pred.astype(jnp.uint8),
        im=(im.astype(jnp.uint8) * 255),
        im_size=jnp.sum(im.astype(jnp.int32), axis=(1, 2)),
    )


def probs_to_binary_masks(probs: jnp.ndarray, threshold: float
                          ) -> jnp.ndarray:
    """Threshold sigmoid probabilities (K, B, H, W, C) -> {0,1} uint8.
    The reference uses strict ``>`` for the IM path (functions.py:3157)."""
    return (probs > threshold).astype(jnp.uint8)


def probs_to_class_maps(probs: jnp.ndarray) -> jnp.ndarray:
    """Argmax softmax probabilities (K, B, H, W, C) -> (K, B, H, W) int32."""
    return jnp.argmax(probs, axis=-1).astype(jnp.int32)


def blockout_binary(image: jnp.ndarray, pred_mask: jnp.ndarray,
                    im: jnp.ndarray, block_input: bool,
                    block_output: bool):
    """Erase IM pixels from image and/or pseudo-label (reference
    functions.py:2867-2874: ``image[im > 0] = 0``).

    image: (B, H, W, C) uint8; pred_mask: (B, H, W, C') uint8;
    im: (B, H, W) uint8.
    """
    hole = im > 0
    if block_input:
        image = jnp.where(hole[..., None], jnp.uint8(0), image)
    if block_output:
        pred_mask = jnp.where(hole[..., None] if pred_mask.ndim == 4
                              else hole, jnp.uint8(0), pred_mask)
    return image, pred_mask
