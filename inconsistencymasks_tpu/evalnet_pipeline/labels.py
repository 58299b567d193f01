"""Label math for EvalNet training data — classwise IoU / detection /
confluence, ported to batched jnp with the reference's exact quirks
(reference functions.py:4328-4459):

- ``compute_classwise_iou``: zeros for classes absent from gt, EXCEPT
  iou[0] is forced to 1 whenever the prediction contains ANY class-0 (IM)
  pixel (functions.py:4344-4345) — reproduced faithfully, quirk included
  (gt presence can overwrite it afterwards, as in the reference loop).
- ``compute_classwise_detection``: class present if it covers > 1 % of
  pixels (functions.py:4400-4421).
- ``compute_classwise_detection_im``: ratio-vs-gt-count >= threshold, class
  0 detected whenever predicted at all, 10 % absolute-coverage fallback
  (functions.py:4424-4459).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_classes",))
def compute_classwise_iou(pred, gt, num_classes):
    """pred/gt (B, H, W) int -> (B, num_classes) f32, reference rounding
    applied by the caller when writing CSV."""
    t = jax.nn.one_hot(gt, num_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    inter = jnp.sum(t * p, axis=(1, 2))
    union = jnp.sum(jnp.maximum(t, p), axis=(1, 2))
    gt_present = jnp.sum(t, axis=(1, 2)) > 0
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)
    out = jnp.where(gt_present, iou, 0.0)
    # reference quirk: iou[0] starts at 1 when pred contains class 0; the
    # gt-presence branch then overwrites it for gt containing class 0.
    pred0 = jnp.sum(p[..., 0], axis=(1, 2)) > 0
    col0 = jnp.where(gt_present[:, 0], out[:, 0],
                     jnp.where(pred0, 1.0, 0.0))
    return out.at[:, 0].set(col0)


@partial(jax.jit, static_argnames=("num_classes",))
def compute_classwise_detection(mask, num_classes):
    """(B, H, W) int -> (B, num_classes) {0,1} f32; detected if class covers
    more than 1 % of the pixels."""
    p = jax.nn.one_hot(mask, num_classes, dtype=jnp.float32)
    counts = jnp.sum(p, axis=(1, 2))
    total = mask.shape[1] * mask.shape[2]
    return (counts > total * 0.01).astype(jnp.float32)


@partial(jax.jit, static_argnames=("num_classes",))
def compute_classwise_detection_im(pred_mask, num_classes, gt_class_counts,
                                   threshold):
    """(B, H, W), gt_class_counts (B, num_classes) -> (B, num_classes)."""
    p = jax.nn.one_hot(pred_mask, num_classes, dtype=jnp.float32)
    counts = jnp.sum(p, axis=(1, 2))
    total = pred_mask.shape[1] * pred_mask.shape[2]
    ratio = jnp.where(gt_class_counts > 0, counts / jnp.maximum(
        gt_class_counts, 1), 0.0)
    detected = jnp.logical_or(ratio >= threshold, counts / total >= 0.1)
    # class 0: detected whenever predicted at all
    detected = detected.at[:, 0].set(counts[:, 0] > 0)
    return detected.astype(jnp.float32)


@partial(jax.jit, static_argnames=("num_classes",))
def compute_classwise_confluence(gt, num_classes):
    """Per-class pixel proportion (functions.py:4360-4379)."""
    t = jax.nn.one_hot(gt, num_classes, dtype=jnp.float32)
    return jnp.sum(t, axis=(1, 2)) / (gt.shape[1] * gt.shape[2])


@jax.jit
def get_confluence_binary(gt):
    """Foreground proportion of a {0,1} mask (functions.py:4382-4396)."""
    import math
    axes = tuple(range(1, gt.ndim))
    return jnp.sum(gt.astype(jnp.float32), axis=axes) / math.prod(
        gt.shape[1:])
