"""Evaluation metrics — streaming (for epoch-level model selection) and
per-image (for benchmarks), all as on-device jnp reductions.

Reference origins:
- Keras ``BinaryIoU(target_class_ids=[1], threshold=0.5)`` used as the
  checkpoint-selection metric for ISIC (reference functions.py:216-217):
  a confusion matrix accumulated over all validation batches.
- custom streaming ``MeanIoU`` for multiclass (reference functions.py:51-102):
  NOTE this is a *soft* IoU — it multiplies the one-hot target with the raw
  softmax probabilities (no argmax) per class and averages the per-batch mean
  over batches.  We reproduce that exactly since it drives topK selection.
- per-image NumPy metrics (reference functions.py:1767-1861).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Streaming BinaryIoU (Keras-compatible accumulation)
# --------------------------------------------------------------------------

class BinaryIoUState(NamedTuple):
    intersection: jnp.ndarray  # scalar f32: TP for class 1
    union: jnp.ndarray         # scalar f32: TP + FP + FN for class 1

    @classmethod
    def zero(cls):
        return cls(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))


def binary_iou_update(state: BinaryIoUState, y_true: jnp.ndarray,
                      y_pred: jnp.ndarray,
                      threshold: float = 0.5) -> BinaryIoUState:
    """Accumulate the class-1 confusion terms of one batch."""
    t = (y_true.astype(jnp.float32) > threshold)
    p = (y_pred.astype(jnp.float32) > threshold)
    inter = jnp.sum(jnp.logical_and(t, p).astype(jnp.float32))
    union = jnp.sum(jnp.logical_or(t, p).astype(jnp.float32))
    return BinaryIoUState(state.intersection + inter, state.union + union)


def binary_iou_result(state: BinaryIoUState) -> jnp.ndarray:
    return state.intersection / jnp.maximum(state.union, 1e-9)


# --------------------------------------------------------------------------
# Streaming soft MeanIoU (reference functions.py:51-102)
# --------------------------------------------------------------------------

class MeanIoUState(NamedTuple):
    total_iou: jnp.ndarray  # scalar f32
    count: jnp.ndarray      # scalar f32

    @classmethod
    def zero(cls):
        return cls(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))


def mean_iou_update(state: MeanIoUState, y_true: jnp.ndarray,
                    y_pred: jnp.ndarray) -> MeanIoUState:
    """One batch of the reference's streaming soft MeanIoU: per class k,
    IoU(y_true[..., k], y_pred[..., k]) on the *continuous* probabilities,
    then the class-mean is added to a running average over batches."""
    t = y_true.astype(jnp.float32)
    p = y_pred.astype(jnp.float32)
    inter = jnp.sum(t * p, axis=(0, 1, 2))          # (C,)
    union = jnp.sum(t, axis=(0, 1, 2)) + jnp.sum(p, axis=(0, 1, 2)) - inter
    iou = inter / union                              # reference has no eps
    return MeanIoUState(state.total_iou + jnp.mean(iou), state.count + 1.0)


def mean_iou_result(state: MeanIoUState) -> jnp.ndarray:
    return state.total_iou / state.count


# --------------------------------------------------------------------------
# Per-image metrics (batched on device; reference computed these per image
# on host with NumPy)
# --------------------------------------------------------------------------

def iou_binary(gt: jnp.ndarray, pred: jnp.ndarray,
               eps: float = 1e-7) -> jnp.ndarray:
    """Binary IoU treating any nonzero as foreground (reference
    functions.py:1767-1788).  Reduces over all axes except a leading batch
    axis if present (2-D input -> scalar; 3-D (B,H,W) -> (B,))."""
    t = gt != 0
    p = pred != 0
    axes = tuple(range(1, t.ndim)) if t.ndim > 2 else None
    inter = jnp.sum(jnp.logical_and(t, p).astype(jnp.float32), axis=axes)
    union = jnp.sum(jnp.logical_or(t, p).astype(jnp.float32), axis=axes)
    return inter / (union + eps)


def dice_binary(gt: jnp.ndarray, pred: jnp.ndarray, smooth: float = 1.0,
                threshold: int = 128) -> jnp.ndarray:
    """Binary dice on uint8 masks with threshold 128 (reference
    functions.py:1837-1861)."""
    t = (gt.astype(jnp.float32) >= threshold).astype(jnp.float32)
    p = (pred.astype(jnp.float32) >= threshold).astype(jnp.float32)
    axes = tuple(range(1, t.ndim)) if t.ndim > 2 else None
    inter = jnp.sum(t * p, axis=axes)
    union = jnp.sum(t, axis=axes) + jnp.sum(p, axis=axes)
    return (2.0 * inter + smooth) / (union + smooth)


def pixel_accuracy(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """reference functions.py:1820-1834."""
    import math
    axes = tuple(range(1, pred.ndim)) if pred.ndim > 2 else None
    correct = jnp.sum((pred == gt).astype(jnp.float32), axis=axes)
    total = math.prod(gt.shape[1:] if axes else gt.shape)
    return correct / total


def iou_multi_unique(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int,
                     eps: float = 1e-7) -> jnp.ndarray:
    """Mean IoU over the classes PRESENT IN THE GT of each image (reference
    functions.py:1791-1816 ``get_IoU_multi_unique``).

    jit-friendly reformulation: compute per-class IoU for all classes, mask
    by gt-presence, divide by the presence count.  Matches the reference
    exactly: a class present in gt but never predicted contributes IoU 0 (the
    reference's ``intersection/(union+eps)`` with union>0), and a class
    absent from gt is skipped (even if falsely predicted).
    Input: integer class maps, shape (H, W) or (B, H, W); returns scalar/(B,).
    """
    squeeze = pred.ndim == 2
    if squeeze:
        pred, gt = pred[None], gt[None]
    t = jax.nn.one_hot(gt, num_classes, dtype=jnp.float32)    # (B,H,W,C)
    p = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    inter = jnp.sum(t * p, axis=(1, 2))                        # (B,C)
    union = jnp.sum(jnp.maximum(t, p), axis=(1, 2))
    present = (jnp.sum(t, axis=(1, 2)) > 0).astype(jnp.float32)
    iou = inter / (union + eps)
    out = jnp.sum(iou * present, axis=-1) / jnp.sum(present, axis=-1)
    return out[0] if squeeze else out


def iou_per_class_with_detection(pred: jnp.ndarray, gt: jnp.ndarray,
                                 num_classes: int, eps: float = 1e-7):
    """Per-class IoU plus gt/pred presence flags — the label generator for
    EvalNet-mIoU training data (reference functions.py:4328-4459 classwise
    IoU / detection labels).  Returns (iou (B,C), gt_present (B,C),
    pred_present (B,C))."""
    squeeze = pred.ndim == 2
    if squeeze:
        pred, gt = pred[None], gt[None]
    t = jax.nn.one_hot(gt, num_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    inter = jnp.sum(t * p, axis=(1, 2))
    union = jnp.sum(jnp.maximum(t, p), axis=(1, 2))
    iou = inter / (union + eps)
    gt_present = (jnp.sum(t, axis=(1, 2)) > 0).astype(jnp.float32)
    pred_present = (jnp.sum(p, axis=(1, 2)) > 0).astype(jnp.float32)
    if squeeze:
        return iou[0], gt_present[0], pred_present[0]
    return iou, gt_present, pred_present
