"""Pure-JAX training losses (reference: functions.py:36-184).

All functions take ``y_true`` / ``y_pred`` as float arrays in NHWC layout and
return a scalar.  They are jit-safe and vmap cleanly over a leading
population axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_CCE = 1e-7  # Keras backend epsilon used when clipping probabilities


def mse(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Keras 'mse': mean over every element (the loss the binary/HeLa scripts
    pass as ``loss_func='mse'``, e.g. reference ISIC_2018/03:68)."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    return jnp.mean(jnp.square(y_pred - y_true))


def rmse(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """reference functions.py:36-37."""
    return jnp.sqrt(mse(y_true, y_pred))


def delta_metric(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                 threshold: float = 1.25) -> jnp.ndarray:
    """Depth-estimation delta accuracy (reference functions.py:39-48)."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    max_ratio = jnp.maximum(y_pred / y_true, y_true / y_pred)
    return jnp.mean((max_ratio < threshold).astype(jnp.float32))


def categorical_crossentropy(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                             from_logits: bool = False) -> jnp.ndarray:
    """Keras CategoricalCrossentropy over channels-last one-hot targets,
    averaged over batch and pixels (the multiclass scripts' loss,
    e.g. reference SUIM/03_SUIM_full_dataset.py:70)."""
    y_true = y_true.astype(jnp.float32)
    if from_logits:
        logz = jax.nn.logsumexp(y_pred, axis=-1, keepdims=True)
        logp = y_pred - logz
    else:
        p = jnp.clip(y_pred.astype(jnp.float32), _EPS_CCE, 1.0)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        logp = jnp.log(p)
    return -jnp.mean(jnp.sum(y_true * logp, axis=-1))


def ignore_im_categorical_crossentropy(y_true: jnp.ndarray,
                                       y_pred: jnp.ndarray,
                                       from_logits: bool = False
                                       ) -> jnp.ndarray:
    """CCE that zeroes the loss wherever the target is the IM class
    (channel 0), reference functions.py:105-124."""
    y_true = y_true.astype(jnp.float32)
    if from_logits:
        logz = jax.nn.logsumexp(y_pred, axis=-1, keepdims=True)
        logp = y_pred - logz
    else:
        p = jnp.clip(y_pred.astype(jnp.float32), _EPS_CCE, 1.0)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        logp = jnp.log(p)
    per_pixel = -jnp.sum(y_true * logp, axis=-1)
    mask = 1.0 - y_true[..., 0]
    return jnp.mean(per_pixel * mask)


def ignore_im_dice_loss_multiclass(y_true: jnp.ndarray,
                                   y_pred: jnp.ndarray) -> jnp.ndarray:
    """Multiclass dice loss dropping class 0 (IM), reference
    functions.py:128-158: per-(sample, class) dice over the spatial axes,
    then mean."""
    y_true = y_true[..., 1:].astype(jnp.float32)
    y_pred = y_pred[..., 1:].astype(jnp.float32)
    spatial = tuple(range(1, y_true.ndim - 1))
    intersection = jnp.sum(y_true * y_pred, axis=spatial)
    size_true = jnp.sum(y_true, axis=spatial)
    size_pred = jnp.sum(y_pred, axis=spatial)
    dice = (2.0 * intersection + 1e-7) / (size_true + size_pred + 1e-7)
    return jnp.mean(1.0 - dice)


def dice_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray,
              smooth: float = 1.0) -> jnp.ndarray:
    """Binary dice loss (reference functions.py:162-184): per-sample dice over
    H, W, C, then 1 - mean."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    axes = tuple(range(1, y_true.ndim))
    intersection = jnp.sum(y_true * y_pred, axis=axes)
    union = jnp.sum(y_true, axis=axes) + jnp.sum(y_pred, axis=axes)
    dice_coeff = (2.0 * intersection + smooth) / (union + smooth)
    return 1.0 - jnp.mean(dice_coeff)


def consistency_mse(pred_1: jnp.ndarray, pred_2: jnp.ndarray) -> jnp.ndarray:
    """Consistency regulariser between two augmented views (reference
    functions.py:442-446: mean of Keras per-pixel MSE)."""
    return mse(pred_1, pred_2)


def binary_crossentropy(y_true: jnp.ndarray, y_pred: jnp.ndarray
                        ) -> jnp.ndarray:
    """Keras BinaryCrossentropy on probabilities (EvalNet detection head,
    reference functions.py:4712)."""
    p = jnp.clip(y_pred.astype(jnp.float32), _EPS_CCE, 1.0 - _EPS_CCE)
    y = y_true.astype(jnp.float32)
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))


def mae(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (EvalNet candidate selection metric, reference
    functions.py:4500-4505 sorts by val MAE)."""
    return jnp.mean(jnp.abs(y_pred.astype(jnp.float32)
                            - y_true.astype(jnp.float32)))
