"""Benchmark harness: batched device inference + on-device metric
reductions + prediction-PNG dumps.

Replaces the reference's host loops (benchmark_ISIC2018
functions.py:1078-1151, benchmark_hela 1156-1260, benchmark_multiclass
1265-1339): instead of per-image cv2.imread -> model.predict(batch 64) ->
per-image NumPy IoU, the whole split is RAM-resident (data/loader.py), each
batch is ONE jitted program producing thresholded masks AND per-image
metrics, and only uint8 mask bytes cross back for the PNG writes.

Rounding parity: the reference rounds each per-image metric to 4 decimals
and the final mean to 3 (functions.py:1129-1132, 1143-1147); reproduced so
topK selection and CSV outputs are comparable digit-for-digit.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..class_mappings import class_to_color_lut
from ..data.loader import Dataset, device_eval_batches, eval_batches
from ..ops import bitpack, metrics
from ..postproc.hela import get_cell_count, get_pos_contours, mod_pos_size
from ..utils.io_pool import flushes_writes, imwrite_async


_FORWARD_CACHE: dict = {}


def _forward_fn(module):
    """Jitted eval forward, cached per module so repeated benchmark calls
    (10 candidates x 3 splits) reuse one compiled program per shape."""
    key = module
    fn = _FORWARD_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda variables, images: module.apply(
            variables, images, train=False))
        _FORWARD_CACHE[key] = fn
    return fn


from functools import partial as _partial


@jax.jit
def _binary_postproc(probs, gt, threshold):
    pred_u8 = ((probs > threshold) * 255).astype(jnp.uint8)
    p2d, g2d = pred_u8[..., 0], gt[..., 0]
    iou = metrics.iou_binary(g2d, p2d)
    dice = metrics.dice_binary(g2d * 255, p2d)
    # masks cross the (slow) device->host link bit-packed, 8 px/byte
    return bitpack.packbits2d(p2d), iou, dice


@_partial(jax.jit, static_argnums=2)
def _multiclass_postproc(probs, gt, num_classes):
    pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    pa = metrics.pixel_accuracy(pred, gt)
    iou = metrics.iou_multi_unique(pred, gt, num_classes)
    return pred.astype(jnp.uint8), pa, iou


@jax.jit
def _threshold_pack(probs, threshold):
    """(B, H, W, C) probs -> (B, C, H, W//8) bit-packed thresholded
    masks (8x fewer device->host bytes on the slow relay)."""
    m = jnp.moveaxis(probs > threshold, -1, 1)
    return bitpack.packbits2d(m)



@flushes_writes
def benchmark_binary(module, variables, images_ds: Dataset, *,
                     pred_dir: Optional[str] = None, batch_size: int = 64,
                     threshold: float = 0.5, create_images: bool = True):
    """ISIC-style benchmark.  Returns (mIoU, mdice) with reference rounding.

    images_ds.targets: (N, H, W, 1) {0,1} — note the reference compares
    against the RAW 0/255 gt PNG with truthiness (functions.py:1129-1132),
    which is equivalent to the {0,1} encoding here.
    """
    forward = _forward_fn(module)
    postproc = lambda probs, gt: _binary_postproc(probs, gt, threshold)

    if create_images and pred_dir:
        os.makedirs(pred_dir, exist_ok=True)

    ious, dices = [], []
    cursor = 0
    w = images_ds.images.shape[2]
    for images, gts, skip in device_eval_batches(images_ds, batch_size,
                                                 pad_final=True):
        probs = forward(variables, images)
        packed, iou, dice = postproc(probs, gts)
        ious.extend(round(float(v), 4) for v in np.asarray(iou)[skip:])
        dices.extend(round(float(v), 4) for v in np.asarray(dice)[skip:])
        if create_images and pred_dir:
            preds = bitpack.unpackbits2d(np.asarray(packed)[skip:],
                                         w) * np.uint8(255)
            for i in range(preds.shape[0]):
                imwrite_async(os.path.join(
                    pred_dir, images_ds.names[cursor + i]), preds[i])
        cursor += packed.shape[0] - skip

    miou = round(float(np.sum(ious) / len(ious)), 3)
    mdice = round(float(np.sum(dices) / len(dices)), 3)
    return miou, mdice


@flushes_writes
def benchmark_multiclass(module, variables, images_ds: Dataset, *,
                         num_classes: int, class_to_color: dict,
                         pred_dir: Optional[str] = None,
                         batch_size: int = 64, create_images: bool = True):
    """Returns (mPA, mIoU); mIoU averages only classes present in each gt
    (reference get_IoU_multi_unique, functions.py:1791-1816)."""
    forward = _forward_fn(module)
    postproc = lambda probs, gt: _multiclass_postproc(probs, gt, num_classes)

    if create_images and pred_dir:
        os.makedirs(pred_dir, exist_ok=True)
    lut = class_to_color_lut(class_to_color, num_classes)

    pas, ious = [], []
    cursor = 0
    for images, gts, skip in device_eval_batches(images_ds, batch_size,
                                                 pad_final=True):
        probs = forward(variables, images)
        preds, pa, iou = postproc(probs, gts)
        pas_np = np.asarray(pa)[skip:]
        pas.extend(round(float(v), 4) for v in pas_np)
        ious.extend(round(float(v), 4) for v in np.asarray(iou)[skip:])
        if create_images and pred_dir:
            # class-map download only when the PNGs are actually written
            # (metrics are device scalars)
            preds_np = np.asarray(preds)[skip:]
            for i in range(preds_np.shape[0]):
                name = images_ds.names[cursor + i]
                imwrite_async(os.path.join(pred_dir, name), preds_np[i])
                color = lut[preds_np[i]]                    # (H, W, 3) RGB
                imwrite_async(os.path.join(pred_dir, f"{name[:-4]}_color.png"),
                            cv2.cvtColor(color, cv2.COLOR_RGB2BGR))
        cursor += pas_np.shape[0]

    mpa = round(float(np.sum(pas) / len(pas)), 3)
    miou = round(float(np.sum(ious) / len(ious)), 3)
    return mpa, miou


@flushes_writes
def benchmark_hela(module, variables, ds: Dataset, *,
                   pred_dir: Optional[str] = None, batch_size: int = 64,
                   threshold: float = 0.5, save_output: bool = True,
                   mod_position: bool = True):
    """Returns (mIoU, mIoU_ad, mean_cell_count_error).

    ds.targets: (N, H, W, 3) with channels (alive, dead, mod_position) in
    {0,1} / {0,weight}; IoU treats any nonzero as foreground, matching the
    reference's comparison against raw 0/255 gt PNGs.  Position handling
    (mod_pos_size circles, contour counting) runs on host per image —
    eval-only, off the hot path (reference functions.py:1222-1245).
    """
    forward = _forward_fn(module)

    if pred_dir and save_output:
        for chan in ("alive", "dead",
                     "mod_position" if mod_position else "position"):
            os.makedirs(os.path.join(pred_dir, chan), exist_ok=True)

    mious, mious_ad = [], []
    cell_count_delta = 0
    cursor = 0
    w = ds.images.shape[2]
    for images, gts, skip in device_eval_batches(ds, batch_size,
                                                 device_targets=False,
                                                 pad_final=True):
        probs = forward(variables, images)
        packed = np.asarray(_threshold_pack(probs, threshold))[skip:]
        preds = bitpack.unpackbits2d(packed, w) * np.uint8(255)
        gts = np.asarray(gts)[skip:]
        for i in range(preds.shape[0]):
            alive_u, dead_u, pos_u = (preds[i, 0], preds[i, 1],
                                      preds[i, 2])
            if mod_position:
                pos_u = mod_pos_size(pos_u)
            gt_alive = (gts[i, :, :, 0] > 0).astype(np.uint8) * 255
            gt_dead = (gts[i, :, :, 1] > 0).astype(np.uint8) * 255
            gt_pos = (gts[i, :, :, 2] > 0).astype(np.uint8) * 255

            iou_a = round(_np_iou(gt_alive, alive_u), 4)
            iou_d = round(_np_iou(gt_dead, dead_u), 4)
            iou_p = round(_np_iou(gt_pos, pos_u), 4)
            mious.append((iou_a + iou_d + iou_p) / 3)
            mious_ad.append((iou_a + iou_d) / 2)

            pred_pos = get_pos_contours(pos_u)
            pa, pd, _ = get_cell_count(pred_pos, alive_u, dead_u)
            gt_positions = get_pos_contours(gt_pos)
            ga, gd, _ = get_cell_count(gt_positions, gt_alive, gt_dead)
            cell_count_delta += abs(pa - ga) + abs(pd - gd)

            if pred_dir and save_output:
                name = ds.names[cursor + i]
                imwrite_async(os.path.join(pred_dir, "alive", name), alive_u)
                imwrite_async(os.path.join(pred_dir, "dead", name), dead_u)
                chan = "mod_position" if mod_position else "position"
                imwrite_async(os.path.join(pred_dir, chan, name), pos_u)
        cursor += preds.shape[0]

    miou = round(float(np.sum(mious) / len(mious)), 3)
    miou_ad = round(float(np.sum(mious_ad) / len(mious_ad)), 3)
    mcce = round(cell_count_delta / len(mious), 3)
    return miou, miou_ad, mcce


def _np_iou(gt: np.ndarray, pred: np.ndarray, eps: float = 1e-7) -> float:
    inter = np.logical_and(gt, pred).sum()
    union = np.logical_or(gt, pred).sum()
    return float(inter / (union + eps))
