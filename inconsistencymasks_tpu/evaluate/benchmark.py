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

# Running count of packed-mask bytes fetched device->host by this module —
# the dominant benchmark cost on this environment's ~1 MB/s relay.  The
# grid-cell runners log the per-cell delta (ROADMAP "benchmark d2h" item).
_D2H_BYTES: int = 0


def d2h_bytes() -> int:
    """Total device->host mask bytes downloaded by benchmark calls so far."""
    return _D2H_BYTES


def _count_d2h(arr: np.ndarray) -> np.ndarray:
    global _D2H_BYTES
    _D2H_BYTES += arr.nbytes
    return arr


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
            preds = bitpack.unpackbits2d(_count_d2h(np.asarray(packed))[skip:],
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
            preds_np = _count_d2h(np.asarray(preds))[skip:]
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
        packed = _count_d2h(np.asarray(_threshold_pack(probs, threshold)))[skip:]
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


# --------------------------------------------------------------------------
# Population benchmarks: ONE stacked forward for all K candidates of a cell
# --------------------------------------------------------------------------
# The per-candidate functions above walk each split once per candidate
# (K x 3 passes per cell).  A cell's candidates share the architecture, so
# their parameters stack on a leading axis and one jitted program evaluates
# all K per batch (the same static-unroll layout as pseudo/engine.py
# StackedEnsemble) with per-candidate metric reductions fused in.  Replaces
# the reference's strictly per-model benchmark loops
# (functions.py:1078-1151 called once per candidate, e.g. 03:82-85) with a
# single device pass; mask downloads happen only for candidates that dump
# prediction PNGs.

_STACKED_FORWARD_CACHE: dict = {}


def _stacked_forward_fn(module):
    from ..ops.unroll import unrolled_map
    fn = _STACKED_FORWARD_CACHE.get(module)
    if fn is None:
        fn = jax.jit(lambda stacked, images: unrolled_map(
            lambda v: module.apply(v, images, train=False), stacked))
        _STACKED_FORWARD_CACHE[module] = fn
    return fn


@jax.jit
def _binary_postproc_pop(probs, gt, threshold):
    """probs (K,B,H,W,1), gt (B,H,W,1) -> (packed (K,B,H,W//8),
    iou (K,B), dice (K,B)); identical math to _binary_postproc per k."""
    pred = probs[..., 0] > threshold                       # (K,B,H,W) bool
    t = (gt[..., 0] != 0)[None]                            # (1,B,H,W) bool
    inter = jnp.sum(jnp.logical_and(t, pred).astype(jnp.float32),
                    axis=(-1, -2))
    union = jnp.sum(jnp.logical_or(t, pred).astype(jnp.float32),
                    axis=(-1, -2))
    iou = inter / (union + 1e-7)
    tf = t.astype(jnp.float32)
    pf = pred.astype(jnp.float32)
    dice_inter = jnp.sum(tf * pf, axis=(-1, -2))
    dice_union = (jnp.sum(tf, axis=(-1, -2))
                  + jnp.sum(pf, axis=(-1, -2)))
    dice = (2.0 * dice_inter + 1.0) / (dice_union + 1.0)
    return bitpack.packbits2d(pred), iou, dice


def _iou_multi_unique_pop(pred, gt, num_classes, eps=1e-7):
    """iou_multi_unique for a (K,B,H,W) prediction stack against one
    (B,H,W) gt, computed classwise via scan so peak memory stays at a few
    (K,B,H,W) booleans instead of a (K*B,H,W,C) float one-hot."""
    def body(carry, c):
        iou_sum, cnt = carry
        t = gt == c                                        # (B,H,W)
        p = pred == c                                      # (K,B,H,W)
        inter = jnp.sum(jnp.logical_and(t[None], p).astype(jnp.float32),
                        axis=(-1, -2))                     # (K,B)
        tsum = jnp.sum(t.astype(jnp.float32), axis=(-1, -2))   # (B,)
        psum = jnp.sum(p.astype(jnp.float32), axis=(-1, -2))   # (K,B)
        union = tsum[None] + psum - inter
        present = tsum > 0                                 # (B,)
        iou_sum = iou_sum + jnp.where(present[None],
                                      inter / (union + eps), 0.0)
        cnt = cnt + present.astype(jnp.float32)
        return (iou_sum, cnt), None

    k, b = pred.shape[0], pred.shape[1]
    init = (jnp.zeros((k, b), jnp.float32), jnp.zeros((b,), jnp.float32))
    (iou_sum, cnt), _ = jax.lax.scan(body, init, jnp.arange(num_classes))
    return iou_sum / cnt[None]


@_partial(jax.jit, static_argnums=2)
def _multiclass_postproc_pop(probs, gt, num_classes):
    """Returns (preds, pa, iou) with preds NIBBLE-PACKED (2 px/byte) on
    device when the class ids fit 4 bits and W is even — the unlabeled
    pred-dump download measured 818 MB/cell raw on the SUIM quality run
    (2,340 images x 5 candidates over the ~MB/s relay); packing halves
    it.  Cityscapes (35 classes) and odd widths stay raw uint8."""
    pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)    # (K,B,H,W)
    correct = jnp.sum((pred == gt[None]).astype(jnp.float32), axis=(-1, -2))
    pa = correct / (gt.shape[-1] * gt.shape[-2])           # (K,B)
    iou = _iou_multi_unique_pop(pred, gt, num_classes)
    pred = pred.astype(jnp.uint8)
    if num_classes <= 16 and pred.shape[-1] % 2 == 0:
        pred = bitpack.packnibbles2d(pred)                 # (K,B,H,W//2)
    return pred, pa, iou


@jax.jit
def _threshold_pack_pop(probs, threshold):
    """(K,B,H,W,C) probs -> (K,B,C,H,W//8) bit-packed."""
    m = jnp.moveaxis(probs > threshold, -1, 2)
    return bitpack.packbits2d(m)


def _fetch_dumped(packed, dump_idx, k):
    """Download only the candidates that dump PNGs: all-K fetch when every
    candidate dumps, per-candidate device slices otherwise."""
    if len(dump_idx) == k:
        return _count_d2h(np.asarray(packed))
    out = {}
    for i in dump_idx:
        out[i] = _count_d2h(np.asarray(packed[i]))
    return out


@flushes_writes
def benchmark_binary_population(module, variables_list, images_ds: Dataset,
                                *, pred_dirs=None, batch_size: int = 64,
                                threshold: float = 0.5):
    """K-candidate ISIC-style benchmark in one stacked pass.

    ``pred_dirs``: per-candidate dump dir or None (no dump), len K.
    Returns ``[(mIoU, mdice), ...]`` per candidate with reference rounding
    (functions.py:1129-1147), exactly as K benchmark_binary calls would.
    """
    from ..train.checkpoint import stack_variables
    k = len(variables_list)
    pred_dirs = pred_dirs or [None] * k
    stacked = stack_variables(list(variables_list))
    forward = _stacked_forward_fn(module)
    dump_idx = [i for i, d in enumerate(pred_dirs) if d]
    for i in dump_idx:
        os.makedirs(pred_dirs[i], exist_ok=True)

    ious = [[] for _ in range(k)]
    dices = [[] for _ in range(k)]
    cursor = 0
    w = images_ds.images.shape[2]
    for images, gts, skip in device_eval_batches(images_ds, batch_size,
                                                 pad_final=True):
        probs = forward(stacked, images)
        packed, iou, dice = _binary_postproc_pop(probs, gts, threshold)
        iou_np = np.asarray(iou)[:, skip:]
        dice_np = np.asarray(dice)[:, skip:]
        for i in range(k):
            ious[i].extend(round(float(v), 4) for v in iou_np[i])
            dices[i].extend(round(float(v), 4) for v in dice_np[i])
        if dump_idx:
            fetched = _fetch_dumped(packed, dump_idx, k)
            for i in dump_idx:
                preds = bitpack.unpackbits2d(fetched[i][skip:],
                                             w) * np.uint8(255)
                for j in range(preds.shape[0]):
                    imwrite_async(os.path.join(
                        pred_dirs[i], images_ds.names[cursor + j]), preds[j])
        cursor += iou_np.shape[1]

    return [(round(float(np.sum(ious[i]) / len(ious[i])), 3),
             round(float(np.sum(dices[i]) / len(dices[i])), 3))
            for i in range(k)]


@flushes_writes
def benchmark_multiclass_population(module, variables_list,
                                    images_ds: Dataset, *, num_classes: int,
                                    class_to_color: dict, pred_dirs=None,
                                    batch_size: int = 64):
    """K-candidate multiclass benchmark in one stacked pass.  Returns
    ``[(mPA, mIoU), ...]`` per candidate (reference rounding)."""
    from ..train.checkpoint import stack_variables
    k = len(variables_list)
    pred_dirs = pred_dirs or [None] * k
    forward = _stacked_forward_fn(module)
    dump_idx = [i for i, d in enumerate(pred_dirs) if d]
    for i in dump_idx:
        os.makedirs(pred_dirs[i], exist_ok=True)
    lut = class_to_color_lut(class_to_color, num_classes)

    # HBM-bounded candidate chunking, sized deterministically up front:
    # a compile-time OOM on this backend is an OPAQUE remote_compile 500
    # (CLAUDE.md), so a catch-and-halve cannot see it.  The dominant
    # buffer is the (K,B,H,W,num_classes) f32 logits stack — 7.75 GB for
    # the Cityscapes benchmark (K=10, B=64, 208x416, 35 classes), which
    # is what OOMed at full K.  Bound the logits stack to
    # IM_BENCH_HBM_GB (activations ride in the remaining headroom) and
    # pad the final chunk by repeating candidates so every chunk shares
    # ONE compiled program.  SUIM/HeLa shapes resolve to their full K,
    # keeping their previous single-pass behavior (and compile caches).
    chunk_stacks = None

    pas = [[] for _ in range(k)]
    ious = [[] for _ in range(k)]
    cursor = 0
    for images, gts, skip in device_eval_batches(images_ds, batch_size,
                                                 pad_final=True):
        if chunk_stacks is None:
            b, h, w0 = (int(images.shape[0]), int(images.shape[1]),
                        int(images.shape[2]))
            budget = float(os.environ.get("IM_BENCH_HBM_GB", "2")) * 1e9
            per_cand = b * h * w0 * num_classes * 4
            ck = max(1, min(k, int(budget // max(per_cand, 1)) or 1))
            cap = int(os.environ.get("IM_BENCH_POP_MAX", "0"))
            if cap:
                ck = min(ck, cap)
            chunk_stacks = []
            for c0 in range(0, k, ck):
                vs = list(variables_list[c0:c0 + ck])
                real = len(vs)
                while len(vs) < ck:
                    vs.append(vs[-1])          # pad: one compiled shape
                chunk_stacks.append((c0, real, stack_variables(vs)))
        gt2d = gts[..., 0] if gts.ndim == 4 else gts
        w = int(images.shape[2])
        packed = num_classes <= 16 and w % 2 == 0
        nrow = None
        for c0, real, st in chunk_stacks:
            probs = forward(st, images)
            preds, pa, iou = _multiclass_postproc_pop(probs, gt2d,
                                                      num_classes)
            pa_np = np.asarray(pa)[:real, skip:]
            iou_np = np.asarray(iou)[:real, skip:]
            nrow = pa_np.shape[1]
            for i in range(real):
                pas[c0 + i].extend(round(float(v), 4) for v in pa_np[i])
                ious[c0 + i].extend(round(float(v), 4) for v in iou_np[i])
            local_dump = [i - c0 for i in dump_idx if c0 <= i < c0 + real]
            if local_dump:
                fetched = _fetch_dumped(preds[:real], local_dump, real)
                for li in local_dump:
                    pn = fetched[li][skip:]
                    if packed:
                        pn = bitpack.unpacknibbles2d(pn, w)
                    for j in range(pn.shape[0]):
                        name = images_ds.names[cursor + j]
                        imwrite_async(os.path.join(pred_dirs[c0 + li],
                                                   name), pn[j])
                        color = lut[pn[j]]
                        imwrite_async(
                            os.path.join(pred_dirs[c0 + li],
                                         f"{name[:-4]}_color.png"),
                            cv2.cvtColor(color, cv2.COLOR_RGB2BGR))
        cursor += nrow

    return [(round(float(np.sum(pas[i]) / len(pas[i])), 3),
             round(float(np.sum(ious[i]) / len(ious[i])), 3))
            for i in range(k)]


@flushes_writes
def benchmark_hela_population(module, variables_list, ds: Dataset, *,
                              pred_dirs=None, batch_size: int = 64,
                              threshold: float = 0.5,
                              mod_position: bool = True):
    """K-candidate HeLa benchmark sharing one stacked forward.  The metric
    math needs the mask pixels on host (contours/cell counts, reference
    functions.py:1222-1245), so all K candidates' packed masks download —
    the same bytes as K benchmark_hela calls, in one device pass.
    Returns ``[(mIoU, mIoU_ad, mcce), ...]`` per candidate."""
    from ..train.checkpoint import stack_variables
    k = len(variables_list)
    pred_dirs = pred_dirs or [None] * k
    stacked = stack_variables(list(variables_list))
    forward = _stacked_forward_fn(module)
    for i, d in enumerate(pred_dirs):
        if d:
            for chan in ("alive", "dead",
                         "mod_position" if mod_position else "position"):
                os.makedirs(os.path.join(d, chan), exist_ok=True)

    mious = [[] for _ in range(k)]
    mious_ad = [[] for _ in range(k)]
    cc_delta = [0] * k
    cursor = 0
    w = ds.images.shape[2]
    for images, gts, skip in device_eval_batches(ds, batch_size,
                                                 device_targets=False,
                                                 pad_final=True):
        probs = forward(stacked, images)
        packed = _count_d2h(np.asarray(
            _threshold_pack_pop(probs, threshold)))[:, skip:]
        gts = np.asarray(gts)[skip:]
        preds = bitpack.unpackbits2d(packed, w) * np.uint8(255)  # (K,B,3,H,W)
        b = preds.shape[1]
        # gt-side contours/counts are candidate-independent: compute once
        for j in range(b):
            gt_alive = (gts[j, :, :, 0] > 0).astype(np.uint8) * 255
            gt_dead = (gts[j, :, :, 1] > 0).astype(np.uint8) * 255
            gt_pos = (gts[j, :, :, 2] > 0).astype(np.uint8) * 255
            gt_positions = get_pos_contours(gt_pos)
            ga, gd, _ = get_cell_count(gt_positions, gt_alive, gt_dead)
            for i in range(k):
                alive_u, dead_u, pos_u = (preds[i, j, 0], preds[i, j, 1],
                                          preds[i, j, 2])
                if mod_position:
                    pos_u = mod_pos_size(pos_u)
                iou_a = round(_np_iou(gt_alive, alive_u), 4)
                iou_d = round(_np_iou(gt_dead, dead_u), 4)
                iou_p = round(_np_iou(gt_pos, pos_u), 4)
                mious[i].append((iou_a + iou_d + iou_p) / 3)
                mious_ad[i].append((iou_a + iou_d) / 2)
                pred_pos = get_pos_contours(pos_u)
                pa, pd, _ = get_cell_count(pred_pos, alive_u, dead_u)
                cc_delta[i] += abs(pa - ga) + abs(pd - gd)
                if pred_dirs[i]:
                    name = ds.names[cursor + j]
                    imwrite_async(os.path.join(pred_dirs[i], "alive", name),
                                  alive_u)
                    imwrite_async(os.path.join(pred_dirs[i], "dead", name),
                                  dead_u)
                    chan = "mod_position" if mod_position else "position"
                    imwrite_async(os.path.join(pred_dirs[i], chan, name),
                                  pos_u)
        cursor += b

    return [(round(float(np.sum(mious[i]) / len(mious[i])), 3),
             round(float(np.sum(mious_ad[i]) / len(mious_ad[i])), 3),
             round(cc_delta[i] / len(mious[i]), 3)) for i in range(k)]
