"""EvalNet training-data generators (reference functions.py:3419-4323).

Two families:

1. Checkpoint-model datagen (``create_training_data_evalnet_binary`` /
   ``_multiclass``, reference 3419-3567): one previously-trained model
   predicts every labeled image; the pred mask is saved as
   ``{stem}___{i}.png`` and an (name, IoU-vs-gt) row appended to
   ``labels.csv``; loop index 0 also copies the GT pairs with label 1.0.

2. IM datagen (``..._im_*``, reference 3572-4006): per loop, a RANDOM
   2-4-model subset produces an IM pseudo-label, random erode/dilate from
   {0, 3, 5} is applied, the pair is blocked out, labeled with IoU vs gt
   (scalar, or classwise IoU + detection for the mIoU variants), randomly
   augmented with p=0.5 and saved as ``{stem}_aug_{nl}.png``.

TPU design: per batch, ALL K teacher probabilities are computed once
(stacked vmap); each image's random subset is a (B, K) boolean mask and the
"unanimity over the subset" reduction happens under that mask — so the
per-image random subsets of the reference become one fused program with no
recompilation.  Random morphology per image = compute the {0,3,5} variants
and per-image select (selects are free next to the model FLOPs).
"""

from __future__ import annotations

import csv
import os
import shutil
from functools import partial
from typing import Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import eval_batches, list_pngs, load_images
from ..ops import augment, bitpack, metrics, morphology
from ..ops.augment_host import augment_image_and_masks_host
from ..pseudo.engine import StackedEnsemble
from .labels import compute_classwise_detection_im, compute_classwise_iou
from ..utils.io_pool import flushes_writes, imwrite_async

_KERNEL_CHOICES = (0, 3, 5)

# jitted entry points for the per-batch metric math (eager dispatch is
# ~1 s/op on this backend) — fixed batch shapes via pad_final keep these
# at one compile per program
_iou_binary_j = jax.jit(metrics.iou_binary)
_iou_multi_j = jax.jit(metrics.iou_multi_unique,
                       static_argnames="num_classes")


def _pad_rows(a: np.ndarray, bs: int) -> np.ndarray:
    """Repeat the last row so a host batch matches the fixed batch size
    (the gt-side mirror of ``eval_batches(pad_final=True)``: every distinct
    batch shape is a separate multi-minute remote compile)."""
    if a.shape[0] == bs:
        return a
    return np.concatenate([a, np.repeat(a[-1:], bs - a.shape[0], axis=0)])


def _append_labels(main_output_path: str, rows) -> None:
    with open(os.path.join(main_output_path, "labels.csv"), "a",
              encoding="utf-8", newline="") as f:
        writer = csv.writer(f, delimiter=";")
        for row in rows:
            writer.writerow(row)


def _pred_name(imagename: str, i: int) -> str:
    """The reference's ``___{i}`` naming incl. the i>=10 aug special case
    (functions.py:3466-3472)."""
    if i >= 10 and "aug" in imagename:
        return f"{imagename[:-10]}___{i}_{imagename[-6:-4]}.png"
    return f"{imagename[:-4]}___{i}.png"


def _copy_gt_pairs(images_path, masks_path, main_output_path, rows):
    for imagename in list_pngs(images_path):
        rows.append((imagename, 1.0))
        shutil.copy(os.path.join(images_path, imagename),
                    os.path.join(main_output_path, "images", imagename))
        shutil.copy(os.path.join(masks_path, imagename),
                    os.path.join(main_output_path, "masks", imagename))


_JIT_CACHE: dict = {}


def _forward(module):
    fn = _JIT_CACHE.get(module)
    if fn is None:
        fn = jax.jit(lambda v, x: module.apply(v, x, train=False))
        _JIT_CACHE[module] = fn
    return fn


@flushes_writes
def create_training_data_evalnet_binary(module, variables, images_path: str,
                                        masks_path: str,
                                        main_output_path: str, i: int, *,
                                        channels: int = 3,
                                        threshold: float = 0.5,
                                        batch_size: int = 32) -> None:
    forward = _forward(module)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    ds = load_images(images_path, channels)
    gt = load_images(masks_path, 1, names=ds.names)

    rows = []
    cursor = 0
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, len(ds) - cursor)
        probs = forward(variables, jnp.asarray(images))
        preds = np.asarray(((probs[..., 0] > threshold) * 255
                            ).astype(jnp.uint8))
        gts = _pad_rows(gt.images[cursor:cursor + valid, ..., 0], batch_size)
        ious = np.asarray(_iou_binary_j(jnp.asarray(gts),
                                        jnp.asarray(preds)))
        for j in range(valid):
            name = _pred_name(ds.names[cursor + j], i)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        preds[j])
            rows.append((name, round(float(ious[j]), 4)))
        cursor += valid

    if i == 0:
        _copy_gt_pairs(images_path, masks_path, main_output_path, rows)
    _append_labels(main_output_path, rows)


@flushes_writes
def create_training_data_evalnet_multiclass(module, variables,
                                            images_path: str,
                                            masks_path: str,
                                            main_output_path: str, i: int, *,
                                            num_classes: int,
                                            channels: int = 3,
                                            classwise_labels: bool = False,
                                            batch_size: int = 32) -> None:
    """classwise_labels=True is the reference's mIoU checkpoint datagen
    (functions.py:4248-4323): rows carry per-class IoU + per-class
    detection (>1 % coverage rule) instead of one scalar."""
    from .labels import compute_classwise_detection
    forward = _forward(module)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    ds = load_images(images_path, channels)
    gt = load_images(masks_path, 1, names=ds.names)

    rows = []
    cursor = 0
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, len(ds) - cursor)
        probs = forward(variables, jnp.asarray(images))
        preds = np.asarray(jnp.argmax(probs, axis=-1).astype(jnp.uint8))
        gts = _pad_rows(gt.images[cursor:cursor + valid, ..., 0], batch_size)
        pred_i = jnp.asarray(preds.astype(np.int32))
        gt_i = jnp.asarray(gts.astype(np.int32))
        if classwise_labels:
            cw = np.asarray(compute_classwise_iou(pred_i, gt_i,
                                                  num_classes))
            det = np.asarray(compute_classwise_detection(gt_i, num_classes))
        else:
            ious = np.asarray(_iou_multi_j(pred_i, gt_i,
                                           num_classes=num_classes))
        for j in range(valid):
            name = _pred_name(ds.names[cursor + j], i)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        preds[j])
            if classwise_labels:
                rows.append((name, *[round(float(v), 4) for v in cw[j]],
                             *[int(v) for v in det[j]]))
            else:
                rows.append((name, round(float(ious[j]), 4)))
        cursor += valid

    if i == 0:
        if classwise_labels:
            for imagename in list_pngs(images_path):
                rows.append((imagename, *([1.0] * num_classes),
                             *([1] * num_classes)))
                shutil.copy(os.path.join(images_path, imagename),
                            os.path.join(main_output_path, "images",
                                         imagename))
                shutil.copy(os.path.join(masks_path, imagename),
                            os.path.join(main_output_path, "masks",
                                         imagename))
        else:
            _copy_gt_pairs(images_path, masks_path, main_output_path, rows)
    _append_labels(main_output_path, rows)


# --------------------------------------------------------------------------
# IM datagen: random model subsets, fused
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("binary",))
def _subset_im(probs, subset_mask, threshold, binary=True):
    """probs (K,B,H,W,C); subset_mask (B,K) bool -> per-image IM over each
    image's RANDOM model subset, fully batched.

    binary: pred = all-selected agree 1; im = 0 < votes < n_selected.
    multiclass: agreement of argmaxes across selected models.
    """
    k = probs.shape[0]
    sel = subset_mask.T.astype(jnp.int32)                      # (K, B)
    n_sel = jnp.sum(sel, axis=0)                               # (B,)
    if binary:
        m = (probs > threshold).astype(jnp.int32)              # (K,B,H,W,C)
        selb = sel[:, :, None, None, None]
        votes = jnp.sum(m * selb, axis=0)                      # (B,H,W,C)
        nb = n_sel[:, None, None, None]
        pred = (votes == nb).astype(jnp.uint8) * 255
        im = jnp.logical_and(votes != 0, votes != nb)
        im2d = (jnp.max(im, axis=-1).astype(jnp.uint8)) * 255
        return pred[..., 0], im2d
    cm = jnp.argmax(probs, axis=-1).astype(jnp.int32)          # (K,B,H,W)
    # "first selected model" reference value per image
    first_idx = jnp.argmax(sel, axis=0)                        # (B,)
    ref = jnp.take_along_axis(
        cm, first_idx[None, :, None, None], axis=0)[0]         # (B,H,W)
    selb = sel[:, :, None, None]
    agree = jnp.all(jnp.where(selb > 0, cm == ref[None], True), axis=0)
    pred = jnp.where(agree, ref, 0).astype(jnp.uint8)
    im2d = (jnp.logical_not(agree).astype(jnp.uint8)) * 255
    return pred, im2d


@jax.jit
def _random_morphology(im2d, erode_choice, dilate_choice):
    """Apply per-image random erode/dilate kernel from {0,3,5}: compute the
    three variants, select per image (choices (B,) in {0,1,2})."""
    er = jnp.stack([im2d, morphology.erode(im2d, 3),
                    morphology.erode(im2d, 5)])
    im2d = jnp.take_along_axis(
        er, erode_choice[None, :, None, None], axis=0)[0]
    di = jnp.stack([im2d, morphology.dilate(im2d, 3),
                    morphology.dilate(im2d, 5)])
    return jnp.take_along_axis(
        di, dilate_choice[None, :, None, None], axis=0)[0]


@jax.jit
def _hela_subset_vote_block(probs, subset_mask, threshold, er, di):
    """HeLa per-image random-subset unanimity vote + random morphology +
    blockout as ONE program (reference functions.py:3881-4006 semantics):
    probs (K,B,H,W,3), subset_mask (B,K) -> (blocked 3-channel pred,
    im2d).  The blocked brightfield image is composed on the HOST from
    the original + im2d (byte-identical, saves the image download)."""
    sel = subset_mask.T.astype(jnp.int32)
    n_sel = jnp.sum(sel, axis=0)
    m = (probs >= threshold).astype(jnp.int32)
    votes = jnp.sum(m * sel[:, :, None, None, None], axis=0)
    nb = n_sel[:, None, None, None]
    pred = ((votes == nb) * 255).astype(jnp.uint8)            # (B,H,W,3)
    im = jnp.logical_and(votes != 0, votes != nb)
    im2d = (jnp.max(im, axis=-1) * 255).astype(jnp.uint8)
    im2d = _random_morphology(im2d, er, di)
    hole = im2d > 0
    pred = jnp.where(hole[..., None], jnp.uint8(0), pred)
    return pred, im2d


@jax.jit
def _hela_iou_det(pred, gts):
    """Per-channel IoU + any-pixel detection flags, (B,H,W,3) -> 2x(B,3)."""
    inter = jnp.sum(((pred > 0) & (gts > 0)).astype(jnp.float32),
                    axis=(1, 2))
    union = jnp.sum(((pred > 0) | (gts > 0)).astype(jnp.float32),
                    axis=(1, 2))
    det = (jnp.sum((gts > 0).astype(jnp.int32), axis=(1, 2)) > 0
           ).astype(jnp.float32)
    return inter / (union + 1e-7), det


def _random_subsets(rng: np.random.RandomState, b: int, k: int,
                    n_min: int, n_max: int) -> np.ndarray:
    out = np.zeros((b, k), bool)
    for i in range(b):
        n = rng.randint(n_min, n_max + 1)
        out[i, rng.choice(k, size=min(n, k), replace=False)] = True
    return out


def _im_datagen_common(ens, images, threshold, host_rng, n_min, n_max,
                      binary):
    """Device half of the IM datagen: probs -> per-image random-subset IM
    -> random morphology.  Returns DEVICE (pred, im2d) — blockout and
    image composition happen on the host from the packed downloads."""
    b, k = images.shape[0], ens.size
    subset = _random_subsets(host_rng, b, k, n_min, n_max)
    probs = ens.predict_probs(images)
    pred, im2d = _subset_im(probs, jnp.asarray(subset), threshold,
                            binary=binary)
    er = jnp.asarray(host_rng.randint(0, 3, size=b))
    di = jnp.asarray(host_rng.randint(0, 3, size=b))
    im2d = _random_morphology(im2d, er, di)
    return pred, im2d


# Transfer-minimal download protocol (the relay moves device->host at
# ~1 MB/s): the blocked pred/IM cross bit- or nibble-packed and the
# blocked IMAGE is composed on the host from the original it already
# holds (image[im > 0] = 0 — byte-identical to the device blockout);
# augmentation runs host-side cv2 (ops/augment_host, the reference's own
# semantics).  Per 16-batch at 256^2 this downloads ~32 KB instead of the
# ~8 MB of blocked + augmented images the round-2 writers fetched.

@jax.jit
def _pack_blocked_binary(pred, im2d):
    hole = im2d > 0
    pred = jnp.where(hole, jnp.uint8(0), pred)
    return bitpack.packbits2d(pred), bitpack.packbits2d(im2d)


@partial(jax.jit, static_argnames=("nibble",))
def _pack_blocked_multiclass(pred, im2d, nibble):
    hole = im2d > 0
    pred = jnp.where(hole, jnp.uint8(0), pred)
    pm = bitpack.packnibbles2d(pred) if nibble else pred
    return pm, bitpack.packbits2d(im2d)


@partial(jax.jit, static_argnames=("num_classes", "classwise"))
def _mc_blocked_labels(pred, im2d, gts, num_classes, classwise, det_thr):
    """Label math on the BLOCKED class map as one program: classwise IoU +
    IM detection (mIoU variant) or the scalar unique-class IoU."""
    pred = jnp.where(im2d > 0, jnp.uint8(0), pred).astype(jnp.int32)
    if classwise:
        cw = compute_classwise_iou(pred, gts, num_classes)
        gt_counts = jax.nn.one_hot(gts, num_classes,
                                   dtype=jnp.float32).sum(axis=(1, 2))
        det = compute_classwise_detection_im(pred, num_classes, gt_counts,
                                             det_thr)
        return cw, det
    return metrics.iou_multi_unique(pred, gts, num_classes)


@jax.jit
def _pack_blocked_hela(pred, im2d):
    hole = im2d > 0
    pred = jnp.where(hole[..., None], jnp.uint8(0), pred)
    # (B,H,W,3) -> (B,3,H,W/8): pack each channel plane
    return (bitpack.packbits2d(jnp.moveaxis(pred, -1, 1)),
            bitpack.packbits2d(im2d))


@flushes_writes
def create_training_data_evalnet_im_binary(
        module, models: Sequence, images_path: str, masks_path: str,
        main_output_path: str, num_loops: int, *, n_min_models: int = 2,
        n_max_models: int = 4, channels: int = 3, threshold: float = 0.5,
        brightness_range_alpha=(0.6, 1.4), brightness_range_beta=(-20, 20),
        max_blur: int = 3, max_noise: int = 20, free_rotation: bool = False,
        batch_size: int = 16, seed: int = 0) -> None:
    """reference functions.py:3572-3668."""
    ens = StackedEnsemble(module, models)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    ds = load_images(images_path, channels)
    gt = load_images(masks_path, 1, names=ds.names)
    host_rng = np.random.RandomState(seed)
    aug_p = augment.AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)

    w = ds.images.shape[2]
    rows = []
    for nl in range(num_loops):
        cursor = 0
        for images, _ in eval_batches(ds, batch_size, pad_final=True):
            valid = min(batch_size, len(ds) - cursor)
            pred_d, im_d = _im_datagen_common(
                ens, jnp.asarray(images), threshold, host_rng,
                n_min_models, n_max_models, binary=True)
            pp, pi = _pack_blocked_binary(pred_d, im_d)
            pred_np = bitpack.unpackbits2d(np.asarray(pp), w) * np.uint8(255)
            hole = bitpack.unpackbits2d(np.asarray(pi), w).astype(bool)
            img_b = np.where(hole[..., None], np.uint8(0), images)
            gts = gt.images[cursor:cursor + valid, ..., 0]
            t = gts != 0
            p = pred_np[:valid] != 0
            inter = np.logical_and(t, p).sum(axis=(1, 2)).astype(np.float64)
            union = np.logical_or(t, p).sum(axis=(1, 2)).astype(np.float64)
            ious = inter / (union + 1e-7)
            take_aug = host_rng.random_sample(batch_size) < 0.5
            for i in range(valid):
                name = f"{ds.names[cursor + i][:-4]}_aug_{nl}.png"
                rows.append((name, round(float(ious[i]), 4)))
                oi, om = img_b[i], pred_np[i]
                if take_aug[i]:
                    oi, (om,) = augment_image_and_masks_host(
                        host_rng, oi, [om], aug_p)
                bgr = (cv2.cvtColor(oi, cv2.COLOR_RGB2BGR)
                       if channels == 3 else oi)
                imwrite_async(os.path.join(main_output_path, "images", name),
                            bgr)
                imwrite_async(os.path.join(main_output_path, "masks", name),
                            om)
            cursor += valid

    _append_labels(main_output_path, rows)


@flushes_writes
def create_training_data_evalnet_im_multiclass(
        module, models: Sequence, images_path: str, masks_path: str,
        main_output_path: str, num_loops: int, *, num_classes: int,
        n_min_models: int = 2, n_max_models: int = 4, channels: int = 3,
        brightness_range_alpha=(0.6, 1.4), brightness_range_beta=(-20, 20),
        max_blur: int = 3, max_noise: int = 20, free_rotation: bool = False,
        batch_size: int = 16, seed: int = 0,
        classwise_labels: bool = False, detection_threshold: float = 0.3
) -> None:
    """reference functions.py:3673-3769 (scalar labels) and 3773-3877
    (classwise_labels=True: the miou variant, per-class IoU + detection)."""
    ens = StackedEnsemble(module, models)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    ds = load_images(images_path, channels)
    gt = load_images(masks_path, 1, names=ds.names)
    host_rng = np.random.RandomState(seed)
    aug_p = augment.AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)

    w = ds.images.shape[2]
    nibble = num_classes <= 16
    rows = []
    for nl in range(num_loops):
        cursor = 0
        for images, _ in eval_batches(ds, batch_size, pad_final=True):
            valid = min(batch_size, len(ds) - cursor)
            pred_d, im_d = _im_datagen_common(
                ens, jnp.asarray(images), 0.5, host_rng, n_min_models,
                n_max_models, binary=False)
            gts = jnp.asarray(_pad_rows(
                gt.images[cursor:cursor + valid, ..., 0], batch_size
            ).astype(np.int32))
            # metrics on the BLOCKED pred (device, tiny (B,C) downloads),
            # pixels on the packed protocol
            pm, pi = _pack_blocked_multiclass(pred_d, im_d, nibble)
            if classwise_labels:
                cw_d, det_d = _mc_blocked_labels(
                    pred_d, im_d, gts, num_classes, True,
                    detection_threshold)
                cw, det = np.asarray(cw_d), np.asarray(det_d)
            else:
                scalar = np.asarray(_mc_blocked_labels(
                    pred_d, im_d, gts, num_classes, False, 0.0))
            pred_np = (bitpack.unpacknibbles2d(np.asarray(pm), w) if nibble
                       else np.asarray(pm))
            hole = bitpack.unpackbits2d(np.asarray(pi), w).astype(bool)
            img_b = np.where(hole[..., None], np.uint8(0), images)
            take_aug = host_rng.random_sample(batch_size) < 0.5
            for i in range(valid):
                name = f"{ds.names[cursor + i][:-4]}_aug_{nl}.png"
                if classwise_labels:
                    rows.append((name,
                                 *[round(float(v), 4) for v in cw[i]],
                                 *[int(v) for v in det[i]]))
                else:
                    rows.append((name, round(float(scalar[i]), 4)))
                oi, om = img_b[i], pred_np[i]
                if take_aug[i]:
                    oi, (om,) = augment_image_and_masks_host(
                        host_rng, oi, [om], aug_p)
                bgr = (cv2.cvtColor(oi, cv2.COLOR_RGB2BGR)
                       if channels == 3 else oi)
                imwrite_async(os.path.join(main_output_path, "images", name),
                            bgr)
                imwrite_async(os.path.join(main_output_path, "masks", name),
                            om)
            cursor += valid

    _append_labels(main_output_path, rows)


@flushes_writes
def create_training_data_evalnet_miou_im_multiclass(*args, **kwargs):
    """Alias: the reference's mIoU variant = classwise labels
    (functions.py:3773-3877)."""
    kwargs["classwise_labels"] = True
    return create_training_data_evalnet_im_multiclass(*args, **kwargs)


@flushes_writes
def create_training_data_evalnet_miou_im_hela(
        module, models: Sequence, bf_images_path: str, gt_main_path: str,
        main_output_path: str, num_loops: int, *, n_min_models: int = 2,
        n_max_models: int = 4, threshold: float = 0.5,
        brightness_range_alpha=(0.8, 1.2), brightness_range_beta=(-10, 10),
        max_blur: int = 1, max_noise: int = 10, batch_size: int = 16,
        seed: int = 0) -> None:
    """HeLa mIoU-EvalNet datagen (reference functions.py:3881-4006): random
    model subsets vote per channel; labels = per-channel IoU vs gt +
    per-channel detection (any gt pixels)."""
    ens = StackedEnsemble(module, models)
    for sub in ("brightfield", "alive", "dead", "mod_position"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    ds = load_images(bf_images_path, 1)
    gt_chans = {}
    for chan in ("alive", "dead", "mod_position"):
        gt_chans[chan] = load_images(os.path.join(gt_main_path, chan), 1,
                                     names=ds.names)
    host_rng = np.random.RandomState(seed)
    aug_p = augment.AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta), free_rotation=False)

    h, w = ds.images.shape[1:3]
    rows = []
    for nl in range(num_loops):
        cursor = 0
        for images, _ in eval_batches(ds, batch_size, pad_final=True):
            valid = min(batch_size, len(ds) - cursor)
            probs = ens.predict_probs(jnp.asarray(images))  # (K,B,H,W,3)
            subset = _random_subsets(host_rng, batch_size, ens.size,
                                     n_min_models, n_max_models)
            er = jnp.asarray(host_rng.randint(0, 3, size=batch_size))
            di = jnp.asarray(host_rng.randint(0, 3, size=batch_size))
            pred_d, im_d = _hela_subset_vote_block(
                probs, jnp.asarray(subset), threshold, er, di)

            gts = _pad_rows(np.stack(
                [gt_chans[c].images[cursor:cursor + valid, ..., 0]
                 for c in ("alive", "dead", "mod_position")],
                axis=-1), batch_size)
            ious_j, det_j = _hela_iou_det(pred_d, jnp.asarray(gts))
            ious, det = np.asarray(ious_j), np.asarray(det_j)   # (B, 3)

            pp, pi = _pack_blocked_hela(pred_d, im_d)
            pred_np = np.moveaxis(
                bitpack.unpackbits2d(np.asarray(pp), w), 1, -1
            ) * np.uint8(255)                                   # (B,H,W,3)
            hole = bitpack.unpackbits2d(np.asarray(pi), w).astype(bool)
            img_b = np.where(hole[..., None], np.uint8(0), images)
            take_aug = host_rng.random_sample(batch_size) < 0.5
            for i in range(valid):
                name = f"{ds.names[cursor + i][:-4]}_aug_{nl}.png"
                rows.append((name, *[round(float(v), 4) for v in ious[i]],
                             *[int(v) for v in det[i]]))
                oi, om = img_b[i], pred_np[i]
                if take_aug[i]:
                    oi, (om,) = augment_image_and_masks_host(
                        host_rng, oi, [om], aug_p)
                imwrite_async(os.path.join(main_output_path, "brightfield",
                                         name), oi[..., 0])
                imwrite_async(os.path.join(main_output_path, "alive", name),
                            om[..., 0])
                imwrite_async(os.path.join(main_output_path, "dead", name),
                            om[..., 1])
                imwrite_async(os.path.join(main_output_path, "mod_position",
                                         name), om[..., 2])
            cursor += valid

    _append_labels(main_output_path, rows)


# the reference's per-channel detection rule: a class counts as present
# when its GT mask covers >= 1 % of the pixels (alive/dead) resp. >= 0.1 %
# (position) — functions.py:4086-4096
_HELA_DET_FRACS = (0.01, 0.01, 0.001)


def _hela_detection(gt_stack: np.ndarray) -> np.ndarray:
    """(B,H,W,3) uint8 -> (B,3) float detection flags."""
    px = gt_stack.shape[1] * gt_stack.shape[2]
    counts = (gt_stack > 0).sum(axis=(1, 2))
    thr = np.asarray(_HELA_DET_FRACS) * px
    return (counts >= thr).astype(np.float32)


@flushes_writes
def create_training_data_evalnet_miou_hela(
        module, variables, bf_images_path: str, gt_main_path: str,
        main_output_path: str, i: int, *, threshold: float = 0.5,
        include_pos: bool = True, batch_size: int = 32) -> None:
    """HeLa checkpoint-model datagen (reference functions.py:4011-4243
    ``create_training_data_evalnet_miou_hela`` / ``include_pos=False`` =
    ``_no_pos``, vestigial in the reference): one trained model predicts
    each brightfield image; thresholded channel masks are saved as
    ``{stem}___{i}.png`` per channel; labels = per-channel (IoU-vs-gt,
    detection) where detection uses the 1 %/1 %/0.1 % coverage rule and the
    IoU is forced to 0 for undetected channels (functions.py:4086-4096).

    Loop 0 also copies the GT channel sets — NOTE the reference's GT rows
    reuse the detection flags of the LAST image processed in the
    prediction loop (stale-variable quirk, functions.py:4104-4124: the
    second loop never re-reads the masks), so every GT row gets that one
    image's (detection, detection-as-iou) values; reproduced here with our
    deterministic sorted order."""
    forward = _forward(module)
    chans = ("brightfield", "alive", "dead", "mod_position")
    out_chans = chans if include_pos else chans[:3]
    for sub in out_chans:
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    ds = load_images(bf_images_path, 1)
    gts = {c: load_images(os.path.join(gt_main_path, c), 1, names=ds.names)
           for c in chans[1:]}

    n_ch = 3 if include_pos else 2
    rows = []
    cursor = 0
    det_last = np.zeros((3,), np.float32)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        probs = forward(variables, jnp.asarray(images))
        preds = np.asarray(((probs > threshold) * 255).astype(jnp.uint8))
        b = min(batch_size, len(ds) - cursor)   # metric math is host-side:
        preds = preds[:b]                       # trim padding after forward
        gt_stack = np.stack(
            [gts[c].images[cursor:cursor + b, ..., 0] for c in chans[1:]],
            axis=-1)                                        # (B,H,W,3)
        inter = ((preds > 0) & (gt_stack > 0)).sum(axis=(1, 2))
        union = ((preds > 0) | (gt_stack > 0)).sum(axis=(1, 2))
        det = _hela_detection(gt_stack)                     # (B,3)
        ious = inter / (union + 1e-7) * det                 # 0 if undetected
        det_last = det[-1]
        for j in range(b):
            name = _pred_name(ds.names[cursor + j], i)
            for ci, c in enumerate(out_chans[1:]):
                imwrite_async(os.path.join(main_output_path, c, name),
                            preds[j, ..., ci])
            rows.append((name,
                         *[round(float(v), 4) for v in ious[j, :n_ch]],
                         *[int(v) for v in det[j, :n_ch]]))
        cursor += b

    if i == 0:
        for name in ds.names:
            rows.append((name,
                         *[float(v) for v in det_last[:n_ch]],
                         *[int(v) for v in det_last[:n_ch]]))
            for c in out_chans:
                src_dir = (bf_images_path if c == "brightfield"
                           else os.path.join(gt_main_path, c))
                src = os.path.join(src_dir, name)
                if os.path.exists(src):
                    shutil.copy(src,
                                os.path.join(main_output_path, c, name))
    _append_labels(main_output_path, rows)
