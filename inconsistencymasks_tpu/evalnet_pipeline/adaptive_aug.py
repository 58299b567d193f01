"""EvalNet-guided adaptive augmentation — the IM++/AIM++ core
(reference functions.py:5684-6121): each accepted (image, pseudo-label)
pair is scored; the number of augmented copies written is 1..5, linear
between MIN_THRESHOLD and MAX_THRESHOLD:

    step = (max_t - min_t) / 5
    score > max_t           -> 5
    min_t < score <= max_t  -> 1 + int((score - min_t) / step)
    otherwise               -> 1
    (clamped to 5)                                  [functions.py:5742-5751]

Scoring is batched on device (one jitted ensemble-mean program per batch);
the augmented copies are produced by the HOST cv2 pipeline
(ops/augment_host) since the pairs are already host arrays and the relay
download would dominate — same output set as the reference's per-image
loop.

``create_augment_images_and_masks_with_gt`` is the GT-IM++ oracle
(functions.py:6057-6121): the score is the TRUE mean IoU vs ground truth
computed over classes present in gt, with IM (class-0) pixels excluded.
"""

from __future__ import annotations

import os
from typing import Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import list_pngs
from ..ops import augment
from ..ops.augment_host import augment_image_and_masks_host
from ..ops.unroll import unrolled_map
from ..pseudo.engine import StackedEnsemble
from ..utils.io_pool import flushes_writes, imwrite_async

_SCORE_CACHE: dict = {}


def _scorer(module):
    """Jitted ensemble-MEAN scorer: the E-model unroll and the mean over
    models run as one program (an eager per-batch mean costs a ~1 s
    dispatch on this backend)."""
    fn = _SCORE_CACHE.get(module)
    if fn is None:
        def score(stacked, imgs, masks):
            out = unrolled_map(
                lambda v: module.apply(v, imgs, masks, train=False),
                stacked)
            return jax.tree.map(lambda t: jnp.mean(t, axis=0), out)
        fn = jax.jit(score)
        _SCORE_CACHE[module] = fn
    return fn


def num_augs_from_score(score: float, min_threshold: float,
                        max_threshold: float) -> int:
    step = (max_threshold - min_threshold) / 5
    if score > max_threshold:
        n = 5
    elif score > min_threshold:
        n = 1 + int((score - min_threshold) / step)
    else:
        n = 1
    return min(n, 5)


def _write_adaptive_augs(images, masks, names, num_augs, out_main,
                         aug_params, rng, channels, multiclass_mask):
    """Write ``num_augs[i]`` augmented copies of each (image, mask) pair.

    Runs on the HOST (ops/augment_host — the reference's own per-image cv2
    loop, functions.py:5742-5757): the pairs are already host arrays read
    from disk, and a device round trip would download ~200 KB/copy over
    the ~1 MB/s relay; only the EvalNet scoring touches the device."""
    for i in range(images.shape[0]):
        for j in range(int(num_augs[i])):
            oi, (om,) = augment_image_and_masks_host(
                rng, images[i], [masks[i]], aug_params)
            stem = names[i][:-4]
            bgr = (cv2.cvtColor(oi, cv2.COLOR_RGB2BGR)
                   if channels == 3 else oi[..., 0] if oi.ndim == 3 else oi)
            imwrite_async(os.path.join(out_main, "images",
                                     f"{stem}___{j}.png"), bgr)
            imwrite_async(os.path.join(out_main, "masks",
                                     f"{stem}___{j}.png"), om)
    return rng


@flushes_writes
def create_augment_images_and_masks_with_evalnet_binary(
        evalnet_module, evalnets: Sequence, main_input_path: str,
        main_output_path: str, *, min_threshold: float, max_threshold: float,
        channels: int = 3, brightness_range_alpha=(0.6, 1.4),
        brightness_range_beta=(-20, 20), max_blur: int = 3,
        max_noise: int = 20, free_rotation: bool = True,
        batch_size: int = 16, seed: int = 0) -> None:
    """reference functions.py:5684-5757 (ensemble; E=1 covers the single
    variant)."""
    ens = StackedEnsemble(evalnet_module, evalnets)
    score = _scorer(evalnet_module)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    names = list_pngs(os.path.join(main_input_path, "images"))
    aug_p = augment.AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)
    rng = np.random.RandomState(seed)

    for start in range(0, len(names), batch_size):
        chunk = names[start:start + batch_size]
        imgs, masks = [], []
        for n in chunk:
            img = cv2.imread(os.path.join(main_input_path, "images", n))
            if channels == 3:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            else:
                img = cv2.imread(os.path.join(main_input_path, "images", n),
                                 0)[..., None]
            imgs.append(img)
            masks.append(cv2.imread(
                os.path.join(main_input_path, "masks", n), 0))
        imgs = np.stack(imgs)
        masks = np.stack(masks)
        scores = score(ens.stacked, jnp.asarray(imgs),
                       jnp.asarray(masks[..., None]))        # (B,1) mean
        mean = np.asarray(scores)[:, 0]
        num_augs = np.asarray([num_augs_from_score(s, min_threshold,
                                                   max_threshold)
                               for s in mean])
        rng = _write_adaptive_augs(imgs, masks, chunk, num_augs,
                                   main_output_path, aug_p, rng, channels,
                                   multiclass_mask=False)


@flushes_writes
def create_augment_images_and_masks_with_evalnet_multiclass(
        evalnet_module, evalnets: Sequence, main_input_path: str,
        main_output_path: str, *, num_classes: int, min_threshold: float,
        max_threshold: float, channels: int = 3, detection_masked: bool = True,
        brightness_range_alpha=(0.6, 1.4), brightness_range_beta=(-20, 20),
        max_blur: int = 3, max_noise: int = 20, free_rotation: bool = False,
        batch_size: int = 16, seed: int = 0) -> None:
    """Two-head ensemble variant (reference functions.py:5946-6052):
    per-class IoU averaged over classes with mean detection >= 0.5."""
    ens = StackedEnsemble(evalnet_module, evalnets)
    score = _scorer(evalnet_module)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    names = list_pngs(os.path.join(main_input_path, "images"))
    aug_p = augment.AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)
    rng = np.random.RandomState(seed)
    eye = np.eye(num_classes, dtype=np.uint8)

    for start in range(0, len(names), batch_size):
        chunk = names[start:start + batch_size]
        imgs, masks = [], []
        for n in chunk:
            imgs.append(cv2.cvtColor(
                cv2.imread(os.path.join(main_input_path, "images", n)),
                cv2.COLOR_BGR2RGB))
            masks.append(cv2.imread(
                os.path.join(main_input_path, "masks", n), 0))
        imgs = np.stack(imgs)
        masks = np.stack(masks)
        onehot = eye[np.clip(masks, 0, num_classes - 1)]
        iou_p, det_p = score(ens.stacked, jnp.asarray(imgs),
                             jnp.asarray(onehot))
        mean_iou = np.asarray(iou_p)                         # (B,C) means
        mean_det = np.asarray(det_p)
        if detection_masked:
            valid = mean_det >= 0.5
            nv = valid.sum(-1)
            miou = np.where(nv > 0,
                            (mean_iou * valid).sum(-1) / np.maximum(nv, 1),
                            0.0)
        else:
            miou = mean_iou.mean(-1)
        num_augs = np.asarray([num_augs_from_score(s, min_threshold,
                                                   max_threshold)
                               for s in miou])
        rng = _write_adaptive_augs(imgs, masks, chunk, num_augs,
                                   main_output_path, aug_p, rng, channels,
                                   multiclass_mask=True)


@flushes_writes
def create_augment_images_and_masks_with_gt(
        main_input_path: str, gt_masks_path: str, main_output_path: str, *,
        num_classes: int, min_threshold: float, max_threshold: float,
        channels: int = 3, brightness_range_alpha=(0.6, 1.4),
        brightness_range_beta=(-20, 20), max_blur: int = 3,
        max_noise: int = 20, free_rotation: bool = False,
        batch_size: int = 16, seed: int = 0) -> None:
    """GT oracle (reference functions.py:6057-6121): true mIoU vs gt over
    classes present in gt, skipping IM (class 0) pixels of the pseudo-label."""
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    names = list_pngs(os.path.join(main_input_path, "images"))
    aug_p = augment.AugmentParams(
        max_blur=max_blur, max_noise=max_noise,
        brightness_alpha=tuple(brightness_range_alpha),
        brightness_beta=tuple(brightness_range_beta),
        free_rotation=free_rotation)
    rng = np.random.RandomState(seed)

    @jax.jit
    def gt_miou(pred, gt):
        t = jax.nn.one_hot(gt, num_classes, dtype=jnp.float32)
        p = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
        # exclude the IM class from both (pred class-0 = blocked pixels)
        t = t[..., 1:]
        p = p[..., 1:]
        inter = jnp.sum(t * p, axis=(1, 2))
        union = jnp.sum(jnp.maximum(t, p), axis=(1, 2))
        present = (jnp.sum(t, axis=(1, 2)) > 0).astype(jnp.float32)
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)
        return jnp.sum(iou * present, axis=-1) / jnp.maximum(
            jnp.sum(present, axis=-1), 1)

    for start in range(0, len(names), batch_size):
        chunk = names[start:start + batch_size]
        imgs, masks, gts = [], [], []
        for n in chunk:
            imgs.append(cv2.cvtColor(
                cv2.imread(os.path.join(main_input_path, "images", n)),
                cv2.COLOR_BGR2RGB))
            masks.append(cv2.imread(
                os.path.join(main_input_path, "masks", n), 0))
            gts.append(cv2.imread(os.path.join(gt_masks_path, n), 0))
        imgs = np.stack(imgs)
        masks = np.stack(masks)
        gts = np.stack(gts)
        scores = np.asarray(gt_miou(jnp.asarray(masks.astype(np.int32)),
                                    jnp.asarray(gts.astype(np.int32))))
        num_augs = np.asarray([num_augs_from_score(s, min_threshold,
                                                   max_threshold)
                               for s in scores])
        rng = _write_adaptive_augs(imgs, masks, chunk, num_augs,
                                   main_output_path, aug_p, rng, channels,
                                   multiclass_mask=True)
