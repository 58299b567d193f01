"""Inconsistency-Mask pseudo-label generation — the north-star fused path.

Reference flow (functions.py:2832-2891, per image on host):
    cv2.imread -> K separate model.predict -> threshold -> NumPy XOR ->
    cv2.erode/dilate -> image[im>0]=0 -> cv2.imwrite

Here the whole chain after imread is ONE XLA program over a batch:
    K-model vmapped inference -> threshold/argmax -> disagreement (IM) ->
    min/max-pool morphology -> gray-out of image and label,
and the host only decodes inputs and encodes the output PNGs.  Output
semantics (including the binary write filter ``predsize > im_size and
predsize > 0``, functions.py:2878-2882 — zero-disagreement images ARE
written — and the mean-im-size CSV statistic) match the reference
exactly; asserted byte-for-byte against a NumPy/cv2 oracle in
tests/test_golden_im.py.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import eval_batches, load_images
from ..ops import bitpack, im_core, morphology
from ..utils.io_pool import AsyncWriter
from ..postproc.hela import get_min_dist, get_pos_contours
from .engine import StackedEnsemble
from ..utils.io_pool import flushes_writes, imwrite_async


@partial(jax.jit, static_argnames=("erode_kernel", "dilate_kernel",
                                   "block_input", "block_output"))
def _fused_im_binary(probs, images, threshold, erode_kernel, dilate_kernel,
                     block_input, block_output):
    """probs (K,B,H,W,1), images (B,H,W,C) -> blocked image/mask/IM."""
    masks = im_core.probs_to_binary_masks(probs, threshold)
    out = im_core.binary_im(masks)
    im = out.im
    if erode_kernel > 0:
        im = morphology.erode(im, erode_kernel)
    if dilate_kernel > 0:
        im = morphology.dilate(im, dilate_kernel)
    image_b, mask_b = im_core.blockout_binary(
        images, out.pred_mask, im, block_input, block_output)
    return image_b, mask_b, im, out.im_size, out.pred_size


@partial(jax.jit, static_argnames=("erode_kernel", "dilate_kernel"))
def _fused_im_binary_packed(probs, threshold, erode_kernel, dilate_kernel):
    """Transfer-minimal variant: only BIT-PACKED pred/IM planes and the
    size scalars cross the device->host link (~1 MB/s on this relay);
    the blocked image/mask PNGs are composed on the host from the
    original images it already holds — ``image[im > 0] = 0`` is a pure
    mask-out (reference functions.py:2867-2874), so the result is
    byte-identical to the on-device blockout."""
    masks = im_core.probs_to_binary_masks(probs, threshold)
    out = im_core.binary_im(masks)
    im = out.im
    if erode_kernel > 0:
        im = morphology.erode(im, erode_kernel)
    if dilate_kernel > 0:
        im = morphology.dilate(im, dilate_kernel)
    pred_bits = bitpack.packbits2d(out.pred_mask[..., 0])
    hole_bits = bitpack.packbits2d(im)
    return pred_bits, hole_bits, out.im_size, out.pred_size


@flushes_writes
def create_pseudo_labels_im_binary(
        module, models: Sequence, images_dir: str, main_output_path: str, *,
        channels: int = 3, threshold: float = 0.5, erode_kernel: int = 0,
        dilate_kernel: int = 0, block_input: bool = True,
        block_output: bool = True, filter_bad_predictions: bool = True,
        batch_size: int = 128, ensemble: Optional[StackedEnsemble] = None
) -> float:
    """ISIC-style IM generation.  Returns mean IM size (rounded, reference
    functions.py:2889)."""
    ens = ensemble or StackedEnsemble(module, models)
    ds = load_images(images_dir, channels)
    # IM_PALLAS=1: run the post-process as the single-VMEM-pass Pallas
    # kernel (ops/pallas/im_postproc.py) instead of the XLA-fused program
    use_pallas = os.environ.get("IM_PALLAS", "0") == "1"

    for sub in ("images", "masks", "im"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)

    im_sizes = {}
    cursor = 0
    width = ds.images.shape[2]
    n_total = len(ds)
    with AsyncWriter() as w:
        for images, _ in eval_batches(ds, batch_size, pad_final=True):
            valid = min(batch_size, n_total - cursor)
            images_j = jnp.asarray(images)
            probs = ens.predict_probs(images_j)
            if use_pallas:
                from ..ops.pallas.im_postproc import (
                    fused_im_postprocess_binary)
                _imgb, mask2d, im2d, im_size, pred_size = \
                    fused_im_postprocess_binary(
                        probs, images_j, threshold,
                        erode_kernel=erode_kernel,
                        dilate_kernel=dilate_kernel,
                        block_input=block_input, block_output=block_output)
                # the kernel's mask is already blocked; pack both planes
                # for the slow link and compose PNGs on host
                pred_bits = bitpack.packbits2d_jit(mask2d)
                hole_bits = bitpack.packbits2d_jit(im2d)
                mask_blocked = True
            else:
                pred_bits, hole_bits, im_size, pred_size = \
                    _fused_im_binary_packed(probs, threshold, erode_kernel,
                                            dilate_kernel)
                mask_blocked = False
            pred = bitpack.unpackbits2d(np.asarray(pred_bits), width)
            hole = bitpack.unpackbits2d(np.asarray(hole_bits), width)
            im_size = np.asarray(im_size)
            pred_size = np.asarray(pred_size)
            keep = (1 - hole).astype(np.uint8)            # (B, H, W) {0,1}
            for i in range(valid):
                name = ds.names[cursor + i]
                im_sizes[name[:-4]] = int(im_size[i])
                # reference filter (functions.py:2878-2882):
                # predsize > im_size AND predsize > 0 — an image with
                # ZERO disagreement is still written
                write = (pred_size[i] > im_size[i] and pred_size[i] > 0
                         if filter_bad_predictions else True)
                if write:
                    img = (images[i] * keep[i][..., None]
                           if block_input else images[i])
                    bgr = (cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
                           if channels == 3 else img)
                    mask = pred[i]
                    if block_output and not mask_blocked:
                        mask = mask * keep[i]
                    w.imwrite(os.path.join(main_output_path, "images",
                                           name), bgr)
                    w.imwrite(os.path.join(main_output_path, "masks",
                                           name), mask * np.uint8(255))
                w.imwrite(os.path.join(main_output_path, "im", name),
                          hole[i] * np.uint8(255))
            cursor += valid

    return round(sum(im_sizes.values()) / len(im_sizes), 0)


@partial(jax.jit, static_argnames=("erode_kernel", "dilate_kernel",
                                   "num_classes", "block_output"))
def _fused_im_multiclass(probs, erode_kernel, dilate_kernel,
                         num_classes, block_output):
    class_maps = im_core.probs_to_class_maps(probs)
    out = im_core.multiclass_im(class_maps)
    im = out.im
    pred = out.pred_mask
    if erode_kernel > 0:
        im = morphology.erode(im, erode_kernel)
        # the reference also 3x3-dilates the pred mask when eroding the IM
        # (functions.py:3043-3047)
        pred = morphology.dilate_multiclass(pred.astype(jnp.int32),
                                            num_classes).astype(jnp.uint8)
    if dilate_kernel > 0:
        im = morphology.dilate(im, dilate_kernel)
    hole = im > 0
    if block_output:
        pred = jnp.where(hole, jnp.uint8(0), pred)
    # per-model per-image class presence, for filter_unequal_class_pred
    present = jax.vmap(lambda cm: jax.nn.one_hot(
        cm, num_classes, dtype=jnp.int32).sum(axis=(1, 2)) > 0)(class_maps)
    # only the class map + a bit-packed hole plane cross the slow
    # device->host link; the blocked image is composed on host from the
    # original (image[im>0]=0 is a pure mask-out, functions.py:3053-3060)
    return pred, bitpack.packbits2d(hole), out.im_size, present


@partial(jax.jit, static_argnames=("num_classes",))
def _classmaps_present(probs, num_classes):
    """Argmax class maps + per-model class-presence table (the two
    pieces the Pallas multiclass kernel leaves to XLA)."""
    class_maps = im_core.probs_to_class_maps(probs)
    present = jax.vmap(lambda cm: jax.nn.one_hot(
        cm, num_classes, dtype=jnp.int32).sum(axis=(1, 2)) > 0)(class_maps)
    return class_maps, present


@flushes_writes
def create_pseudo_labels_im_multiclass(
        module, models: Sequence, images_dir: str, main_output_path: str, *,
        num_classes: int, channels: int = 3, erode_kernel: int = 0,
        dilate_kernel: int = 0, block_input: bool = True,
        block_output: bool = True, filter_unequal_class_pred: bool = False,
        batch_size: int = 128, ensemble: Optional[StackedEnsemble] = None
) -> float:
    """SUIM/Cityscapes IM generation (reference functions.py:2988-3070)."""
    ens = ensemble or StackedEnsemble(module, models)
    ds = load_images(images_dir, channels)
    use_pallas = os.environ.get("IM_PALLAS", "0") == "1"

    for sub in ("images", "masks", "im"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)

    im_sizes = {}
    cursor = 0
    width = ds.images.shape[2]
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        images_j = jnp.asarray(images)
        probs = ens.predict_probs(images_j)
        if use_pallas:
            from ..ops.pallas import im_postproc
            class_maps, present = _classmaps_present(probs, num_classes)
            pred, hole2d, im_size = \
                im_postproc.fused_im_postprocess_multiclass(
                    class_maps, erode_kernel, dilate_kernel,
                    num_classes=num_classes, block_output=block_output)
            hole_bits = bitpack.packbits2d_jit(hole2d)
        else:
            pred, hole_bits, im_size, present = _fused_im_multiclass(
                probs, erode_kernel, dilate_kernel, num_classes,
                block_output)
        pred = np.asarray(pred)
        hole = bitpack.unpackbits2d(np.asarray(hole_bits), width)
        im_size, present = np.asarray(im_size), np.asarray(present)
        keep = (1 - hole).astype(np.uint8)
        for i in range(valid):
            name = ds.names[cursor + i]
            im_sizes[name[:-4]] = int(im_size[i])
            if filter_unequal_class_pred:
                # all models saw the same class set (functions.py:3231-3232)
                write = bool((present[:, i] == present[0, i]).all())
            else:
                write = True
            if write:
                img = (images[i] * keep[i][..., None]
                       if block_input else images[i])
                bgr = (cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
                       if channels == 3 else img)
                imwrite_async(os.path.join(main_output_path, "images", name),
                            bgr)
                imwrite_async(os.path.join(main_output_path, "masks", name),
                            pred[i])
            imwrite_async(os.path.join(main_output_path, "im", name),
                          hole[i] * np.uint8(255))
        cursor += valid

    return round(sum(im_sizes.values()) / len(im_sizes), 0)


@partial(jax.jit, static_argnames=("erode_kernel", "dilate_kernel"))
def _fused_im_hela(probs, images, threshold, erode_kernel, dilate_kernel):
    """probs (K,B,H,W,3) -> per-channel unanimous masks + combined IM.
    (reference functions.py:3165-3202)."""
    masks = (probs >= threshold).astype(jnp.uint8)  # reference uses >= here
    out = im_core.binary_im(masks)                  # channel-wise stats
    # per-channel unanimity: pred_mask (B,H,W,3) in {0,255}
    alive, dead, pos_raw = (out.pred_mask[..., 0], out.pred_mask[..., 1],
                            out.pred_mask[..., 2])
    im = out.im
    if erode_kernel > 0:
        im = morphology.erode(im, erode_kernel)
        alive = morphology.dilate(alive, 3)
        dead = morphology.dilate(dead, 3)
    if dilate_kernel > 0:
        im = morphology.dilate(im, dilate_kernel)
    planes = jnp.stack([alive, dead, pos_raw, im], axis=1)  # (B,4,H,W)
    return bitpack.packbits2d(planes), out.im_size


@flushes_writes
def create_pseudo_labels_im_hela(
        module, models: Sequence, images_dir: str, main_output_path: str, *,
        threshold: float = 0.5, erode_kernel: int = 0, dilate_kernel: int = 0,
        block_input: bool = True, block_output: bool = True,
        max_pos_circle_size: int = 8, min_pos_circle_size: int = 3,
        batch_size: int = 128, ensemble: Optional[StackedEnsemble] = None
) -> float:
    """HeLa IM generation (reference functions.py:2895-2984): fused
    per-channel IM on device; position-circle redraw on host (contours)."""
    ens = ensemble or StackedEnsemble(module, models)
    ds = load_images(images_dir, 1)
    use_pallas = os.environ.get("IM_PALLAS", "0") == "1"

    for sub in ("brightfield", "alive", "dead", "mod_position", "im"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)

    im_sizes = {}
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, n_total - cursor)
        images_j = jnp.asarray(images)
        probs = ens.predict_probs(images_j)
        if use_pallas:
            from ..ops.pallas import im_postproc
            planes_u8, im_size = im_postproc.fused_im_postprocess_hela(
                probs, threshold, erode_kernel=erode_kernel,
                dilate_kernel=dilate_kernel)
            plane_bits = bitpack.packbits2d_jit(planes_u8)
        else:
            plane_bits, im_size = _fused_im_hela(
                probs, images_j, threshold, erode_kernel, dilate_kernel)
        planes = bitpack.unpackbits2d(np.asarray(plane_bits),
                                      ds.images.shape[2]) * np.uint8(255)
        alive, dead, pos_raw, im = (planes[:, 0], planes[:, 1],
                                    planes[:, 2], planes[:, 3])
        im_size = np.asarray(im_size)
        h, w = alive.shape[1:3]
        for i in range(valid):
            name = ds.names[cursor + i]
            im_sizes[name[:-4]] = int(im_size[i])
            # position circles, radius min_dist//4 clamped (host, eval-size)
            positions = get_pos_contours(pos_raw[i])
            pos_mask = np.zeros((h, w, 3), np.uint8)
            for p in positions:
                md = (get_min_dist(p, positions) if len(positions) > 1
                      else 99)
                size = max(min(int(md // 4), max_pos_circle_size),
                           min_pos_circle_size)
                cv2.circle(pos_mask, (p[0], p[1]), size,
                           (255, 255, 255), -1)
            bf = images[i, ..., 0].copy()
            a, d = alive[i].copy(), dead[i].copy()
            hole = im[i] > 0
            if block_input:
                bf[hole] = 0
            if block_output:
                a[hole] = 0
                d[hole] = 0
                pos_mask[hole] = 0
            imwrite_async(os.path.join(main_output_path, "brightfield", name),
                        bf)
            imwrite_async(os.path.join(main_output_path, "alive", name), a)
            imwrite_async(os.path.join(main_output_path, "dead", name), d)
            imwrite_async(os.path.join(main_output_path, "mod_position", name),
                        pos_mask)
            imwrite_async(os.path.join(main_output_path, "im", name), im[i])
        cursor += valid

    return round(sum(im_sizes.values()) / len(im_sizes), 0)
