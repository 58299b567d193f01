"""Pallas TPU kernel: the fused binary IM post-process.

One VMEM-resident pass per image computes, from the K models'
probabilities, everything after the convs in the IM pipeline
(reference functions.py:3104-3120 + 2858-2887 semantics):

    threshold (>t)  ->  unanimity vote  ->  disagreement mask (IM)
    ->  3x3 dilation of the IM (zero border, cv2 parity)
    ->  gray-out of image and pseudo-label  ->  im/pred pixel counts

The XLA path (ops/im_core.py + ops/morphology.py) already fuses most of
this; the Pallas kernel exists to (a) guarantee a single VMEM round-trip
independent of XLA's fusion decisions — probs are read once from HBM and
every intermediate (votes, IM, dilation scratch) stays on-chip — and (b)
serve as the template for deeper fusions (conv epilogues).  Equivalence to
the XLA path is asserted in tests/test_pallas.py.

Grid: one program per image; block = the whole (H, W) plane (256^2 f32
probs x K=4 is ~1 MB of VMEM, well under the ~16 MB budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sep_morph(x_i32, kernel: int, is_max: bool):
    """Separable (kernel x kernel) min/max over a (H, W) int32 plane with
    cv2 border parity (erode pads with the max identity so the border
    never shrinks foreground; dilate pads with 0) — 1-D passes over rows
    then columns keep live temporaries inside the VMEM scoped-stack
    budget.  Mirrors ops/morphology._pool (cv2-parity-tested)."""
    combine = jnp.maximum if is_max else jnp.minimum
    ident = 0 if is_max else 1
    lo = kernel // 2
    hi = kernel - 1 - lo
    h, w = x_i32.shape
    p = jnp.pad(x_i32, ((lo, hi), (0, 0)), constant_values=ident)
    acc = p[0:h]
    for s in range(1, kernel):
        acc = combine(acc, p[s:s + h])
    p = jnp.pad(acc, ((0, 0), (lo, hi)), constant_values=ident)
    acc = p[:, 0:w]
    for s in range(1, kernel):
        acc = combine(acc, p[:, s:s + w])
    return acc


def _kernel(probs_ref, images_ref, thr_ref,
            img_out_ref, mask_out_ref, im_out_ref, im_raw_ref,
            *, k: int, erode_k: int, dilate_k: int, block_input: bool,
            block_output: bool):
    # probs_ref: (1, K, H, W) f32;  images_ref: (1, H, W, C) u8
    thr = thr_ref[0]
    votes = jnp.zeros(probs_ref.shape[2:], jnp.int32)          # (H, W)
    for i in range(k):
        votes = votes + (probs_ref[0, i] > thr).astype(jnp.int32)
    pred = (votes == k)
    im = jnp.logical_and(votes != 0, votes != k)
    # pre-morphology IM (for the size statistics, reduced outside — TPU
    # Pallas does not allow (1,1) blocked scalar outputs)
    im_raw_ref[0] = im.astype(jnp.uint8)

    im_i = im.astype(jnp.int32)
    if erode_k > 0:
        im_i = _sep_morph(im_i, erode_k, is_max=False)
    if dilate_k > 0:
        im_i = _sep_morph(im_i, dilate_k, is_max=True)

    hole = im_i > 0
    # Mosaic restriction: minor-dim-inserting broadcasts are only supported
    # for 32-bit types, so the masked multiply runs in int32.
    keep_i32 = 1 - hole.astype(jnp.int32)                      # (H, W)
    img_i32 = images_ref[0].astype(jnp.int32)                  # (H, W, C)
    img_keep = keep_i32 if block_input else jnp.ones_like(keep_i32)
    msk_keep = keep_i32 if block_output else jnp.ones_like(keep_i32)
    img_out_ref[0] = (img_i32 * img_keep[..., None]).astype(jnp.uint8)
    mask_out_ref[0] = (pred.astype(jnp.int32) * msk_keep * 255
                       ).astype(jnp.uint8)
    im_out_ref[0] = (hole.astype(jnp.int32) * 255).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("erode_kernel", "dilate_kernel",
                                    "block_input", "block_output",
                                    "interpret"))
def fused_im_postprocess_binary(probs, images, threshold,
                                erode_kernel: int = 0,
                                dilate_kernel: int = 0,
                                block_input: bool = True,
                                block_output: bool = True,
                                interpret: bool = False):
    """probs (K, B, H, W, 1) f32, images (B, H, W, C) u8 ->
    (blocked_img u8, blocked_mask (B,H,W) u8, im (B,H,W) u8,
     im_size (B,) i32, pred_size (B,) i32).

    Semantics == ops.im_core.binary_im + erode/dilate (cv2 parity) +
    blockout — the full binary production post-process
    (reference functions.py:3104-3120 + 2858-2874), so pseudo/im.py can
    run it behind IM_PALLAS=1.
    """
    k, b, h, w, _ = probs.shape
    c = images.shape[-1]
    probs_bk = jnp.moveaxis(probs[..., 0], 0, 1)               # (B, K, H, W)
    thr = jnp.full((1,), threshold, jnp.float32)

    # Mosaic's scoped-VMEM accounting grows with the grid size for this
    # kernel; chunk the batch so each pallas_call stays within the 16 MB
    # stack budget.
    chunk = 8
    if b > chunk and b % chunk == 0:
        outs = [fused_im_postprocess_binary(
            probs[:, s:s + chunk], images[s:s + chunk], threshold,
            erode_kernel=erode_kernel, dilate_kernel=dilate_kernel,
            block_input=block_input, block_output=block_output,
            interpret=interpret)
            for s in range(0, b, chunk)]
        return tuple(jnp.concatenate([o[i] for o in outs])
                     for i in range(5))

    kernel = functools.partial(_kernel, k=k, erode_k=erode_kernel,
                               dilate_k=dilate_kernel,
                               block_input=block_input,
                               block_output=block_output)
    out_shapes = (
        jax.ShapeDtypeStruct((b, h, w, c), jnp.uint8),
        jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
    )
    img_b, mask_b, im, im_raw = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(probs_bk, images, thr)
    # size statistics: cheap XLA reductions over the pre-morphology IM and
    # the unanimity mask (recovered from mask_b OR'd with the dilated holes
    # is lossy, so recompute pred from probs — elementwise, fuses away)
    im_size = jnp.sum(im_raw.astype(jnp.int32), axis=(1, 2))
    votes = jnp.sum(probs_bk > threshold, axis=1)
    pred_size = jnp.sum((votes == k).astype(jnp.int32), axis=(1, 2))
    return img_b, mask_b, im, im_size, pred_size


# ---------------------------------------------------------------------------
# Multiclass (SUIM / Cityscapes) post-process
# (reference functions.py:3123-3137 + 3043-3051 semantics)
# ---------------------------------------------------------------------------


def _kernel_multiclass(cm_ref, pred_ref, hole_ref, imraw_ref,
                       *, k: int, num_classes: int, erode_k: int,
                       dilate_k: int, block_output: bool):
    # cm_ref: (1, K, H, W) int32 argmax class maps
    cm0 = cm_ref[0, 0]
    if k == 1:
        agree = jnp.ones(cm0.shape, jnp.bool_)
    else:
        agree = cm_ref[0, 1] == cm0
        for i in range(2, k):
            agree = jnp.logical_and(agree, cm_ref[0, i] == cm0)
    im = jnp.logical_not(agree)
    imraw_ref[0] = im.astype(jnp.uint8)
    pred = jnp.where(agree, cm0, 0)                    # (H, W) int32

    im_i = im.astype(jnp.int32)
    if erode_k > 0:
        im_i = _sep_morph(im_i, erode_k, is_max=False)
        # the reference 3x3-dilates the class map when eroding the IM
        # (functions.py:3043-3047 via dilate_mask, functions.py:3075-3100):
        # each class's plane dilated, overwritten in ASCENDING class order
        # so higher ids win at boundaries; class 0 (the IM class) never
        # dilates.  Mirrors ops/morphology.dilate_multiclass.
        acc = jnp.zeros(pred.shape, jnp.int32)
        for c in range(1, num_classes):
            plane = (pred == c).astype(jnp.int32)
            d = _sep_morph(plane, 3, is_max=True)
            acc = jnp.where(d > 0, c, acc)
        pred = acc
    if dilate_k > 0:
        im_i = _sep_morph(im_i, dilate_k, is_max=True)
    hole = im_i > 0
    if block_output:
        pred = jnp.where(hole, 0, pred)
    pred_ref[0] = pred.astype(jnp.uint8)
    hole_ref[0] = hole.astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("erode_kernel", "dilate_kernel",
                                    "num_classes", "block_output",
                                    "interpret"))
def fused_im_postprocess_multiclass(class_maps,
                                    erode_kernel: int = 0,
                                    dilate_kernel: int = 0, *,
                                    num_classes: int,
                                    block_output: bool = True,
                                    interpret: bool = False):
    """class_maps (K, B, H, W) int32 (argmax'd outside — the argmax is a
    bandwidth-bound elementwise reduce XLA fuses with the model's softmax
    head; the kernel owns everything after it) ->
    (pred (B,H,W) u8 class map, hole (B,H,W) u8 {0,1}, im_size (B,) i32).

    Semantics == pseudo.im._fused_im_multiclass (reference
    functions.py:3123-3137: intersection pred, class 0 on disagreement;
    3043-3051: IM erode + ascending-order 3x3 class-map dilation).
    im_size counts the PRE-morphology disagreement pixels, like the
    reference's ``np.count_nonzero(im)`` before erode/dilate."""
    k, b, h, w = class_maps.shape
    cm = jnp.moveaxis(class_maps, 0, 1)                # (B, K, H, W)

    chunk = 8
    if b > chunk and b % chunk == 0:
        outs = [fused_im_postprocess_multiclass(
            class_maps[:, s:s + chunk], erode_kernel, dilate_kernel,
            num_classes=num_classes, block_output=block_output,
            interpret=interpret)
            for s in range(0, b, chunk)]
        return tuple(jnp.concatenate([o[i] for o in outs])
                     for i in range(3))

    kernel = functools.partial(_kernel_multiclass, k=k,
                               num_classes=num_classes,
                               erode_k=erode_kernel, dilate_k=dilate_kernel,
                               block_output=block_output)
    pred, hole, im_raw = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, k, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, h, w), jnp.uint8) for _ in range(3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cm)
    im_size = jnp.sum(im_raw.astype(jnp.int32), axis=(1, 2))
    return pred, hole, im_size


# ---------------------------------------------------------------------------
# HeLa 3-channel post-process
# (reference functions.py:3165-3202 semantics)
# ---------------------------------------------------------------------------


def _kernel_hela(probs_ref, thr_ref, planes_ref, cnt_ref,
                 *, k: int, erode_k: int, dilate_k: int):
    # probs_ref: (1, K*3, H, W) f32 — model-major (model k, channel c) at
    # plane k*3+c; channels are (alive, dead, position)
    thr = thr_ref[0]
    shape = probs_ref.shape[2:]
    preds = []
    cnt = jnp.zeros(shape, jnp.int32)
    for c in range(3):
        votes = jnp.zeros(shape, jnp.int32)
        for i in range(k):
            # HeLa thresholds with >= (reference functions.py:3174)
            votes = votes + (probs_ref[0, i * 3 + c] >= thr
                             ).astype(jnp.int32)
        preds.append((votes == k).astype(jnp.int32))
        cnt = cnt + jnp.logical_and(votes != 0, votes != k
                                    ).astype(jnp.int32)
    cnt_ref[0] = cnt.astype(jnp.uint8)                 # per-pixel 0..3
    im_i = (cnt > 0).astype(jnp.int32)                 # channel-max IM
    alive, dead, pos = preds
    if erode_k > 0:
        im_i = _sep_morph(im_i, erode_k, is_max=False)
        # eroding the IM pairs with 3x3 dilation of the alive/dead masks
        # (reference functions.py:3189-3193); position circles are redrawn
        # on host and are NOT dilated
        alive = _sep_morph(alive, 3, is_max=True)
        dead = _sep_morph(dead, 3, is_max=True)
    if dilate_k > 0:
        im_i = _sep_morph(im_i, dilate_k, is_max=True)
    planes_ref[0, 0] = (alive * 255).astype(jnp.uint8)
    planes_ref[0, 1] = (dead * 255).astype(jnp.uint8)
    planes_ref[0, 2] = (pos * 255).astype(jnp.uint8)
    planes_ref[0, 3] = ((im_i > 0).astype(jnp.int32) * 255
                        ).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("erode_kernel", "dilate_kernel",
                                    "interpret"))
def fused_im_postprocess_hela(probs, threshold,
                              erode_kernel: int = 0,
                              dilate_kernel: int = 0,
                              interpret: bool = False):
    """probs (K, B, H, W, 3) f32 -> (planes (B, 4, H, W) u8 {0,255} =
    (alive, dead, pos_raw, im), im_size (B,) i32).

    Same contract as pseudo.im._fused_im_hela minus the bit-packing
    (applied by the caller): per-channel unanimity masks, channel-combined
    IM with erode/dilate, alive/dead 3x3 dilation when eroding
    (reference functions.py:3165-3202).  im_size sums the PRE-morphology
    per-channel disagreements (functions.py:3200)."""
    k, b, h, w, _ = probs.shape
    # (B, K, 3, H, W) -> (B, K*3, H, W): model-major plane order
    pr = jnp.moveaxis(probs, 0, 1)
    pr = jnp.moveaxis(pr, -1, 2).reshape(b, k * 3, h, w)
    thr = jnp.full((1,), threshold, jnp.float32)

    chunk = 8
    if b > chunk and b % chunk == 0:
        outs = [fused_im_postprocess_hela(
            probs[:, s:s + chunk], threshold,
            erode_kernel=erode_kernel, dilate_kernel=dilate_kernel,
            interpret=interpret)
            for s in range(0, b, chunk)]
        return tuple(jnp.concatenate([o[i] for o in outs])
                     for i in range(2))

    kernel = functools.partial(_kernel_hela, k=k, erode_k=erode_kernel,
                               dilate_k=dilate_kernel)
    planes, cnt = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k * 3, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 4, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pr, thr)
    im_size = jnp.sum(cnt.astype(jnp.int32), axis=(1, 2))
    return planes, im_size
