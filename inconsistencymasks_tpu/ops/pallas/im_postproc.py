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


def _kernel(probs_ref, images_ref, thr_ref,
            img_out_ref, mask_out_ref, im_out_ref, im_size_ref,
            pred_size_ref, *, k: int, dilate: bool):
    # probs_ref: (1, K, H, W) f32;  images_ref: (1, H, W, C) u8
    thr = thr_ref[0]
    votes = jnp.zeros(probs_ref.shape[2:], jnp.int32)          # (H, W)
    for i in range(k):
        votes = votes + (probs_ref[0, i] > thr).astype(jnp.int32)
    pred = (votes == k)
    im = jnp.logical_and(votes != 0, votes != k)

    im_size_ref[0, 0] = jnp.sum(im.astype(jnp.int32))
    pred_size_ref[0, 0] = jnp.sum(pred.astype(jnp.int32))

    im_f = im.astype(jnp.float32)
    if dilate:
        # 3x3 dilation with zero border: max over the 9 shifts.  Shifts are
        # built from jnp.pad + static slices so edges see zeros (cv2's
        # dilate border = -inf == 0 for binary masks).
        h, w = im_f.shape
        padded = jnp.pad(im_f, ((1, 1), (1, 1)))
        out = im_f
        for di in range(3):
            for dj in range(3):
                if di == 1 and dj == 1:
                    continue
                out = jnp.maximum(out, padded[di:di + h, dj:dj + w])
        im_f = out

    hole = im_f > 0
    img = images_ref[0]                                        # (H, W, C)
    img_out_ref[0] = jnp.where(hole[..., None], jnp.uint8(0), img)
    mask_out_ref[0] = jnp.where(hole, jnp.uint8(0),
                                pred.astype(jnp.uint8) * 255)
    im_out_ref[0] = (im_f > 0).astype(jnp.uint8) * 255


@functools.partial(jax.jit,
                   static_argnames=("dilate_3x3", "interpret"))
def fused_im_postprocess_binary(probs, images, threshold,
                                dilate_3x3: bool = False,
                                interpret: bool = False):
    """probs (K, B, H, W, 1) f32, images (B, H, W, C) u8 ->
    (blocked_img u8, blocked_mask (B,H,W) u8, im (B,H,W) u8,
     im_size (B,) i32, pred_size (B,) i32).

    Semantics == ops.im_core.binary_im + optional 3x3 dilate + blockout
    (block_input=block_output=True).
    """
    k, b, h, w, _ = probs.shape
    c = images.shape[-1]
    probs_bk = jnp.moveaxis(probs[..., 0], 0, 1)               # (B, K, H, W)
    thr = jnp.full((1,), threshold, jnp.float32)

    kernel = functools.partial(_kernel, k=k, dilate=dilate_3x3)
    out_shapes = (
        jax.ShapeDtypeStruct((b, h, w, c), jnp.uint8),
        jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
    )
    img_b, mask_b, im, im_size, pred_size = pl.pallas_call(
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
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(probs_bk, images, thr)
    return img_b, mask_b, im, im_size[:, 0], pred_size[:, 0]
