"""Fused Pallas conv3x3+bias+ReLU with fully-fused custom backward.

Round-3 layout-tax attack, step 3 (ROADMAP.md).  The first Pallas
attempt (ops/pallas/conv3x3.py, IM_CONV_IMPL=pallas) measured 236.1
ms/step at pop 15 — WORSE than the dot1x1 default's 182.3 — because it
paid nine per-tap slice+concat shifts and nine small MXU calls per tile,
and left bias+activation (and their backward selects) outside the
kernel, so every conv still had an XLA elementwise neighbourhood forcing
layout choices at the pallas_call edges.  This module re-attacks with
three structural changes:

- ONE im2col matmul per tile: the nine taps concatenate into a
  (th*W, 9*Cin) operand built from only THREE width-shifted slabs (one
  per dw; the dh offsets are plain row slices of those), contracted
  against the (9*Cin, Cout) weight in a single MXU call — no f32
  accumulator adds, 9x fewer matmul issues.
- bias+ReLU fused into the forward kernel, and the ReLU mask fused into
  BOTH backward kernels: ``gz = g * (y > 0)`` is computed in-VMEM from
  the saved output tile, so the activation gradient is never
  materialized in HBM and no XLA elementwise op (with its layout
  preference) touches the conv boundary in either direction.
- dgrad is the same fused kernel applied to (g, y) with the spatially
  flipped, io-transposed weight; wgrad contracts the im2col operand
  against gz over the row axis, accumulating (9*Cin, Cout) f32 and the
  bias gradient across the sequential TPU grid.

Semantics: y = relu(conv2d_same_3x3(x, w) + b), NHWC x, HWIO w, f32
accumulation, output in x.dtype — exactly the packed U-Net encoder-conv
epilogue (models/packed_unet.py:_conv_grouped), replacing the
reference's serialized Keras Conv2D+ReLU candidates
(reference unet.py:11-19, ISIC_2018/03_ISIC_2018_subset.py:43-104).
Wired in behind IM_CONV_IMPL=pallasfused; parity with the unfused path
(forward and all three gradients) is asserted by
tests/test_pallas_fused.py in CPU interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_th(h: int, w: int, cin: int, cout: int) -> int:
    """Largest row tile in (16, 8, 4, 2, 1) dividing H whose per-step
    VMEM footprint — slab + 3 shifted slabs + im2col operand + f32
    accumulator + double-buffered in/out blocks — stays well inside the
    ~16 MB budget (lane dims padded to 128 in the estimate)."""
    cl = max(128, cin)
    col = max(128, cout)
    for th in (16, 8, 4, 2, 1):
        if h % th:
            continue
        slab = (th + 2) * w * cl * 2
        cols = th * w * 9 * cl * 2
        acc = th * w * col * 4
        est = 4 * slab + cols + acc + 4 * th * w * (cl + col) * 2
        if est <= 10 * 1024 * 1024 or th == 1:
            return th
    return 1


def _shift_w(x, dw: int):
    """Shift (rows, W, C) by dw along W with zero fill (static
    slice+concat: ``tpu.dynamic_rotate`` does not lower for every lane
    width, e.g. the packed population's 120)."""
    if dw == 0:
        return x
    rows, w, c = x.shape
    z = jnp.zeros((rows, 1, c), x.dtype)
    if dw > 0:   # out[:, i] = x[:, i + dw]
        return jnp.concatenate([x[:, dw:], z], axis=1)
    return jnp.concatenate([z, x[:, :w + dw]], axis=1)


def _halo_slab(top_ref, mid_ref, bot_ref, mask_ref=None):
    """(1,1,W,C) + (1,th,W,C) + (1,1,W,C) blocks -> (th+2, W, C) slab.
    The halo index maps clamp at the image edges, so the fetched edge
    rows are in-image but must be zeroed.  ``mask_ref`` (same block
    shapes, e.g. the saved ReLU output) multiplies in the activation
    mask while the slab is built."""
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    top, mid, bot = top_ref[0], mid_ref[0], bot_ref[0]
    if mask_ref is not None:
        mt, mm, mb = mask_ref
        zero = jnp.zeros((), top.dtype)
        # compare in f32: Mosaic on this target rejects bf16 cmpf, and the
        # upcast is exact for bf16
        f32 = jnp.float32
        top = jnp.where(mt[0].astype(f32) > 0, top, zero)
        mid = jnp.where(mm[0].astype(f32) > 0, mid, zero)
        bot = jnp.where(mb[0].astype(f32) > 0, bot, zero)
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = jnp.where(i == last, jnp.zeros_like(bot), bot)
    return jnp.concatenate([top, mid, bot], axis=0)


def _im2col(slab, rows: int):
    """(th+2, W, C) slab -> (th*W, 9C) im2col operand via three width
    shifts; tap order dh-major then dw, matching ``_w_mat``."""
    wd, c = slab.shape[1], slab.shape[2]
    shifted = {dw: _shift_w(slab, dw) for dw in (-1, 0, 1)}
    parts = [shifted[dw][dh:dh + rows].reshape(rows * wd, c)
             for dh in (0, 1, 2) for dw in (-1, 0, 1)]
    return jnp.concatenate(parts, axis=1)


def _w_mat(w):
    """(3,3,Cin,Cout) -> (9*Cin,Cout), tap order matching ``_im2col``."""
    return w.reshape(9 * w.shape[2], w.shape[3])


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(top_ref, mid_ref, bot_ref, w_ref, b_ref, out_ref):
    slab = _halo_slab(top_ref, mid_ref, bot_ref)
    rows = mid_ref.shape[1]
    wd, cout = slab.shape[1], w_ref.shape[1]
    acc_dt = jnp.promote_types(slab.dtype, jnp.float32)
    cols = _im2col(slab, rows)
    y = jnp.dot(cols, w_ref[...], preferred_element_type=acc_dt)
    y = jnp.maximum(y + b_ref[0].astype(acc_dt), 0.0)
    out_ref[0] = y.reshape(rows, wd, cout).astype(out_ref.dtype)


def _dgrad_kernel(gt_ref, gm_ref, gb_ref, yt_ref, ym_ref, yb_ref,
                  wf_ref, out_ref):
    """dx tile: fused-conv of gz = g * (y > 0) with the flipped,
    io-transposed weight (no bias, no act)."""
    slab = _halo_slab(gt_ref, gm_ref, gb_ref,
                      mask_ref=(yt_ref, ym_ref, yb_ref))
    rows = gm_ref.shape[1]
    wd, cin = slab.shape[1], wf_ref.shape[1]
    acc_dt = jnp.promote_types(slab.dtype, jnp.float32)
    cols = _im2col(slab, rows)
    dx = jnp.dot(cols, wf_ref[...], preferred_element_type=acc_dt)
    out_ref[0] = dx.reshape(rows, wd, cin).astype(out_ref.dtype)


def _wgrad_kernel(top_ref, mid_ref, bot_ref, g_ref, y_ref,
                  dw_ref, db_ref):
    """dw (9*Cin, Cout) and db (1, Cout) f32, accumulated across the
    sequential grid; gz computed in-kernel from the saved output."""
    slab = _halo_slab(top_ref, mid_ref, bot_ref)
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = mid_ref.shape[1]
    wd = slab.shape[1]
    cout = g_ref.shape[3]
    acc_dt = jnp.float32
    gz = jnp.where(y_ref[0].astype(jnp.float32) > 0, g_ref[0],
                   jnp.zeros((), g_ref.dtype))
    gz2d = gz.reshape(rows * wd, cout)
    cols = _im2col(slab, rows)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += jax.lax.dot_general(
        cols, gz2d, (((0,), (0,)), ((), ())),
        preferred_element_type=acc_dt)
    db_ref[...] += jnp.sum(gz2d, axis=0, keepdims=True).astype(acc_dt)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _x_specs(th: int, h: int, wd: int, c: int):
    """Center + clamped 1-row halo BlockSpecs (block-index units; the
    1-row halo blocks address rows directly)."""
    top = pl.BlockSpec((1, 1, wd, c),
                       lambda b, i: (b, jnp.maximum(i * th - 1, 0), 0, 0),
                       memory_space=pltpu.VMEM)
    mid = pl.BlockSpec((1, th, wd, c), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, 1, wd, c),
                       lambda b, i: (b, jnp.minimum(i * th + th, h - 1),
                                     0, 0),
                       memory_space=pltpu.VMEM)
    return top, mid, bot


def _mid_spec(th: int, wd: int, c: int):
    return pl.BlockSpec((1, th, wd, c), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, i: (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("th",))
def _fwd_call(x, wmat, b2d, th: int):
    bsz, h, wd, cin = x.shape
    cout = wmat.shape[1]
    top, mid, bot = _x_specs(th, h, wd, cin)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, h // th),
        in_specs=[top, mid, bot,
                  _const_spec((9 * cin, cout)), _const_spec((1, cout))],
        out_specs=_mid_spec(th, wd, cout),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        interpret=_interpret(),
    )(x, x, x, wmat, b2d)


@functools.partial(jax.jit, static_argnames=("th",))
def _dgrad_call(g, y, wfmat, th: int):
    bsz, h, wd, cout = g.shape
    cin = wfmat.shape[1]
    topg, midg, botg = _x_specs(th, h, wd, cout)
    topy, midy, boty = _x_specs(th, h, wd, cout)
    return pl.pallas_call(
        _dgrad_kernel,
        grid=(bsz, h // th),
        in_specs=[topg, midg, botg, topy, midy, boty,
                  _const_spec((9 * cout, cin))],
        out_specs=_mid_spec(th, wd, cin),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cin), g.dtype),
        interpret=_interpret(),
    )(g, g, g, y, y, y, wfmat)


@functools.partial(jax.jit, static_argnames=("th",))
def _wgrad_call(x, g, y, th: int):
    bsz, h, wd, cin = x.shape
    cout = g.shape[-1]
    top, mid, bot = _x_specs(th, h, wd, cin)
    dw, db = pl.pallas_call(
        _wgrad_kernel,
        grid=(bsz, h // th),
        in_specs=[top, mid, bot,
                  _mid_spec(th, wd, cout), _mid_spec(th, wd, cout)],
        out_specs=(_const_spec((9 * cin, cout)), _const_spec((1, cout))),
        out_shape=(jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
                   jax.ShapeDtypeStruct((1, cout), jnp.float32)),
        interpret=_interpret(),
    )(x, x, x, g, y)
    return dw.reshape(3, 3, cin, cout), db[0]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _check(x, w, b):
    if (x.ndim != 4 or w.ndim != 4 or w.shape[:2] != (3, 3)
            or b.shape != (w.shape[3],)):
        raise ValueError(
            f"conv3x3_bias_relu expects NHWC x, (3,3,Ci,Co) w, (Co,) b; "
            f"got {x.shape} / {w.shape} / {b.shape}")


@jax.custom_vjp
def conv3x3_bias_relu(x, w, b):
    """relu(conv2d_same_3x3(x, w) + b), all three stages in one Pallas
    kernel; backward is two fused kernels (dgrad, wgrad+dbias) that
    apply the ReLU mask in-VMEM.  Matches
    ``relu(lax.conv_general_dilated(x, w, (1,1), 'SAME') + b)`` (NHWC,
    HWIO) up to f32 accumulation order; output dtype follows x."""
    _check(x, w, b)
    th = _pick_th(x.shape[1], x.shape[2], x.shape[3], w.shape[3])
    wmat = _w_mat(w.astype(x.dtype))
    b2d = b.reshape(1, -1).astype(jnp.float32)
    return _fwd_call(x, wmat, b2d, th)


def _fwd_rule(x, w, b):
    y = conv3x3_bias_relu(x, w, b)
    return y, (x, w, b, y)


def _bwd_rule(res, g):
    x, w, b, y = res
    cin, cout = w.shape[2], w.shape[3]
    th = _pick_th(x.shape[1], x.shape[2], max(cin, cout), max(cin, cout))
    g = g.astype(y.dtype)
    # dgrad: fused conv of g*(y>0) with the spatially flipped,
    # io-transposed kernel (textbook transpose-conv identity)
    wf = _w_mat(jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).astype(g.dtype))
    dx = _dgrad_call(g, y, wf, th).astype(x.dtype)
    dw, db = _wgrad_call(x, g, y, th)
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


conv3x3_bias_relu.defvjp(_fwd_rule, _bwd_rule)
