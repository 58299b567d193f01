"""Pallas stride-1 SAME 3x3 conv with custom dgrad/wgrad kernels.

The round-3 layout-tax attack, step 2 (ROADMAP.md).  XLA's conv
instruction carries an instruction-level layout contract on TPU, and the
packed population train step pays ~124 layout-transpose copies/step
flip-flopping between the conv-preferred and elementwise-preferred
layouts (trace analysis in ROADMAP.md).  Re-expressing the 1x1 convs as
``dot_general`` (IM_CONV_IMPL=dot1x1) already bought 208.4 -> 182.3
ms/step; this module re-expresses the remaining kxk convs as Pallas
matmul kernels with NO layout contract at all:

- forward: grid (batch, H-tiles).  The row tile arrives as THREE
  auto-pipelined VMEM blocks — the (th, W, Cin) center plus two 1-row
  halo blocks whose index maps clamp at the image edges (masked to zero
  in-kernel) — so x is read from HBM only ~(th+2)/th times and nothing
  is ever DMA'd manually (Mosaic forbids lane-dim slices that are not
  multiples of 128, which rules out halo DMA at the packed population's
  native 120-lane width).  The 9 taps accumulate as (th*W, Cin) x
  (Cin, Cout) MXU matmuls in an f32 accumulator; W-shifts are VMEM
  sublane rolls (``pltpu.roll``) with edge masks.
- dgrad: the SAME forward kernel applied to dy with the spatially
  flipped, in/out-transposed kernel (the textbook transpose-conv
  identity, as models/packed_unet.py:_dgrad_dots).
- wgrad: a second kernel with the same halo blocks contracting
  (Cin, th*W) x (th*W, Cout) per tap into a (9, Cin, Cout) f32
  accumulator block that every grid step revisits (TPU grids are
  sequential).

Replaces the serialized per-model Keras training loop of the reference
(MichaelVorndran/InconsistencyMasks ISIC_2018/03_ISIC_2018_subset.py:43-104)
at the instruction level; wired in behind IM_CONV_IMPL=pallas via
models/packed_unet.py:_conv2d_same.  Numerical parity with
``lax.conv_general_dilated`` is asserted by tests/test_pallas_conv.py
(forward AND both gradients, CPU interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h: int, w: int, c: int) -> int:
    """Largest row-tile in (16, 8, 4, 2, 1) that divides H and keeps the
    per-step VMEM footprint (row slab + f32 accumulator + double-buffered
    in/out blocks) comfortably inside the ~16 MB budget."""
    for th in (16, 8, 4, 2, 1):
        if h % th:
            continue
        est = (th + 2) * w * c * 2 + th * w * c * 4 + 4 * th * w * c * 2
        if est <= 8 * 1024 * 1024 or th == 1:
            return th
    return 1


def _shift_w(x, dw: int):
    """Shift a (rows, W, C) value by dw in W with zero fill: static
    slice + concat (``tpu.dynamic_rotate`` does not lower for every
    lane width, e.g. the packed population's 120)."""
    if dw == 0:
        return x
    rows, w, c = x.shape
    z = jnp.zeros((rows, 1, c), x.dtype)
    if dw > 0:   # out[:, i] = x[:, i + dw]
        return jnp.concatenate([x[:, dw:], z], axis=1)
    return jnp.concatenate([z, x[:, :w + dw]], axis=1)


def _build_slab(top_ref, mid_ref, bot_ref):
    """(1,1,W,C) + (1,th,W,C) + (1,1,W,C) blocks -> (th+2, W, C) slab
    with the halo rows zeroed at the true image edges (their index maps
    clamp there, so the fetched rows are in-image but must not
    contribute)."""
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    top = jnp.where(i == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
    bot = jnp.where(i == last, jnp.zeros_like(bot_ref[0]), bot_ref[0])
    return jnp.concatenate([top, mid_ref[0], bot], axis=0)


def _fwd_kernel(top_ref, mid_ref, bot_ref, w_ref, out_ref):
    slab = _build_slab(top_ref, mid_ref, bot_ref)
    rows = mid_ref.shape[1]
    wd, cin = slab.shape[1], slab.shape[2]
    cout = w_ref.shape[2]
    acc_dt = jnp.promote_types(slab.dtype, jnp.float32)
    acc = jnp.zeros((rows * wd, cout), acc_dt)
    for dh in (0, 1, 2):
        for dw in (-1, 0, 1):
            xs = _shift_w(slab[dh:dh + rows], dw).reshape(rows * wd, cin)
            acc = acc + jnp.dot(xs, w_ref[dh * 3 + (dw + 1)],
                                preferred_element_type=acc_dt)
    out_ref[0] = acc.reshape(rows, wd, cout).astype(out_ref.dtype)


def _wgrad_kernel(top_ref, mid_ref, bot_ref, g_ref, dw_ref):
    slab = _build_slab(top_ref, mid_ref, bot_ref)
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = mid_ref.shape[1]
    wd, cin = slab.shape[1], slab.shape[2]
    cout = g_ref.shape[3]
    acc_dt = jnp.promote_types(slab.dtype, jnp.float32)
    g2d = g_ref[...].reshape(rows * wd, cout)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for dh in (0, 1, 2):
        for dw in (-1, 0, 1):
            xs = _shift_w(slab[dh:dh + rows], dw).reshape(rows * wd, cin)
            t = jax.lax.dot_general(
                xs, g2d, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_dt)
            tap = dh * 3 + (dw + 1)
            dw_ref[tap] = dw_ref[tap] + t


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _x_specs(th: int, h: int, wd: int, cin: int):
    """Center + clamped 1-row halo BlockSpecs for the x operand.

    Index maps return BLOCK indices (units of the block shape), so the
    1-row halo blocks address rows directly: top = i*th - 1, bottom =
    i*th + th, clamped into the image (the kernel masks the halo to zero
    at the true edges)."""
    n = h // th
    top = pl.BlockSpec((1, 1, wd, cin),
                       lambda b, i: (b, jnp.maximum(i * th - 1, 0), 0, 0),
                       memory_space=pltpu.VMEM)
    mid = pl.BlockSpec((1, th, wd, cin), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, 1, wd, cin),
                       lambda b, i: (b, jnp.minimum(i * th + th, h - 1),
                                     0, 0),
                       memory_space=pltpu.VMEM)
    del n
    return top, mid, bot


@functools.partial(jax.jit, static_argnames=("th",))
def _conv3x3_fwd_call(x, w, th: int):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    # taps stacked leading: (9, Cin, Cout) so the kernel indexes one tap
    # as a clean (Cin, Cout) matmul operand
    w9 = w.reshape(9, cin, cout).astype(x.dtype)
    top, mid, bot = _x_specs(th, h, wd, cin)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, h // th),
        in_specs=[
            top, mid, bot,
            pl.BlockSpec((9, cin, cout), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        interpret=_interpret(),
    )(x, x, x, w9)


@functools.partial(jax.jit, static_argnames=("th",))
def _conv3x3_wgrad_call(x, g, th: int):
    bsz, h, wd, cin = x.shape
    cout = g.shape[-1]
    top, mid, bot = _x_specs(th, h, wd, cin)
    dw9 = pl.pallas_call(
        _wgrad_kernel,
        grid=(bsz, h // th),
        in_specs=[
            top, mid, bot,
            pl.BlockSpec((1, th, wd, cout), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cin, cout), lambda b, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (9, cin, cout), jnp.promote_types(x.dtype, jnp.float32)),
        interpret=_interpret(),
    )(x, x, x, g)
    return dw9.reshape(3, 3, cin, cout)


def _check_shapes(x, w):
    if x.ndim != 4 or w.ndim != 4 or w.shape[0] != 3 or w.shape[1] != 3:
        raise ValueError(f"conv3x3 expects NHWC x and (3,3,Ci,Co) w, got "
                         f"{x.shape} / {w.shape}")


@jax.custom_vjp
def conv3x3_same(x, w):
    """Stride-1 SAME NHWC 3x3 conv, Pallas fwd + Pallas dgrad/wgrad.

    Matches ``lax.conv_general_dilated(x, w, (1, 1), 'SAME')`` (NHWC,
    HWIO) with f32 accumulation; output dtype follows x."""
    _check_shapes(x, w)
    th = _pick_th(x.shape[1], x.shape[2], max(x.shape[3], w.shape[3]))
    return _conv3x3_fwd_call(x, w, th)


def _conv3x3_fwd_rule(x, w):
    return conv3x3_same(x, w), (x, w)


def _conv3x3_bwd_rule(res, g):
    x, w = res
    cin, cout = w.shape[2], w.shape[3]
    th = _pick_th(x.shape[1], x.shape[2], max(cin, cout))
    # dgrad: forward conv of dy with the spatially flipped, io-transposed
    # kernel (packed_unet._dgrad_dots derivation)
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv3x3_fwd_call(g.astype(x.dtype), w_flip, th)
    dw = _conv3x3_wgrad_call(x, g.astype(x.dtype), th)
    return dx, dw.astype(w.dtype)


conv3x3_same.defvjp(_conv3x3_fwd_rule, _conv3x3_bwd_rule)
