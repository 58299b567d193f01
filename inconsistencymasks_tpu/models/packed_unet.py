"""Packed-population U-Net: P candidate models evaluated as ONE network
over a channel-packed layout — inference AND training.

Motivation (ROADMAP.md #1, measured on v5e): XLA pads the channel (lane)
dimension of every tensor to 128, so a full-resolution op on an
alpha<=0.5 U-Net level (8..64 channels) costs the same HBM traffic and MXU
time as a 128-channel op — up to 16x waste, paid per candidate by both the
vmapped and the unrolled per-model forms.  Packing models' channels
contiguously — activations (B, H, W, P*C), weights block-diagonal — fills
the lanes.

GROUP packing: a block-diagonal conv over g models does g x the useful
FLOPs (the off-diagonal blocks are zeros), while lane padding wastes
128/(g*C); the break-even group is therefore ``g = target_width // C``
(target 128).  Each conv partitions the P candidates into consecutive
groups of that size, so every level runs at ~full lanes with FLOP waste no
worse than the padding it replaces: at alpha 0.5 the 8-channel level packs
16 models per MXU pass, the 128-channel level falls back to per-model
convs — all on ONE packed activation layout (channel-sliced per group,
group boundaries lane-tile-aligned when C divides 128).

Training support: the block-diagonal construction is a gather/scatter, so
autodiff flows through it — the gradient of a packed conv w.r.t. the
stacked kernel is the diagonal-block slice of the dense packed-kernel
gradient.  BatchNorm batch statistics on the packed layout are per packed
channel, i.e. per (model, channel) — identical to per-model BN — computed
in float32 exactly like ``flax.linen.BatchNorm`` (mean / E[x^2] with
optional cross-device pmean over a data axis, biased variance, running
averages with momentum 0.99).  Numerical equivalence with the unrolled
per-model forward/backward is asserted in tests/test_packed_unet.py and
tests/test_packed_train.py.

Replaces the reference's serialized candidate loop
(reference ISIC_2018/03_ISIC_2018_subset.py:43-104) at the kernel level;
model semantics follow reference unet.py:4-63.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from .unet import BN_EPSILON, BN_MOMENTUM, resolve_activation


def _group_sizes(p: int, width: int, target: int) -> List[int]:
    """Partition p models into consecutive groups of at most
    ``max(1, target // width)`` models."""
    g = max(1, min(p, target // max(width, 1)))
    sizes = []
    left = p
    while left > 0:
        take = min(g, left)
        sizes.append(take)
        left -= take
    return sizes


def _block_diag_kernel(stacked_kernel: jnp.ndarray) -> jnp.ndarray:
    """(g, kh, kw, Cin, Cout) -> (kh, kw, g*Cin, g*Cout) block-diagonal."""
    g, kh, kw, cin, cout = stacked_kernel.shape
    if g == 1:
        return stacked_kernel[0]
    out = jnp.zeros((kh, kw, g * cin, g * cout), stacked_kernel.dtype)
    for i in range(g):
        out = out.at[:, :, i * cin:(i + 1) * cin,
                     i * cout:(i + 1) * cout].set(stacked_kernel[i])
    return out


# ---------------------------------------------------------------------------
# Pluggable stride-1 SAME conv implementations (layout-tax experiments,
# ROADMAP.md round-3 #1).  The profiled pop-15 train step loses ~75 ms to
# layout-transpose copies XLA inserts around the conv backward ops (conv
# wgrad/dgrad instructions demand operand layouts the forward program does
# not produce).  ``dot_general`` has no such instruction-level layout
# contract on TPU — matmul operands are tile-relayout'd in VREGs — so
# re-expressing convs (or just their backward) as dots can kill the copies:
#
#   IM_CONV_IMPL=conv        lax.conv_general_dilated.  DEFAULT since the
#                            round-5 sweep: conv + the packed f32 head
#                            (IM_PACKED_HEAD=1, below) measures 135.5
#                            ms/step at pop 15 / 256^2 / b32 on v5e-1 —
#                            at the ~130 ms speed-of-light estimate for
#                            this layout (ROADMAP) — vs dot1x1's 182.3
#                            and dot1x1+packedhead's 161.7: with the
#                            head's P slice+conv pairs gone, the plain
#                            conv backward relayouts BEAT the dot
#                            re-expression, so dot1x1 (round-3's default,
#                            182.3 vs conv-alone 208.4) is now only the
#                            fallback for packed-head-off runs.
#   IM_CONV_IMPL=dot1x1      1x1 convs as dot_general (traffic-neutral:
#                            a 1x1 conv IS a matmul; autodiff then derives
#                            dot-based dgrad/wgrad for half the network).
#                            Round-3 sweep: 182.3 ms/step vs conv's 208.4
#                            — every other round-3 variant was worse
#                            (wgraddot 239.0, dot1x1+wgraddot 210.8,
#                            convdotbwd 313.4, dot 343.6, pool_slice
#                            230.2, dot1x1+pool_slice 209.8).
#   IM_CONV_IMPL=dot         every conv as sum of kh*kw shifted dots
#                            (kxk pays kh*kw x operand re-reads)
#   IM_CONV_IMPL=convdotbwd  conv forward, custom-vjp dot dgrad+wgrad
#   IM_CONV_IMPL=groupconv   XLA native grouped conv over ALL P models
#                            (feature_group_count=P): zero off-diagonal
#                            FLOP waste, but each group's 8-channel
#                            contraction pads to the MXU tile.  Round-1
#                            measured the grouped lowering 2.4x slower
#                            than unroll; ROADMAP #2 says re-test on
#                            newer XLA — this knob is that re-test.
#   IM_CONV_WGRAD_DOT=1      composable: conv forward+dgrad, dot wgrad
# ---------------------------------------------------------------------------

_CONV_IMPL = os.environ.get("IM_CONV_IMPL", "conv")
_WGRAD_DOT = os.environ.get("IM_CONV_WGRAD_DOT", "0") == "1"


def _same_pads(k: int):
    """XLA SAME padding at stride 1: total k-1, split lo=(k-1)//2."""
    lo = (k - 1) // 2
    return lo, k - 1 - lo


def _conv_plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_dots(x, w):
    """Stride-1 SAME conv as a sum of kh*kw channel-contracting dots."""
    bsz, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    if kh == 1 and kw == 1:
        y = jax.lax.dot_general(x, w[0, 0], (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    plo_h, phi_h = _same_pads(kh)
    plo_w, phi_w = _same_pads(kw)
    xp = jnp.pad(x, ((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)))
    acc = None
    for i in range(kh):
        for j in range(kw):
            xs = jax.lax.slice(xp, (0, i, j, 0),
                               (bsz, i + h, j + wd, cin))
            t = jax.lax.dot_general(xs, w[i, j], (((3,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


def _dgrad_dots(g, w):
    """dx for the stride-1 SAME conv, as shifted dots with w^T taps."""
    bsz, h, wd, cout = g.shape
    kh, kw, cin, _ = w.shape
    if kh == 1 and kw == 1:
        dx = jax.lax.dot_general(g, w[0, 0].T, (((3,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dx.astype(g.dtype)
    plo_h, phi_h = _same_pads(kh)
    plo_w, phi_w = _same_pads(kw)
    # dx[m] = sum_i dy[m - i + lo] w[i]^T: pad g by (hi, lo) per spatial
    # dim, tap offset (k-1-i) — the spatially flipped kernel, as in the
    # textbook transpose conv.
    gp = jnp.pad(g, ((0, 0), (phi_h, plo_h), (phi_w, plo_w), (0, 0)))
    acc = None
    for i in range(kh):
        for j in range(kw):
            gs = jax.lax.slice(gp, (0, kh - 1 - i, kw - 1 - j, 0),
                               (bsz, kh - 1 - i + h, kw - 1 - j + wd, cout))
            t = jax.lax.dot_general(gs, w[i, j].T, (((3,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.astype(g.dtype)


def _wgrad_dots(x, g, kh, kw):
    """dw for the stride-1 SAME conv: per tap, a (Ci,Co) dot contracting
    (B,H,W).  Outputs are tiny so the f32 partials are free; the operands
    are read in their native layout (no conv-wgrad layout contract)."""
    bsz, h, wd, cin = x.shape
    plo_h, phi_h = _same_pads(kh)
    plo_w, phi_w = _same_pads(kw)
    if kh == 1 and kw == 1:
        dw = jax.lax.dot_general(x, g, (((0, 1, 2), (0, 1, 2)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dw[None, None]
    xp = jnp.pad(x, ((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0)))
    taps = []
    for i in range(kh):
        row = []
        for j in range(kw):
            xs = jax.lax.slice(xp, (0, i, j, 0),
                               (bsz, i + h, j + wd, cin))
            row.append(jax.lax.dot_general(
                xs, g, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32))
        taps.append(jnp.stack(row))
    return jnp.stack(taps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_custom(x, w, mode):
    return _conv_plain(x, w)


def _conv_custom_fwd(x, w, mode):
    return _conv_plain(x, w), (x, w)


def _conv_custom_bwd(mode, res, g):
    x, w = res
    kh, kw = w.shape[0], w.shape[1]
    if mode == "convdotbwd":
        dx = _dgrad_dots(g, w)
    else:  # wgrad-only: reuse XLA's native conv dgrad
        dx = jax.vjp(lambda xx: _conv_plain(xx, w), x)[1](g)[0]
    dw = _wgrad_dots(x, g, kh, kw).astype(w.dtype)
    return dx, dw


_conv_custom.defvjp(_conv_custom_fwd, _conv_custom_bwd)


def _conv2d_same(x, w):
    """Dispatch a stride-1 SAME NHWC conv to the configured impl."""
    kh, kw = w.shape[0], w.shape[1]
    impl = _CONV_IMPL
    if impl == "pallasfused":
        # non-fusable convs under pallasfused take the dot1x1 route
        # (the fused 3x3+bias+relu dispatch lives in _conv_grouped)
        impl = "dot1x1"
    if impl in ("dot", "pallas") or (impl == "dot1x1"
                                     and kh == 1 and kw == 1):
        if impl == "pallas" and kh == 3 and kw == 3:
            # Pallas matmul conv with custom dgrad/wgrad kernels — the
            # no-layout-contract path (ops/pallas/conv3x3.py); 1x1s take
            # the dot1x1 route below, other kxk fall back to XLA conv
            from ..ops.pallas.conv3x3 import conv3x3_same
            return conv3x3_same(x, w)
        if impl == "pallas" and not (kh == 1 and kw == 1):
            return _conv_plain(x, w)
        return _conv_dots(x, w)
    if impl == "convdotbwd":
        return _conv_custom(x, w, "convdotbwd")
    if _WGRAD_DOT:
        return _conv_custom(x, w, "wgraddot")
    return _conv_plain(x, w)


def _conv_grouped(x: jnp.ndarray, conv_p, act, dt, target: int,
                  act_name: Optional[str] = None) -> jnp.ndarray:
    """x (B,H,W,P*Cin) packed; conv_p['kernel'] (P,kh,kw,Cin,Cout).
    Runs the P models' convs as group-packed block-diagonal convs and
    returns the packed (B,H,W,P*Cout) activations."""
    kernel = conv_p["kernel"]
    bias = conv_p["bias"]
    p, kh, kw, cin, cout = kernel.shape
    if _CONV_IMPL == "groupconv" and p > 1:
        # One native grouped conv over all P models: rhs (kh,kw,Cin,P*Cout)
        # group-major on the output channels, so output block i == model i
        # — the same packed layout the block-diagonal form produces, with
        # no off-diagonal zero FLOPs.
        w = jnp.moveaxis(kernel.astype(dt), 0, 3).reshape(
            kh, kw, cin, p * cout)
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=p)
        return act(y + bias.reshape(-1).astype(dt))
    fused = (_CONV_IMPL == "pallasfused" and kh == 3 and kw == 3
             and act_name == "relu")
    sizes = _group_sizes(p, max(cin, cout), target)
    outs = []
    m = 0
    for g in sizes:
        w = _block_diag_kernel(kernel[m:m + g].astype(dt))
        b = bias[m:m + g].reshape(-1).astype(dt)
        xg = x[..., m * cin:(m + g) * cin]
        if fused:
            # conv+bias+relu in one Pallas kernel, fused custom backward
            # (ops/pallas/fused_block.py)
            from ..ops.pallas.fused_block import conv3x3_bias_relu
            outs.append(conv3x3_bias_relu(xg, w, b))
        else:
            y = _conv2d_same(xg, w)
            outs.append(act(y + b))
        m += g
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


_BN_BF16 = os.environ.get("IM_BN_BF16", "0") == "1"
# Block-diagonal f32 head dot instead of P slice+conv pairs (same math —
# off-diagonal blocks contribute exact f32 zeros; see the head below).
# DEFAULT since the round-5 sweep: conv+packedhead = 135.5 ms/step vs 182.3
# for round-3's dot1x1 default (the per-model head slices at 8-channel
# offsets are never lane-tile-aligned, so each cost a relayout copy
# forward AND backward).
_PACKED_HEAD = os.environ.get("IM_PACKED_HEAD", "1") == "1"
_DENSE_INPUT = os.environ.get("IM_PACKED_INPUT_DENSE", "0") == "1"
_POOL_EQMASK = os.environ.get("IM_POOL_EQMASK", "0") == "1"
_POOL_RESHAPE = os.environ.get("IM_POOL_RESHAPE", "0") == "1"
_POOL_SLICE = os.environ.get("IM_POOL_SLICE", "0") == "1"


def _maxpool2_slice(x):
    """2x2/2 max-pool as four strided slices + elementwise max: no
    reduce_window (forward) and no select_and_scatter (backward — max's
    VJP is a select; the slice transposes are interior pads).  Both
    directions stay in the conv ops' C-minor layout family."""
    a = jnp.maximum(x[:, ::2, ::2], x[:, 1::2, ::2])
    b = jnp.maximum(x[:, ::2, 1::2], x[:, 1::2, 1::2])
    return jnp.maximum(a, b)


def _maxpool2_reshape(x):
    """2x2/2 max-pool as reshape + max-reduce: no reduce_window (whose
    spatial-minor layout preference forces transpose copies around every
    pool boundary) and a select_and_scatter-free backward (jnp.max's VJP
    is an equality-masked where)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def _rw_max(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@jax.custom_vjp
def _maxpool2_eqmask(x):
    """2x2/2 max-pool whose backward avoids select_and_scatter (slow on
    TPU and a spatial-minor-layout magnet): gradient is routed to window
    maxima by equality mask, tie-normalized so the gradient sum is
    conserved (select_and_scatter credits exactly one maximum; on the rare
    exact-tie this splits instead — an equally valid subgradient)."""
    return _rw_max(x)


def _maxpool2_eqmask_fwd(x):
    y = _rw_max(x)
    return y, (x, y)


def _maxpool2_eqmask_bwd(res, g):
    x, y = res
    up = lambda v: jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    eq = (x == up(y)).astype(g.dtype)
    cnt = jax.lax.reduce_window(eq, jnp.zeros((), g.dtype), jax.lax.add,
                                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return (eq * up(g / jnp.maximum(cnt, 1)),)


_maxpool2_eqmask.defvjp(_maxpool2_eqmask_fwd, _maxpool2_eqmask_bwd)


def _bn_flat(x, scale, bias, mean, var, dt):
    """flax-equivalent normalization: float32 math, cast to dt at the end.

    x (..., C) any compute dtype; scale/bias/mean/var (C,) float32.
    IM_BN_BF16=1: do the big-tensor arithmetic in the compute dtype
    (per-channel mul/bias still prepared in f32) — experimental knob for
    layout/bandwidth measurements."""
    mul = jax.lax.rsqrt(var + BN_EPSILON) * scale
    if _BN_BF16 and dt != jnp.float32:
        return (x.astype(dt) - mean.astype(dt)) * mul.astype(dt) \
            + bias.astype(dt)
    xf = x.astype(jnp.float32)
    return ((xf - mean) * mul + bias).astype(dt)


def _batch_stats_flat(x, bn_sync_axis: Optional[str]):
    """flax _compute_stats equivalent: float32 mean / E[x^2] over (B,H,W),
    optionally pmean'd over a sharded-batch mesh axis; biased variance."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    mean2 = jnp.mean(xf * xf, axis=(0, 1, 2))
    if bn_sync_axis is not None:
        mean, mean2 = jax.lax.pmean((mean, mean2), bn_sync_axis)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    return mean, var


class _Seq:
    """Walks Conv_i / BatchNorm_i in call order (flax creation order)."""

    def __init__(self, params: Dict, batch_stats: Dict):
        self.params = params
        self.batch_stats = batch_stats
        self.ci = 0
        self.bi = 0

    def conv(self):
        p = self.params[f"Conv_{self.ci}"]
        self.ci += 1
        return p

    def bn(self):
        name = f"BatchNorm_{self.bi}"
        self.bi += 1
        return name, (self.params[name]["scale"],
                      self.params[name]["bias"],
                      self.batch_stats[name]["mean"],
                      self.batch_stats[name]["var"])


def packed_unet_apply(stacked_variables: Any, images: jnp.ndarray, *,
                      train: bool,
                      num_classes: int, activation: str = "relu",
                      out_activation: str = "sigmoid",
                      max_packed_width: int = 128,
                      compute_dtype: Any = jnp.bfloat16,
                      bn_sync_axis: Optional[str] = None):
    """Forward of P stacked U-Nets over a channel-packed layout.

    stacked_variables: the pytree from ``init_population`` (leading P
    axis).  images: either (B, H, W, C) uint8 — ONE batch shared by all
    candidates (the supervised-stage semantics: the reference feeds every
    candidate the same seeded stream, functions.py:208) — or (P, B, H, W,
    C) — a PER-CANDIDATE batch, fusing cells that train on different data
    into one program.

    Returns ``probs`` (P, B, H, W, num_classes) float32 when ``train`` is
    False, else ``(probs, new_batch_stats)`` where ``new_batch_stats``
    mirrors the stacked flax ``batch_stats`` collection (running averages
    advanced one step with momentum 0.99, Keras default — reference
    unet.py BatchNormalization).
    """
    act = resolve_activation(activation)
    out_act = resolve_activation(out_activation)
    dt = compute_dtype
    target = max_packed_width
    params = stacked_variables["params"]
    stats = stacked_variables["batch_stats"]
    p = params["out"]["kernel"].shape[0]
    seq = _Seq(params, stats)
    new_stats: Dict[str, Dict[str, jnp.ndarray]] = {}

    def bn(x):
        name, (scale, bias, ra_mean, ra_var) = seq.bn()
        s_flat = scale.reshape(-1)
        b_flat = bias.reshape(-1)
        if not train:
            return _bn_flat(x, s_flat, b_flat, ra_mean.reshape(-1),
                            ra_var.reshape(-1), dt)
        m_flat, v_flat = _batch_stats_flat(x, bn_sync_axis)
        out = _bn_flat(x, s_flat, b_flat, m_flat, v_flat, dt)
        # running averages advance exactly like flax.linen.BatchNorm
        new_stats[name] = {
            "mean": (BN_MOMENTUM * ra_mean
                     + (1 - BN_MOMENTUM) * m_flat.reshape(ra_mean.shape)),
            "var": (BN_MOMENTUM * ra_var
                    + (1 - BN_MOMENTUM) * v_flat.reshape(ra_var.shape)),
        }
        return out

    def pool(x):
        if _POOL_SLICE:
            return _maxpool2_slice(x)
        if _POOL_RESHAPE:
            return _maxpool2_reshape(x)
        # scalar -inf init (any dtype): keeps the reduce_window on the
        # max-monoid autodiff path (flax nn.max_pool does the same)
        if _POOL_EQMASK and train:
            return _maxpool2_eqmask(x)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def upsample_add(x, skip):
        x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(x, 2, axis=2)
        return x + skip

    # ---- input block: per-model images pack on channels; a shared batch
    # is tiled P times (tiled input + block-diag == per-model conv)
    if (images.ndim == 4 and _DENSE_INPUT
            and params["Conv_0"]["kernel"].shape[1:3] == (1, 1)):
        # Layout experiment (IM_PACKED_INPUT_DENSE=1): every model sees the
        # SAME image, so conv(tile(x), blockdiag(w)) == conv(x, concat(w))
        # — one dense (Cin -> P*Cout) 1x1 dot on the raw Cin-channel batch
        # instead of materializing the P-tiled f32 input (pop 15 at 256^2:
        # a 377 MB HBM write per step).  Off-diagonal blocks of the
        # block-diagonal form multiply exact copies of x by exact zeros, so
        # the dense form is the same contraction over Cin.
        conv_p = seq.conv()
        kern = conv_p["kernel"]          # (P, 1, 1, Cin, Cout)
        wd = jnp.concatenate([kern[i, 0, 0] for i in range(p)], axis=-1)
        x = (images.astype(jnp.float32) / 255.0).astype(dt)
        y = jax.lax.dot_general(x, wd.astype(dt), (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y.astype(dt) + conv_p["bias"].reshape(-1).astype(dt)
        state = bn(act(y))
    else:
        if images.ndim == 5:
            x0 = jnp.concatenate([images[i] for i in range(p)], axis=-1)
        else:
            x0 = jnp.tile(images, (1, 1, 1, p))
        x0 = x0.astype(jnp.float32) / 255.0
        x = x0.astype(dt)

        x = _conv_grouped(x, seq.conv(), act, dt, target, activation)
        state = bn(x)

    skips = []
    for _ in range(4):                       # encoder blocks
        state = _conv_grouped(state, seq.conv(), act, dt, target, activation)
        state = _conv_grouped(state, seq.conv(), act, dt, target, activation)
        state = bn(state)
        skips.append(state)
        state = pool(state)

    state = _conv_grouped(state, seq.conv(), act, dt, target, activation)  # bottleneck
    state = _conv_grouped(state, seq.conv(), act, dt, target, activation)
    state = bn(state)

    for skip in reversed(skips):             # decoder blocks
        state = upsample_add(state, skip)
        state = _conv_grouped(state, seq.conv(), act, dt, target, activation)
        state = bn(state)
        state = _conv_grouped(state, seq.conv(), act, dt, target, activation)
        state = _conv_grouped(state, seq.conv(), act, dt, target, activation)
        state = bn(state)

    # ---- output head (f32), per-model
    out_p = params["out"]
    c = out_p["kernel"].shape[-2]
    if _PACKED_HEAD:
        # One block-diagonal f32 1x1 dot instead of P slice+conv pairs:
        # the per-model loop slices the packed state at 8-channel offsets
        # (never lane-tile-aligned for i*C % 128 != 0 -> a relayout copy
        # per model, forward AND backward).  Same math — the off-diagonal
        # blocks contribute exact f32 zeros.  The class axis is restored
        # BEFORE out_act so softmax normalizes per model, not across the
        # packed axis.  Flag-gated layout experiment (ROADMAP round-3 #1).
        ncls = out_p["kernel"].shape[-1]
        wbd = _block_diag_kernel(
            out_p["kernel"].astype(jnp.float32))[0, 0]     # (P*C, P*ncls)
        b = out_p["bias"].astype(jnp.float32).reshape(-1)
        y = jax.lax.dot_general(
            state.astype(jnp.float32), wbd, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b
        bsz, hh, ww, _ = y.shape
        y = y.reshape(bsz, hh, ww, p, ncls)
        probs = out_act(jnp.moveaxis(y, 3, 0))
    else:
        outs = []
        for i in range(p):
            w = out_p["kernel"][i].astype(jnp.float32)
            b = out_p["bias"][i].astype(jnp.float32)
            y = jax.lax.conv_general_dilated(
                state[..., i * c:(i + 1) * c].astype(jnp.float32), w, (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            outs.append(out_act(y))
        probs = jnp.stack(outs)

    if train:
        return probs, new_stats
    return probs


@functools.partial(jax.jit, static_argnames=("num_classes", "activation",
                                             "out_activation",
                                             "max_packed_width",
                                             "compute_dtype"))
def packed_unet_forward(stacked_variables: Any, images: jnp.ndarray, *,
                        num_classes: int, activation: str = "relu",
                        out_activation: str = "sigmoid",
                        max_packed_width: int = 128,
                        compute_dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """Jitted inference wrapper: (P,B,H,W,num_classes) float32 probs."""
    return packed_unet_apply(
        stacked_variables, images, train=False, num_classes=num_classes,
        activation=activation, out_activation=out_activation,
        max_packed_width=max_packed_width, compute_dtype=compute_dtype)
