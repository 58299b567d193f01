"""Packed-population U-Net: P candidate models evaluated as ONE network
over a channel-packed layout — inference AND training.

Motivation (ROADMAP.md #1, measured on v5e): the alpha<=0.5 U-Net's
channels (8..128) badly under-fill the 128-lane MXU, and both vmapped and
unrolled per-model convs pay that padding P times.  Packing the P models'
channels contiguously — activations (B, H, W, P*C), weights block-diagonal
(kh, kw, P*Cin, P*Cout) — lets one MXU pass compute all P models:
1.4-2.5x faster for 1x1 convs and 1.2-1.4x for 3x3 convs at C<=16, but
SLOWER once P*C exceeds ~128-256.  This module therefore packs HYBRIDLY:
levels whose packed width P*C stays within ``max_packed_width`` run packed;
wider levels fall back to per-model unrolled convs (XLA fuses the
pack/unpack reshapes at the transitions).

Training support: the block-diagonal construction is a gather/scatter, so
autodiff flows through it — the gradient of a packed conv w.r.t. the
stacked kernel is the diagonal-block slice of the dense packed-kernel
gradient.  BatchNorm batch statistics on the packed layout are per packed
channel, i.e. per (model, channel) — identical to per-model BN — computed
in float32 exactly like ``flax.linen.BatchNorm`` (mean / E[x^2] with
optional cross-device pmean over a data axis, biased variance, running
averages with momentum 0.99).  Numerical equivalence with the unrolled
per-model forward/backward is asserted in tests/test_packed_unet.py.

Replaces the reference's serialized candidate loop
(reference ISIC_2018/03_ISIC_2018_subset.py:43-104) at the kernel level;
model semantics follow reference unet.py:4-63.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .unet import BN_EPSILON, BN_MOMENTUM, resolve_activation


def _block_diag_kernel(stacked_kernel: jnp.ndarray) -> jnp.ndarray:
    """(P, kh, kw, Cin, Cout) -> (kh, kw, P*Cin, P*Cout) block-diagonal."""
    p, kh, kw, cin, cout = stacked_kernel.shape
    out = jnp.zeros((kh, kw, p * cin, p * cout), stacked_kernel.dtype)
    for i in range(p):
        out = out.at[:, :, i * cin:(i + 1) * cin,
                     i * cout:(i + 1) * cout].set(stacked_kernel[i])
    return out


def _packed_conv(x, stacked_params, act, dt):
    """x (B,H,W,P*Cin); stacked_params['kernel'] (P,kh,kw,Cin,Cout)."""
    w = _block_diag_kernel(stacked_params["kernel"].astype(dt))
    b = stacked_params["bias"].reshape(-1).astype(dt)       # (P*Cout,)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return act(y + b)


def _unrolled_conv(xs, stacked_params, act, dt):
    """xs: list of P (B,H,W,Cin); per-model convs."""
    outs = []
    for i, x in enumerate(xs):
        w = stacked_params["kernel"][i].astype(dt)
        b = stacked_params["bias"][i].astype(dt)
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        outs.append(act(y + b))
    return outs


def _bn_flat(x, scale, bias, mean, var, dt):
    """flax-equivalent normalization: float32 math, cast to dt at the end.

    x (..., C) any compute dtype; scale/bias/mean/var (C,) float32."""
    xf = x.astype(jnp.float32)
    mul = jax.lax.rsqrt(var + BN_EPSILON) * scale
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
    """Forward of P stacked U-Nets on one shared image batch.

    stacked_variables: the pytree from ``init_population`` (leading P axis);
    images (B, H, W, C) uint8.

    Returns ``probs`` (P, B, H, W, num_classes) float32 when ``train`` is
    False, else ``(probs, new_batch_stats)`` where ``new_batch_stats``
    mirrors the stacked flax ``batch_stats`` collection (running averages
    advanced one step with momentum 0.99, Keras default — reference
    unet.py BatchNormalization).
    """
    act = resolve_activation(activation)
    out_act = resolve_activation(out_activation)
    dt = compute_dtype
    params = stacked_variables["params"]
    stats = stacked_variables["batch_stats"]
    p = params["out"]["kernel"].shape[0]
    seq = _Seq(params, stats)
    new_stats: Dict[str, Dict[str, jnp.ndarray]] = {}

    x0 = images.astype(jnp.float32) / 255.0
    x0 = x0.astype(dt)

    # state: either packed (B,H,W,P*C) array or list of P per-model arrays
    def width_of(conv_p):
        return conv_p["kernel"].shape[-1] * p

    def to_packed(state):
        if isinstance(state, list):
            return jnp.concatenate(state, axis=-1)
        return state

    def to_list(state, c):
        if isinstance(state, list):
            return state
        return [state[..., i * c:(i + 1) * c] for i in range(p)]

    def conv_act(state, conv_p):
        if width_of(conv_p) <= max_packed_width:
            return _packed_conv(to_packed(state), conv_p, act, dt)
        cin = conv_p["kernel"].shape[-2]
        return _unrolled_conv(to_list(state, cin), conv_p, act, dt)

    def bn(state):
        name, (scale, bias, ra_mean, ra_var) = seq.bn()
        # stacked stats are (P, C): flatten for the packed layout
        s_flat = scale.reshape(-1)
        b_flat = bias.reshape(-1)
        if not train:
            m_flat, v_flat = ra_mean.reshape(-1), ra_var.reshape(-1)
            if isinstance(state, list):
                c = state[0].shape[-1]
                return [_bn_flat(state[i], scale[i], bias[i], ra_mean[i],
                                 ra_var[i], dt) for i in range(p)]
            return _bn_flat(state, s_flat, b_flat, m_flat, v_flat, dt)

        if isinstance(state, list):
            ms, vs, outs = [], [], []
            for i in range(p):
                m, v = _batch_stats_flat(state[i], bn_sync_axis)
                outs.append(_bn_flat(state[i], scale[i], bias[i], m, v, dt))
                ms.append(m)
                vs.append(v)
            batch_mean = jnp.stack(ms)
            batch_var = jnp.stack(vs)
            out = outs
        else:
            m_flat, v_flat = _batch_stats_flat(state, bn_sync_axis)
            out = _bn_flat(state, s_flat, b_flat, m_flat, v_flat, dt)
            batch_mean = m_flat.reshape(ra_mean.shape)
            batch_var = v_flat.reshape(ra_var.shape)
        # running averages advance exactly like flax.linen.BatchNorm
        new_stats[name] = {
            "mean": BN_MOMENTUM * ra_mean + (1 - BN_MOMENTUM) * batch_mean,
            "var": BN_MOMENTUM * ra_var + (1 - BN_MOMENTUM) * batch_var,
        }
        return out

    def pool(state):
        # scalar -inf init (any dtype): keeps the reduce_window on the
        # max-monoid autodiff path (flax nn.max_pool does the same)
        f = lambda v: jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        if isinstance(state, list):
            return [f(v) for v in state]
        return f(state)

    def upsample_add(state, skip):
        def up(v):
            v = jnp.repeat(v, 2, axis=1)
            return jnp.repeat(v, 2, axis=2)
        if isinstance(state, list) or isinstance(skip, list):
            if not isinstance(state, list):
                # packed -> list using skip's channel count
                state = to_list(state, skip[0].shape[-1])
            if not isinstance(skip, list):
                skip = to_list(skip, state[0].shape[-1])
            return [up(a) + b for a, b in zip(state, skip)]
        return up(state) + skip

    # ---- input block (shared input tiled across models)
    conv0 = seq.conv()
    x = [x0] * p if width_of(conv0) > max_packed_width else jnp.tile(
        x0, (1, 1, 1, p))
    # note: tiled input + block-diag over (P*Cimg) == per-model conv on x0
    x = conv_act(x, conv0)
    c0 = bn(x)

    skips = []
    state = c0
    for _ in range(4):                       # encoder blocks
        state = conv_act(state, seq.conv())
        state = conv_act(state, seq.conv())
        state = bn(state)
        skips.append(state)
        state = pool(state)

    state = conv_act(state, seq.conv())      # bottleneck
    state = conv_act(state, seq.conv())
    state = bn(state)

    for skip in reversed(skips):             # decoder blocks
        state = upsample_add(state, skip)
        state = conv_act(state, seq.conv())
        state = bn(state)
        state = conv_act(state, seq.conv())
        state = conv_act(state, seq.conv())
        state = bn(state)

    # ---- output head (f32), per-model
    out_p = params["out"]
    if isinstance(state, list):
        xs = state
    else:
        c = out_p["kernel"].shape[-2]
        xs = [state[..., i * c:(i + 1) * c] for i in range(p)]
    outs = []
    for i in range(p):
        w = out_p["kernel"][i].astype(jnp.float32)
        b = out_p["bias"][i].astype(jnp.float32)
        y = jax.lax.conv_general_dilated(
            xs[i].astype(jnp.float32), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
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
