"""Packed-population U-Net forward: P candidate models evaluated as ONE
network over a channel-packed layout.

Motivation (ROADMAP.md #1, measured on v5e): the alpha<=0.5 U-Net's
channels (8..128) badly under-fill the 128-lane MXU, and both vmapped and
unrolled per-model convs pay that padding P times.  Packing the P models'
channels contiguously — activations (B, H, W, P*C), weights block-diagonal
(kh, kw, P*Cin, P*Cout) — lets one MXU pass compute all P models:
1.4-2.5x faster for 1x1 convs and 1.2-1.4x for 3x3 convs at C<=16, but
SLOWER once P*C exceeds ~128.  This module therefore packs HYBRIDLY: levels
whose packed width P*C stays within ``max_packed_width`` run packed; wider
levels fall back to per-model unrolled convs (XLA fuses the pack/unpack
reshapes at the transitions).

Semantics: numerically equivalent to the unrolled per-model forward (same
stacked variables from ``init_population``) — BatchNorm statistics are
per-(model, channel) because channel-wise affine/statistics on the packed
layout ARE per-model statistics.  Equivalence is asserted in
tests/test_packed_unet.py; inference-only for now (training support =
round 2).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .unet import BN_EPSILON, resolve_activation

# Layer order of models/unet.py's @nn.compact __call__ (creation == call
# order).  Each entry: (kind, names...) where conv widths come from the
# stacked params themselves.
# encoder block i: conv(ks), conv(1), bn, pool ; bottleneck: conv, conv, bn
# decoder block: upsample+add, conv(1), bn, conv(ks), conv(1), bn


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


def _bn_inference_packed(x, stacked_scale, stacked_bias, stacked_mean,
                         stacked_var, dt):
    """Channel-wise inference BN on the packed layout: concatenated
    per-model vectors ARE per-model statistics."""
    scale = stacked_scale.reshape(-1)
    bias = stacked_bias.reshape(-1)
    mean = stacked_mean.reshape(-1)
    var = stacked_var.reshape(-1)
    inv = scale / jnp.sqrt(var + BN_EPSILON)
    return (x - mean.astype(dt)) * inv.astype(dt) + bias.astype(dt)


class _Seq:
    """Walks Conv_i / BatchNorm_i in call order."""

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
        return (self.params[name]["scale"], self.params[name]["bias"],
                self.batch_stats[name]["mean"],
                self.batch_stats[name]["var"])


@functools.partial(jax.jit, static_argnames=("num_classes", "activation",
                                             "out_activation",
                                             "max_packed_width",
                                             "compute_dtype"))
def packed_unet_forward(stacked_variables: Any, images: jnp.ndarray, *,
                        num_classes: int, activation: str = "relu",
                        out_activation: str = "sigmoid",
                        max_packed_width: int = 128,
                        compute_dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """Inference forward of P stacked U-Nets.

    stacked_variables: the pytree from ``init_population`` (leading P axis);
    images (B, H, W, C) uint8 -> (P, B, H, W, num_classes) float32 probs.
    """
    act = resolve_activation(activation)
    out_act = resolve_activation(out_activation)
    dt = compute_dtype
    params = stacked_variables["params"]
    stats = stacked_variables["batch_stats"]
    p = params["out"]["kernel"].shape[0]
    seq = _Seq(params, stats)

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
        packed_ok = width_of(conv_p) <= max_packed_width
        if packed_ok:
            xp = to_packed(state)
            return _packed_conv(xp, conv_p, act, dt)
        cin = conv_p["kernel"].shape[-2]
        xs = to_list(state, cin)
        return _unrolled_conv(xs, conv_p, act, dt)

    def bn(state):
        scale, bias, mean, var = seq.bn()
        if isinstance(state, list):
            return [_bn_inference_packed(state[i], scale[i], bias[i],
                                         mean[i], var[i], dt)
                    for i in range(p)]
        return _bn_inference_packed(state, scale, bias, mean, var, dt)

    def pool(state):
        f = lambda v: jax.lax.reduce_window(
            v, -jnp.inf if v.dtype != jnp.bfloat16 else
            jnp.asarray(-jnp.inf, dt), jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        if isinstance(state, list):
            return [f(v) for v in state]
        return f(state)

    def upsample_add(state, skip):
        def up(v):
            v = jnp.repeat(v, 2, axis=1)
            return jnp.repeat(v, 2, axis=2)
        if isinstance(state, list) or isinstance(skip, list):
            cin = None
            if not isinstance(state, list):
                # packed -> list using skip's channel count
                cin = skip[0].shape[-1]
                state = to_list(state, cin)
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
    nc = num_classes
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
    return jnp.stack(outs)
