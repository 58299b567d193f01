"""Numerical equivalence of the pluggable conv implementations
(models/packed_unet.py layout-tax experiments, ROADMAP round-3 #1).

Every IM_CONV_IMPL / IM_CONV_WGRAD_DOT / IM_POOL_SLICE variant must produce
the same forward values AND the same parameter/input gradients as the
default lax.conv path — they are layout/scheduling experiments, not
semantic changes.  Checked in float32 on CPU (the conftest forces the CPU
backend); the packed trainer's own equivalence vs the unrolled per-model
path is covered by tests/test_packed_train.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inconsistencymasks_tpu.models import packed_unet as pu
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape),
                       jnp.float32)


@pytest.mark.parametrize("kh,kw", [(1, 1), (3, 3)])
def test_conv_dots_matches_conv(kh, kw):
    x = _rand((2, 8, 8, 5), 0)
    w = _rand((kh, kw, 5, 7), 1) * 0.1

    y_ref, vjp_ref = jax.vjp(pu._conv_plain, x, w)
    y_dot, vjp_dot = jax.vjp(pu._conv_dots, x, w)
    np.testing.assert_allclose(y_dot, y_ref, atol=1e-5)

    g = _rand(y_ref.shape, 2)
    for a, b in zip(vjp_dot(g), vjp_ref(g)):
        np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("mode", ["convdotbwd", "wgraddot"])
@pytest.mark.parametrize("kh,kw", [(1, 1), (3, 3)])
def test_conv_custom_vjp_matches_conv(mode, kh, kw):
    x = _rand((2, 8, 8, 5), 3)
    w = _rand((kh, kw, 5, 7), 4) * 0.1

    y_ref, vjp_ref = jax.vjp(pu._conv_plain, x, w)
    y_c, vjp_c = jax.vjp(lambda x, w: pu._conv_custom(x, w, mode), x, w)
    np.testing.assert_allclose(y_c, y_ref, atol=1e-6)

    g = _rand(y_ref.shape, 5)
    for a, b in zip(vjp_c(g), vjp_ref(g)):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_maxpool_slice_matches_reduce_window():
    x = _rand((2, 8, 8, 6), 6)
    y_ref, vjp_ref = jax.vjp(pu._rw_max, x)
    y_s, vjp_s = jax.vjp(pu._maxpool2_slice, x)
    np.testing.assert_allclose(y_s, y_ref, atol=0)
    g = _rand(y_ref.shape, 7)
    # no ties in random floats -> backward routing identical
    np.testing.assert_allclose(vjp_s(g)[0], vjp_ref(g)[0], atol=0)


@pytest.mark.parametrize("variant", [
    {"_CONV_IMPL": "dot1x1"},
    {"_CONV_IMPL": "dot"},
    {"_CONV_IMPL": "convdotbwd"},
    # XLA's grouped-conv CPU lowering accumulates each group's contraction
    # in yet another order; through BN's 1/var the reorder noise reaches
    # ~1.6e-3 relative on single gradient elements — widen just for it.
    {"_CONV_IMPL": "groupconv", "__tol__": dict(atol=5e-4, rtol=2e-3)},
    {"_WGRAD_DOT": True},
    {"_POOL_SLICE": True},
])
def test_packed_apply_variant_equivalence(variant):
    """Full packed train-mode forward + grads match the default impl."""
    m = UNet(num_classes=1, alpha=0.25)
    stacked = init_population(m, 16, 16, 3, 3, base_seed=1)
    images = jnp.asarray(
        np.random.RandomState(8).randint(0, 256, (2, 16, 16, 3), np.uint8))
    targets = _rand((3, 2, 16, 16, 1), 9)
    kw = dict(num_classes=1, activation="relu", out_activation="sigmoid",
              max_packed_width=128, compute_dtype=jnp.float32)

    def loss_fn(params):
        probs, new_bs = pu.packed_unet_apply(
            {"params": params, "batch_stats": stacked["batch_stats"]},
            images, train=True, **kw)
        return jnp.mean(jnp.square(probs - targets)), (probs, new_bs)

    variant = dict(variant)
    tol = variant.pop("__tol__", dict(atol=2e-4, rtol=5e-4))
    defaults = {"_CONV_IMPL": "conv", "_WGRAD_DOT": False,
                "_POOL_SLICE": False}
    saved = {k: getattr(pu, k) for k in defaults}
    try:
        for k, v in defaults.items():
            setattr(pu, k, v)
        (l0, (p0, bs0)), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
            stacked["params"])
        for k, v in {**defaults, **variant}.items():
            setattr(pu, k, v)
        (l1, (p1, bs1)), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
            stacked["params"])
    finally:
        for k, v in saved.items():
            setattr(pu, k, v)

    # dot/conv accumulate the channel contraction in different orders, so
    # f32 values agree to summation-order noise (~1e-4 relative), not ULPs
    np.testing.assert_allclose(l1, l0, atol=1e-6)
    np.testing.assert_allclose(p1, p0, atol=2e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(a, b, **tol)
    for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs0)):
        np.testing.assert_allclose(a, b, **tol)
