"""Packed-population forward == unrolled per-model forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inconsistencymasks_tpu.models.packed_unet import packed_unet_forward
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population
from inconsistencymasks_tpu.ops.unroll import unrolled_map


@pytest.mark.parametrize("max_packed_width", [128, 64, 10 ** 9])
def test_packed_matches_unrolled(rng, max_packed_width):
    p = 3
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    stacked = init_population(m, 32, 32, 3, p, base_seed=5)
    x = jnp.asarray(rng.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8))

    ref = np.asarray(jax.jit(lambda s, x: unrolled_map(
        lambda v: m.apply(v, x, train=False), s))(stacked, x))
    packed = np.asarray(packed_unet_forward(
        stacked, x, num_classes=1, activation="relu",
        out_activation="sigmoid", max_packed_width=max_packed_width))
    assert packed.shape == ref.shape
    np.testing.assert_allclose(packed, ref, atol=3e-2)  # bf16 order effects
    # the probabilities agree tightly on average
    assert float(np.mean(np.abs(packed - ref))) < 2e-3


def test_packed_multiclass(rng):
    p = 2
    m = UNet(num_classes=5, alpha=0.25, activation="relu",
             out_activation="softmax")
    stacked = init_population(m, 32, 32, 3, p, base_seed=1)
    x = jnp.asarray(rng.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8))
    ref = np.asarray(jax.jit(lambda s, x: unrolled_map(
        lambda v: m.apply(v, x, train=False), s))(stacked, x))
    packed = np.asarray(packed_unet_forward(
        stacked, x, num_classes=5, activation="relu",
        out_activation="softmax"))
    np.testing.assert_allclose(packed, ref, atol=3e-2)


@pytest.mark.parametrize("ncls,out_act", [(1, "sigmoid"), (5, "softmax")])
def test_packed_head_matches_loop(rng, monkeypatch, ncls, out_act):
    """IM_PACKED_HEAD=1 (block-diagonal f32 head dot) == per-model head
    loop — incl. softmax, which must normalize per model after unpack."""
    from inconsistencymasks_tpu.models import packed_unet

    p = 3
    stacked = init_population(
        UNet(num_classes=ncls, alpha=0.25, activation="relu",
             out_activation=out_act), 32, 32, 3, p, base_seed=7)
    x = jnp.asarray(rng.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8))

    def fwd():
        return np.asarray(jax.jit(
            lambda s, x: packed_unet.packed_unet_apply(
                s, x, train=False, num_classes=ncls, activation="relu",
                out_activation=out_act))(stacked, x))

    monkeypatch.setattr(packed_unet, "_PACKED_HEAD", False)
    ref = fwd()
    monkeypatch.setattr(packed_unet, "_PACKED_HEAD", True)
    got = fwd()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_dense_input_matches_tiled(rng, monkeypatch):
    """IM_PACKED_INPUT_DENSE=1 (one dense Cin->P*Cout input dot on the raw
    shared batch) == the tiled block-diagonal input conv: every model sees
    the same image, so the off-diagonal blocks multiply copies of x by
    exact zeros.  Gradients must match too (the input block feeds every
    downstream layer)."""
    from inconsistencymasks_tpu.models import packed_unet

    p = 3
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    stacked = init_population(m, 32, 32, 3, p, base_seed=11)
    x = jnp.asarray(rng.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8))
    tgt = jnp.asarray((rng.rand(p, 2, 32, 32, 1) > 0.5).astype(np.float32))

    def fwd():
        return np.asarray(jax.jit(
            lambda s, x: packed_unet.packed_unet_apply(
                s, x, train=False, num_classes=1, activation="relu",
                out_activation="sigmoid"))(stacked, x))

    def grads():
        def loss(params):
            probs, _ = packed_unet.packed_unet_apply(
                {"params": params, "batch_stats": stacked["batch_stats"]},
                x, train=True, num_classes=1, activation="relu",
                out_activation="sigmoid")
            return jnp.mean(jnp.square(probs - tgt))
        return jax.jit(jax.grad(loss))(stacked["params"])

    monkeypatch.setattr(packed_unet, "_DENSE_INPUT", False)
    ref, gref = fwd(), grads()
    monkeypatch.setattr(packed_unet, "_DENSE_INPUT", True)
    got, ggot = fwd(), grads()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)
    ra = jax.tree.leaves(gref)
    rb = jax.tree.leaves(ggot)
    assert len(ra) == len(rb)
    for a, b in zip(ra, rb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)
