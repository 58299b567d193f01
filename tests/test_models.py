"""Model-family structural tests: parameter parity with the reference's
published 0.17-2.72M range (reference README.md:25) and forward shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inconsistencymasks_tpu.models import create_evalnet, create_unet
from inconsistencymasks_tpu.models.unet import param_count

# Exact Keras parameter counts for the reference get_unet at 3 input
# channels / 1 output class (verified analytically: conv k*k*cin*cout+cout,
# BN 2*cout trainable + 2*cout moving stats).
EXPECTED_UNET_PARAMS = {0.5: 170_809, 1.0: 680_177, 1.5: 1_528_105,
                        2.0: 2_714_593}


@pytest.mark.parametrize("alpha", [0.5, 1.0])
def test_unet_param_count(alpha):
    _, v = create_unet(64, 64, 3, 1, alpha, "relu", "sigmoid")
    assert param_count(v) == EXPECTED_UNET_PARAMS[alpha]


def test_unet_param_range_matches_reference_readme():
    _, v = create_unet(64, 64, 3, 1, 0.5, "relu", "sigmoid")
    assert abs(param_count(v) - 0.17e6) < 0.01e6
    _, v = create_unet(64, 64, 3, 1, 2.0, "relu", "sigmoid")
    assert abs(param_count(v) - 2.72e6) < 0.01e6


def test_unet_forward_shapes_binary():
    m, v = create_unet(64, 64, 3, 1, 0.5, "relu", "sigmoid")
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        v, jnp.zeros((2, 64, 64, 3), jnp.uint8))
    assert out.shape == (2, 64, 64, 1)
    assert out.dtype == jnp.float32  # output head pinned f32
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_unet_forward_softmax_multiclass():
    m, v = create_unet(64, 64, 3, 9, 1.0, "relu", "softmax")
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        v, jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert out.shape == (1, 64, 64, 9)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_unet_nonsquare_cityscapes():
    m, v = create_unet(48, 96, 3, 35, 1.0, "relu", "softmax")
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        v, jnp.zeros((1, 48, 96, 3), jnp.uint8))
    assert out.shape == (1, 48, 96, 35)


def test_unet_train_mode_updates_batch_stats():
    m, v = create_unet(32, 32, 3, 1, 0.5, "relu", "sigmoid")
    x = jnp.asarray(np.random.RandomState(0)
                    .randint(0, 255, (2, 32, 32, 3)).astype(np.uint8))
    out, mutated = jax.jit(
        lambda v, x: m.apply(v, x, train=True, mutable=["batch_stats"]))(v, x)
    old = jax.tree.leaves(v["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_evalnet_forward():
    m, v = create_evalnet(64, 64, 3, 1, alpha=1, variant="single")
    out = jax.jit(lambda v, a, b: m.apply(v, a, b, train=False))(
        v, jnp.zeros((2, 64, 64, 3), jnp.uint8),
        jnp.zeros((2, 64, 64, 1), jnp.uint8))
    assert out.shape == (2, 1)


def test_evalnet_miou_two_heads():
    m, v = create_evalnet(64, 64, 1, 3, alpha=2, variant="miou")
    iou, det = jax.jit(lambda v, a, b: m.apply(v, a, b, train=False))(
        v, jnp.zeros((2, 64, 64, 1), jnp.uint8),
        jnp.zeros((2, 64, 64, 3), jnp.uint8))
    assert iou.shape == (2, 3) and det.shape == (2, 3)


def test_evalnet_miou_v2_builds():
    m, v = create_evalnet(64, 64, 3, 9, alpha=1, variant="miou_v2")
    iou, det = jax.jit(lambda v, a, b: m.apply(v, a, b, train=False))(
        v, jnp.zeros((1, 64, 64, 3), jnp.uint8),
        jnp.zeros((1, 64, 64, 9), jnp.uint8))
    assert iou.shape == (1, 9) and det.shape == (1, 9)


def test_unet_population_vmap():
    """Candidate models must train as a vmapped leading axis."""
    m, v = create_unet(32, 32, 3, 1, 0.5, "relu", "sigmoid")
    pop = 3
    stacked = jax.tree.map(
        lambda a: jnp.stack([a] * pop), v)
    x = jnp.zeros((pop, 2, 32, 32, 3), jnp.uint8)
    out = jax.jit(jax.vmap(lambda v, x: m.apply(v, x, train=False)))(
        stacked, x)
    assert out.shape == (pop, 2, 32, 32, 1)
