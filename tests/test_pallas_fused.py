"""Parity of the fused Pallas conv3x3+bias+ReLU (ops/pallas/fused_block.py)
against ``relu(lax.conv_general_dilated(...) + b)`` — forward and all
three custom gradients (dx, dw, db) — in CPU interpret mode, plus the
packed-U-Net end-to-end check that IM_CONV_IMPL=pallasfused reproduces
the default path's loss/grads.

Mirrors tests/test_pallas_conv.py's structure and tolerance policy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inconsistencymasks_tpu.ops.pallas.fused_block import conv3x3_bias_relu


def _ref(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 8, 8),      # tiny square
    (1, 16, 8, 16, 8),    # H != W, th=16
    (2, 6, 10, 4, 12),    # H=6 -> th=2, cin != cout
    (2, 1, 1, 8, 8),      # bottleneck degenerate H=W=1
    (1, 2, 2, 4, 4),      # H=2 single tile with both halo rows zero
])
def test_forward_parity(shape):
    bsz, h, w, ci, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bsz, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    got = conv3x3_bias_relu(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, k, b)),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    got = conv3x3_bias_relu(x, k, b).astype(jnp.float32)
    want = _ref(x, k, b).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 4, 6),
    (1, 6, 10, 4, 12),    # th=2, multiple tiles exercise wgrad accumulate
])
def test_grad_parity(shape):
    bsz, h, w, ci, co = shape
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(bsz, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.randn(bsz, h, w, co).astype(np.float32))

    def loss(f):
        return lambda x, k, b: jnp.mean(jnp.square(f(x, k, b) - tgt))

    gp = jax.grad(loss(conv3x3_bias_relu), argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss(_ref), argnums=(0, 1, 2))(x, k, b)
    for a, c, name in zip(gp, gr, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_packed_unet_pallasfused_matches_default():
    """IM_CONV_IMPL=pallasfused end-to-end through packed_unet_apply:
    loss and parameter gradients match the default impl.  f64 for the
    same boundary-decision reasons as
    tests/test_pallas_conv.py:test_packed_unet_pallas_impl_matches_default."""
    from inconsistencymasks_tpu.models import packed_unet as pu
    from inconsistencymasks_tpu.models.unet import UNet
    from inconsistencymasks_tpu.train.population import init_population

    jax.config.update("jax_enable_x64", True)
    try:
        m = UNet(num_classes=1, alpha=0.25)
        pop = init_population(m, 16, 16, 3, 2, base_seed=0)
        rng = np.random.RandomState(3)
        imgs = jnp.asarray(rng.randint(0, 256, (2, 16, 16, 3),
                                       dtype=np.uint8))
        tgts = jnp.asarray((rng.rand(2, 2, 16, 16, 1) > 0.5)
                           .astype(np.float64))
        kw = dict(num_classes=1, activation="relu",
                  out_activation="sigmoid", max_packed_width=64,
                  compute_dtype=jnp.float64)
        params64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                                pop["params"])
        bs64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                            pop["batch_stats"])

        def run(impl):
            old = pu._CONV_IMPL
            pu._CONV_IMPL = impl
            try:
                def loss_fn(params):
                    probs, _ = pu.packed_unet_apply(
                        {"params": params, "batch_stats": bs64},
                        imgs, train=True, **kw)
                    return jnp.mean(jnp.square(probs - tgts))
                l, g = jax.value_and_grad(loss_fn)(params64)
                return float(l), g
            finally:
                pu._CONV_IMPL = old

        l_ref, g_ref = run("conv")
        l_pal, g_pal = run("pallasfused")
        assert abs(l_ref - l_pal) < 1e-9
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-6)
    finally:
        jax.config.update("jax_enable_x64", False)
