"""Parity of the Pallas 3x3 conv (ops/pallas/conv3x3.py) against
``lax.conv_general_dilated`` — forward AND both custom gradients — in CPU
interpret mode, plus the packed-U-Net end-to-end check that
IM_CONV_IMPL=pallas reproduces the default path's loss/grads.

Mirrors tests/test_conv_impls.py's tolerance policy (identical math up to
f32 accumulation-order differences)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inconsistencymasks_tpu.ops.pallas.conv3x3 import conv3x3_same


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 8, 8),      # tiny square
    (1, 16, 8, 16, 8),    # H != W, th=16
    (2, 6, 10, 4, 12),    # H=6 -> th=2, cin != cout
    (2, 1, 1, 8, 8),      # U-Net bottleneck degenerate H=W=1
    (1, 2, 2, 4, 4),      # H=2 single tile with both halo rows zero
])
def test_forward_parity(shape):
    b, h, w, ci, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    got = conv3x3_same(x, k)
    want = _ref_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    got = conv3x3_same(x, k).astype(jnp.float32)
    want = _ref_conv(x, k).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_grad_parity():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))

    def loss(conv):
        def f(x, k):
            return jnp.mean(jnp.square(conv(x, k) - tgt))
        return f

    gx_p, gk_p = jax.grad(loss(conv3x3_same), argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-5)


def test_packed_unet_pallas_impl_matches_default():
    """IM_CONV_IMPL=pallas end-to-end through packed_unet_apply: loss and
    parameter gradients match the default impl.

    Run in float64: in f32 the two impls' different accumulation orders
    flip occasional relu/maxpool boundary decisions through the 5-level
    net, producing isolated ~1e-2 grad deviations that make a fixed f32
    tolerance meaningless.  In f64 ordering noise is ~1e-12, boundary
    flips are astronomically unlikely, and a REAL kernel defect would
    still show at the 1e-6 tolerance used here."""
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
        l_pal, g_pal = run("pallas")
        # interpret-mode kernel dots still carry f32-scale rounding (the
        # interpreter emulates TPU matmul precision; TPUs have no f64
        # MXU), so grads agree to ~2e-6 relative rather than f64 ULPs —
        # still 4+ orders below any real halo/shift/accumulation defect,
        # which the direct-parity tests above would catch at 1e-4 anyway.
        assert abs(l_ref - l_pal) < 1e-9
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-6)
    finally:
        jax.config.update("jax_enable_x64", False)
