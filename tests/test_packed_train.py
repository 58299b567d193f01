"""Packed-population TRAINING == unrolled per-model training.

Uses float32 compute so the two execution orders agree tightly; the
production bf16 path is covered by the forward tests in
test_packed_unet.py and by the trainer tests (which default to packed).
"""

import numpy as np
import jax
import jax.numpy as jnp

from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population
from inconsistencymasks_tpu.train.trainer import Monitor, PopulationTrainer


def _trainers(num_classes, out_act, loss, p=2, h=32):
    m = UNet(num_classes=num_classes, alpha=0.25, activation="relu",
             out_activation=out_act, compute_dtype=jnp.float32)
    stacked = init_population(m, h, h, 3, p, base_seed=11)
    mk = lambda fwd: PopulationTrainer(
        m, jax.tree.map(jnp.array, stacked), loss=loss,
        monitor=Monitor.isic() if num_classes == 1 else Monitor.multiclass(),
        learning_rate=3e-3, weight_decay=1e-4, num_classes=num_classes,
        forward=fwd)
    return mk("unrolled"), mk("packed")


def test_packed_train_step_matches_unrolled(rng):
    tr_u, tr_p = _trainers(1, "sigmoid", "mse")
    assert not tr_u.packed and tr_p.packed
    for step in range(3):
        images = jnp.asarray(
            rng.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8))
        targets = jnp.asarray(
            (rng.rand(4, 32, 32, 1) > 0.5).astype(np.float32))
        tr_u.state, loss_u = tr_u._train_step(tr_u.state, images, targets)
        tr_p.state, loss_p = tr_p._train_step(tr_p.state, images, targets)
        # step 0 is bit-comparable; later steps drift slightly because
        # Adam amplifies float-order differences on near-zero gradients
        rtol = 1e-5 if step == 0 else 5e-3
        np.testing.assert_allclose(np.asarray(loss_u), np.asarray(loss_p),
                                   rtol=rtol, atol=1e-6)

    for name, atol in (("params", 2e-2), ("batch_stats", 3e-3)):
        ju = jax.tree.leaves(tr_u.state[name])
        jp = jax.tree.leaves(tr_p.state[name])
        for a, b in zip(ju, jp):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(a, b, atol=atol)
            assert float(np.mean(np.abs(a - b))) < atol / 10


def test_packed_train_multiclass(rng):
    tr_u, tr_p = _trainers(5, "softmax", "cce")
    images = jnp.asarray(rng.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8))
    targets = jnp.asarray(rng.randint(0, 5, (4, 32, 32)).astype(np.int32))
    tr_u.state, loss_u = tr_u._train_step(tr_u.state, images, targets)
    tr_p.state, loss_p = tr_p._train_step(tr_p.state, images, targets)
    np.testing.assert_allclose(np.asarray(loss_u), np.asarray(loss_p),
                               rtol=2e-4, atol=1e-6)


def test_packed_train_bf16_smoke(rng):
    """Production dtype: one bf16 packed train step runs and is finite
    (catches autodiff breaks that only appear off the f32 test path)."""
    m = UNet(num_classes=1, alpha=0.25)
    stacked = init_population(m, 32, 32, 3, 2, base_seed=3)
    tr = PopulationTrainer(m, stacked, loss="mse", monitor=Monitor.isic(),
                           learning_rate=3e-3, weight_decay=1e-4,
                           forward="packed")
    images = jnp.asarray(rng.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8))
    targets = jnp.asarray((rng.rand(4, 32, 32, 1) > 0.5).astype(np.float32))
    tr.state, loss = tr._train_step(tr.state, images, targets)
    assert np.all(np.isfinite(np.asarray(loss)))


def test_packed_auto_selection():
    m_drop = UNet(num_classes=1, alpha=0.25, dropout_rate_encoder=0.1)
    stacked = init_population(m_drop, 32, 32, 3, 2)
    tr = PopulationTrainer(m_drop, stacked, loss="mse",
                           monitor=Monitor.isic(), learning_rate=3e-3,
                           weight_decay=1e-4)
    assert not tr.packed  # dropout forces the unrolled fallback
