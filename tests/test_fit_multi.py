"""fit_multi (fused multi-cell training) reproduces each cell's solo run.

Cells have DIFFERENT datasets and DIFFERENT steps_per_epoch; the fused
run must match each solo PopulationTrainer.fit trajectory (same seeds,
same per-cell stream order, per-step update masking)."""

import numpy as np
import jax
import jax.numpy as jnp

from inconsistencymasks_tpu.data.loader import Dataset
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population
from inconsistencymasks_tpu.train.trainer import Monitor, PopulationTrainer


def _ds(rng, n, h=32):
    return Dataset(
        images=rng.randint(0, 255, (n, h, h, 3)).astype(np.uint8),
        targets=(rng.rand(n, h, h, 1) > 0.5).astype(np.float32),
        names=[f"im_{i}.png" for i in range(n)])


def _trainer(m, stacked):
    return PopulationTrainer(m, jax.tree.map(jnp.array, stacked),
                             loss="mse", monitor=Monitor.isic(),
                             learning_rate=3e-3, weight_decay=1e-4,
                             forward="packed")


def test_fit_multi_matches_solo(rng):
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid", compute_dtype=jnp.float32)
    ds_a = _ds(rng, 12)   # 3 steps/epoch at batch 4
    ds_b = _ds(rng, 8)    # 2 steps/epoch -> masked on step 3
    val = _ds(rng, 4)

    st_a = init_population(m, 32, 32, 3, 2, base_seed=21)
    st_b = init_population(m, 32, 32, 3, 2, base_seed=22)
    merged = jax.tree.map(lambda *x: jnp.concatenate(x), st_a, st_b)

    tr = _trainer(m, merged)
    hist = tr.fit_multi([ds_a, ds_b], val, epochs=2, batch_size=4,
                        seed=42, log=None)
    assert hist.shape == (2, 4)

    h_a = _trainer(m, st_a).fit(ds_a, val, epochs=2, batch_size=4,
                                seed=42, log=None)
    h_b = _trainer(m, st_b).fit(ds_b, val, epochs=2, batch_size=4,
                                seed=42, log=None)
    np.testing.assert_allclose(hist[:, :2], h_a, atol=3e-3)
    np.testing.assert_allclose(hist[:, 2:], h_b, atol=3e-3)


def test_fit_multi_guards():
    import pytest

    m = UNet(num_classes=1, alpha=0.25, dropout_rate_encoder=0.1)
    st = init_population(m, 32, 32, 3, 2)
    tr = PopulationTrainer(m, st, loss="mse", monitor=Monitor.isic(),
                           learning_rate=3e-3, weight_decay=1e-4)
    with pytest.raises(ValueError, match="packed"):
        tr.fit_multi([None], None, epochs=1, batch_size=4)
