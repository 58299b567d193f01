"""Multi-chip sharding paths: shard_map population x data mesh."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from inconsistencymasks_tpu.data.loader import Dataset
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population
from inconsistencymasks_tpu.train.trainer import Monitor, PopulationTrainer


def _data(b, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return Dataset(images=rng.randint(0, 255, (b, h, w, 3)).astype(np.uint8),
                   targets=rng.randint(0, 2, (b, h, w, 1)).astype(np.uint8),
                   names=[f"x{i}.png" for i in range(b)])


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (8, 1)])
def test_model_data_mesh_trains(shape):
    mp, dp = shape
    mesh = Mesh(np.asarray(jax.devices()).reshape(mp, dp),
                ("model", "data"))
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    pop = 2 * mp
    tr = PopulationTrainer(m, init_population(m, 32, 32, 3, pop),
                           loss="mse", monitor=Monitor.isic(),
                           learning_rate=3e-3, weight_decay=1e-4, mesh=mesh)
    ds = _data(4 * dp)
    val = _data(3, seed=1)  # odd size exercises eval padding+mask
    hist = tr.fit(ds, val, epochs=1, batch_size=4 * dp, seed=0, log=None)
    assert hist.shape == (1, pop)
    assert np.all(np.isfinite(hist))


def test_shard_map_matches_single_device_eval():
    """Eval metric under the sharded path must equal the unsharded one."""
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    pop_vars = init_population(m, 32, 32, 3, 2)
    val = _data(5, seed=3)

    plain = PopulationTrainer(m, pop_vars, loss="mse",
                              monitor=Monitor.isic(), learning_rate=3e-3,
                              weight_decay=1e-4)
    m_plain = plain.evaluate(val, batch_size=4)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("model", "data"))
    sharded = PopulationTrainer(m, pop_vars, loss="mse",
                                monitor=Monitor.isic(), learning_rate=3e-3,
                                weight_decay=1e-4, mesh=mesh)
    m_shard = sharded.evaluate(val, batch_size=4)
    np.testing.assert_allclose(m_plain, m_shard, atol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
