"""StackedEnsemble data-parallel sharding + jit-vs-eager numerics
(the SURVEY section 5 substitute for race detection)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.pseudo.engine import StackedEnsemble
from inconsistencymasks_tpu.train.checkpoint import unstack_variables
from inconsistencymasks_tpu.train.population import init_population


def _setup(k=2):
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    models = unstack_variables(init_population(m, 32, 32, 3, k), k)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    return m, models, x


def test_mesh_sharded_matches_unsharded():
    m, models, x = _setup()
    plain = StackedEnsemble(m, models)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharded = StackedEnsemble(m, models, mesh=mesh)
    a = np.asarray(plain.predict_probs(x))
    b = np.asarray(sharded.predict_probs(x))
    np.testing.assert_allclose(a, b, atol=2e-2)  # bf16 reduction order


def test_mesh_remainder_batch_replicates():
    m, models, _ = _setup()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    ens = StackedEnsemble(m, models, mesh=mesh)
    x = np.random.RandomState(1).randint(0, 255, (5, 32, 32, 3)
                                         ).astype(np.uint8)
    out = ens.predict_probs(x)  # 5 % 8 != 0 -> replicated, must not crash
    assert out.shape == (2, 5, 32, 32, 1)


def test_jit_vs_eager_numerics():
    """jit and op-by-op eager must agree (XLA fusion sanity)."""
    m, models, x = _setup(k=1)
    xj = jnp.asarray(x[:2])
    jitted = np.asarray(jax.jit(
        lambda v, x: m.apply(v, x, train=False))(models[0], xj))
    eager = np.asarray(m.apply(models[0], xj, train=False))
    np.testing.assert_allclose(jitted, eager, atol=2e-2)
