"""Population trainer + checkpoint tests (tiny shapes, virtual CPU mesh)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from inconsistencymasks_tpu.data.loader import (load_hela_dataset,
                                                load_image_mask_dataset)
from inconsistencymasks_tpu.data.synthetic import (make_binary_dataset,
                                                   make_hela_dataset,
                                                   make_multiclass_dataset)
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.checkpoint import (load_variables,
                                                     save_variables,
                                                     stack_variables,
                                                     unstack_variables)
from inconsistencymasks_tpu.train.optim import adamw_decoupled
from inconsistencymasks_tpu.train.population import init_population
from inconsistencymasks_tpu.train.trainer import Monitor, PopulationTrainer


def _mini_module():
    return UNet(num_classes=1, alpha=0.25, activation="relu",
                out_activation="sigmoid")


def test_adamw_matches_tfa_semantics():
    """One step on a scalar: p' = p - lr*adam - wd*p (tfa decoupled)."""
    lr, wd = 0.1, 0.01
    tx = adamw_decoupled(lr, wd)
    p = {"w": jnp.asarray(2.0)}
    g = {"w": jnp.asarray(1.0)}
    st = tx.init(p)
    up, _ = tx.update(g, st, p)
    # adam first step: m_hat=g, v_hat=g^2 -> update ~ g/|g| = 1
    expect = -lr * (1.0 / (1.0 + 1e-7)) - wd * 2.0
    assert np.isclose(float(up["w"]), expect, atol=1e-6)


def test_population_trainer_binary(tmp_path):
    make_binary_dataset(str(tmp_path), h=32, w=32, n_labeled=16, n_val=6)
    train = load_image_mask_dataset(str(tmp_path / "train_labeled" / "images"))
    val = load_image_mask_dataset(str(tmp_path / "val" / "images"))
    m = _mini_module()
    tr = PopulationTrainer(m, init_population(m, 32, 32, 3, 3),
                           loss="mse", monitor=Monitor.isic(),
                           learning_rate=3e-3, weight_decay=1e-4)
    hist = tr.fit(train, val, epochs=2, batch_size=8, seed=42, log=None)
    assert hist.shape == (2, 3)
    assert np.all(np.isfinite(tr.best_metrics()))
    assert len(tr.best_variables()) == 3


def test_population_trainer_mesh_8dev(tmp_path):
    make_binary_dataset(str(tmp_path), h=32, w=32, n_labeled=16, n_val=6)
    train = load_image_mask_dataset(str(tmp_path / "train_labeled" / "images"))
    val = load_image_mask_dataset(str(tmp_path / "val" / "images"))
    m = _mini_module()
    mesh = Mesh(np.array(jax.devices()), ("data",))
    tr = PopulationTrainer(m, init_population(m, 32, 32, 3, 2),
                           loss="mse", monitor=Monitor.isic(),
                           learning_rate=3e-3, weight_decay=1e-4, mesh=mesh)
    hist = tr.fit(train, val, epochs=1, batch_size=8, seed=42, log=None)
    assert hist.shape == (1, 2)


def test_population_trainer_multiclass_monitor(tmp_path):
    make_multiclass_dataset(str(tmp_path), num_classes=5, h=32, w=32,
                            n_labeled=8, n_val=4)
    train = load_image_mask_dataset(str(tmp_path / "train_labeled" / "images"),
                                    binary=False)
    val = load_image_mask_dataset(str(tmp_path / "val" / "images"),
                                  binary=False)
    m = UNet(num_classes=5, alpha=0.25, activation="relu",
             out_activation="softmax")
    tr = PopulationTrainer(m, init_population(m, 32, 32, 3, 2),
                           loss="cce", monitor=Monitor.multiclass(),
                           learning_rate=3e-3, weight_decay=1e-4,
                           num_classes=5)
    hist = tr.fit(train, val, epochs=2, batch_size=4, seed=42, log=None)
    assert hist.shape == (2, 2)
    assert np.all(hist > 0)


def test_population_trainer_hela_loss_monitor(tmp_path):
    make_hela_dataset(str(tmp_path), h=32, w=32, n_labeled=6, n_val=4)
    train = load_hela_dataset(str(tmp_path / "train_labeled"))
    val = load_hela_dataset(str(tmp_path / "val"))
    m = UNet(num_classes=3, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    tr = PopulationTrainer(m, init_population(m, 32, 32, 1, 2),
                           loss="mse", monitor=Monitor.hela(),
                           learning_rate=3e-3, weight_decay=1e-4)
    hist = tr.fit(train, val, epochs=2, batch_size=4, seed=42, log=None)
    # loss monitor: best metric should be the minimum of the history
    assert np.allclose(tr.best_metrics(), hist.min(axis=0))


def test_best_weights_kept_when_metric_degrades(tmp_path):
    """Candidate's best epoch must be retained, not the last epoch."""
    make_binary_dataset(str(tmp_path), h=32, w=32, n_labeled=8, n_val=4)
    train = load_image_mask_dataset(str(tmp_path / "train_labeled" / "images"))
    val = load_image_mask_dataset(str(tmp_path / "val" / "images"))
    m = _mini_module()
    tr = PopulationTrainer(m, init_population(m, 32, 32, 3, 2),
                           loss="mse", monitor=Monitor.isic(),
                           learning_rate=3e-3, weight_decay=1e-4)
    hist = tr.fit(train, val, epochs=3, batch_size=4, seed=42, log=None)
    assert np.allclose(tr.best_metrics(), hist.max(axis=0))


def test_checkpoint_roundtrip_and_stack(tmp_path):
    m = _mini_module()
    vs = init_population(m, 32, 32, 3, 2)
    singles = unstack_variables(vs, 2)
    p = str(tmp_path / "model.h5")
    save_variables(p, singles[0], {"alpha": 0.25})
    loaded, meta = load_variables(p, template=singles[0])
    assert meta["alpha"] == 0.25
    for a, b in zip(jax.tree.leaves(singles[0]), jax.tree.leaves(loaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    restacked = stack_variables(singles)
    for a, b in zip(jax.tree.leaves(vs), jax.tree.leaves(restacked)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_rejects_foreign_file(tmp_path):
    p = str(tmp_path / "bogus.h5")
    with open(p, "wb") as f:
        f.write(b"not a checkpoint")
    with pytest.raises(ValueError):
        load_variables(p)
