"""Keras .h5 checkpoint import/export round-trip + forward equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inconsistencymasks_tpu.models.unet import UNet, create_unet
from inconsistencymasks_tpu.train.keras_import import (
    export_unet_variables_to_keras_h5, keras_h5_to_unet_variables)


def test_roundtrip_and_forward_equivalence(tmp_path):
    m, v = create_unet(32, 32, 3, 1, 0.25, "relu", "sigmoid", seed=3)
    path = str(tmp_path / "model.h5")
    export_unet_variables_to_keras_h5(v, path)
    loaded = keras_h5_to_unet_variables(path, v)

    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(loaded)):
        assert np.array_equal(np.asarray(a, np.float32),
                              np.asarray(b, np.float32))

    x = jnp.asarray(np.random.RandomState(0)
                    .randint(0, 255, (2, 32, 32, 3)).astype(np.uint8))
    fwd = jax.jit(lambda v, x: m.apply(v, x, train=False))
    np.testing.assert_array_equal(np.asarray(fwd(v, x)),
                                  np.asarray(fwd(loaded, x)))


def test_import_rejects_wrong_architecture(tmp_path):
    _, v_small = create_unet(32, 32, 3, 1, 0.25, "relu", "sigmoid")
    _, v_big = create_unet(32, 32, 3, 1, 0.5, "relu", "sigmoid")
    path = str(tmp_path / "model.h5")
    export_unet_variables_to_keras_h5(v_small, path)
    with pytest.raises(ValueError):
        keras_h5_to_unet_variables(path, v_big)


def test_import_handles_keras_name_suffixes(tmp_path):
    """weights stored as 'kernel:0' (Keras convention) must load."""
    import h5py
    _, v = create_unet(32, 32, 3, 1, 0.25, "relu", "sigmoid")
    path = str(tmp_path / "model.h5")
    export_unet_variables_to_keras_h5(v, path)
    with h5py.File(path, "r") as f:
        names = list(f["model_weights/conv2d/conv2d"])
    assert "kernel:0" in names
    loaded = keras_h5_to_unet_variables(path, v)
    assert "out" in loaded["params"]
