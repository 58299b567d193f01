"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md section 4: xla_force_host_platform_device_count strategy).

NOTE this environment's sitecustomize registers an `axon` TPU platform and
overrides JAX_PLATFORMS, so plain env vars are NOT enough — we must call
jax.config.update after import (before first backend use)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


@pytest.fixture(autouse=True)
def _isolate_default_mesh():
    """make_adapter registers a PROCESS-WIDE default mesh (parallel.py);
    restore it around every test so mesh state cannot leak across tests
    (test ordering independence)."""
    from inconsistencymasks_tpu import parallel
    before = parallel._default
    yield
    parallel._default = before
