"""Device-mesh construction and the process-wide default mesh.

The reference is strictly single-device (`tf.device('/gpu:0')` in every
script, e.g. reference ISIC_2018/02_ISIC_2018_full_dataset.py:41) and has
no communication backend at all (SURVEY.md 2.3).  The TPU rebuild's two
parallelism axes are:

- ``data``: batch sharding.  Gradients are pmean'd / metric sums psum'd
  over it (PopulationTrainer), generation batches are split over it
  (StackedEnsemble) — collectives ride ICI via XLA.
- ``model``: the candidate population (the reference's REAL parallel axis,
  serialized there) — embarrassingly parallel shards under shard_map.

Production wiring: every numbered script goes through
``pipeline.make_adapter``, which calls :func:`build_mesh` (honouring the
``IM_MESH`` env knob) and registers the result here via
:func:`set_default_mesh`; ``StackedEnsemble`` and ``PopulationTrainer``
then pick it up through :func:`resolve_mesh` without any per-call-site
threading.

``IM_MESH`` grammar:
  ``IM_MESH=4x2``  -> Mesh('model'=4, 'data'=2)
  ``IM_MESH=8``    -> Mesh('data'=8)
  ``IM_MESH=1`` / ``none`` / ``off`` -> force single-device
  unset            -> all visible devices on a 'data' mesh (single device
                      -> no mesh; behaviour identical to the reference)
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_UNSET = object()
_default = _UNSET


def build_mesh(spec: Optional[str] = None):
    """Build a Mesh from a spec string (default: the IM_MESH env var)."""
    import jax
    from jax.sharding import Mesh

    if spec is None:
        spec = os.environ.get("IM_MESH")
    devices = jax.devices()
    if spec is not None:
        spec = spec.strip().lower()
        if spec in ("", "1", "none", "off"):
            return None
        parts = spec.split("x")
        if len(parts) == 1:
            model_par, data_par = 1, int(parts[0])
        else:
            model_par, data_par = int(parts[0]), int(parts[1])
        n = model_par * data_par
        if n > len(devices):
            raise ValueError(
                f"IM_MESH={spec!r} needs {n} devices, have {len(devices)}")
        if n == 1:
            return None
        grid = np.asarray(devices[:n])
        if model_par > 1:
            return Mesh(grid.reshape(model_par, data_par),
                        ("model", "data"))
        return Mesh(grid, ("data",))
    if len(devices) > 1:
        return Mesh(np.asarray(devices), ("data",))
    return None


def set_default_mesh(mesh) -> None:
    global _default
    _default = mesh


def default_mesh():
    """The registered default mesh (None until a production entry point or
    an IM_MESH env setting establishes one)."""
    global _default
    if _default is _UNSET:
        # lazy: honour IM_MESH even without make_adapter (library users);
        # without IM_MESH, stay single-device so unit behaviour is explicit
        _default = build_mesh() if os.environ.get("IM_MESH") else None
    return _default


def resolve_mesh(mesh):
    """``mesh`` if given, else the process default."""
    return mesh if mesh is not None else default_mesh()


def mesh_axis_size(mesh, axis: str) -> int:
    if mesh is None or axis not in mesh.axis_names:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
