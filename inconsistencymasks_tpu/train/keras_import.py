"""Import reference-trained Keras ``.h5`` checkpoints into Flax variables.

The reference saves its models with Keras ``ModelCheckpoint``
(functions.py:217) in the HDF5 layout::

    model_weights/<layer>/<layer>/{kernel:0, bias:0}
    model_weights/<layer>/<layer>/{gamma:0, beta:0,
                                   moving_mean:0, moving_variance:0}

Because this framework's U-Net/EvalNet mirror the reference architecture
layer-for-layer (models/unet.py), the mapping is purely positional: the
i-th Keras ``conv2d*`` corresponds to flax ``Conv_{i}`` (the final Keras
layer is named ``out`` in both, reference unet.py:63), and the i-th
``batch_normalization*`` to ``BatchNorm_{i}``.  Keras kernels are already
(kh, kw, cin, cout) = flax layout; BatchNorm gamma/beta/moving_mean/
moving_variance map to scale/bias/mean/var.

Caveat: validated mechanically against synthetic checkpoints written in the
Keras layout (tests/test_keras_import.py); numerical round-trips against
real TF-generated files need a TF environment.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _layer_index(name: str, prefix: str) -> int:
    """'conv2d' -> 0, 'conv2d_7' -> 7."""
    if name == prefix:
        return 0
    m = re.fullmatch(re.escape(prefix) + r"_(\d+)", name)
    return int(m.group(1)) if m else -1


def _strip(name: str) -> str:
    return name[:-2] if name.endswith(":0") else name


def read_keras_h5(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """{layer_name: {weight_name: array}} from a Keras HDF5 checkpoint."""
    import h5py

    out: Dict[str, Dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for layer in root:
            grp = root[layer]
            weights: Dict[str, np.ndarray] = {}

            def visit(name, obj):
                import h5py as _h5
                if isinstance(obj, _h5.Dataset):
                    weights[_strip(name.split("/")[-1])] = np.asarray(obj)

            grp.visititems(visit)
            if weights:
                out[layer] = weights
    return out


def keras_h5_to_unet_variables(path: str, template: Any) -> Any:
    """Load a reference-trained U-Net ``.h5`` into a variables pytree shaped
    like ``template`` (from ``create_unet`` / ``init_population``).

    Positional mapping: sorted conv/BN layer indices -> flax Conv_i /
    BatchNorm_i; the Keras layer named ``out`` maps to flax ``out``.
    Shapes are asserted leaf-by-leaf.
    """
    layers = read_keras_h5(path)

    convs: Dict[int, Dict[str, np.ndarray]] = {}
    bns: Dict[int, Dict[str, np.ndarray]] = {}
    out_layer = None
    for name, weights in layers.items():
        if name == "out":
            out_layer = weights
            continue
        ci = _layer_index(name, "conv2d")
        if ci >= 0:
            convs[ci] = weights
            continue
        bi = _layer_index(name, "batch_normalization")
        if bi >= 0:
            bns[bi] = weights

    params = dict(template["params"])
    batch_stats = dict(template.get("batch_stats", {}))

    def fill_conv(flax_name: str, weights: Dict[str, np.ndarray]):
        tgt = params[flax_name]
        kernel = weights["kernel"]
        bias = weights["bias"]
        if kernel.shape != tuple(np.shape(tgt["kernel"])):
            raise ValueError(
                f"{flax_name}: kernel shape {kernel.shape} != "
                f"{np.shape(tgt['kernel'])}")
        params[flax_name] = {"kernel": kernel.astype(np.float32),
                             "bias": bias.astype(np.float32)}

    def fill_bn(flax_name: str, weights: Dict[str, np.ndarray]):
        params[flax_name] = {
            "scale": weights["gamma"].astype(np.float32),
            "bias": weights["beta"].astype(np.float32)}
        batch_stats[flax_name] = {
            "mean": weights["moving_mean"].astype(np.float32),
            "var": weights["moving_variance"].astype(np.float32)}

    flax_convs = sorted((k for k in params if k.startswith("Conv_")),
                        key=lambda k: int(k.split("_")[1]))
    if len(flax_convs) != len(convs):
        raise ValueError(f"conv count mismatch: checkpoint has "
                         f"{len(convs)}, model has {len(flax_convs)}")
    for i, flax_name in enumerate(flax_convs):
        fill_conv(flax_name, convs[sorted(convs)[i]])

    flax_bns = sorted((k for k in params if k.startswith("BatchNorm_")),
                      key=lambda k: int(k.split("_")[1]))
    if len(flax_bns) != len(bns):
        raise ValueError(f"BN count mismatch: checkpoint has {len(bns)}, "
                         f"model has {len(flax_bns)}")
    for i, flax_name in enumerate(flax_bns):
        fill_bn(flax_name, bns[sorted(bns)[i]])

    if out_layer is None or "out" not in params:
        raise ValueError("missing 'out' head in checkpoint or model")
    fill_conv("out", out_layer)

    result = {"params": params}
    if batch_stats:
        result["batch_stats"] = batch_stats
    return result


def export_unet_variables_to_keras_h5(variables: Any, path: str) -> None:
    """Inverse of :func:`keras_h5_to_unet_variables` (same positional
    mapping) — lets reference tooling read models trained here, and powers
    the importer's round-trip test."""
    import h5py

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")

        def put(layer: str, weights: Dict[str, np.ndarray]):
            g = mw.create_group(layer).create_group(layer)
            for k, v in weights.items():
                g.create_dataset(f"{k}:0", data=np.asarray(v))

        conv_i = 0
        for name in sorted((k for k in params if k.startswith("Conv_")),
                           key=lambda k: int(k.split("_")[1])):
            keras_name = "conv2d" if conv_i == 0 else f"conv2d_{conv_i}"
            put(keras_name, {"kernel": params[name]["kernel"],
                             "bias": params[name]["bias"]})
            conv_i += 1
        bn_i = 0
        for name in sorted((k for k in params if k.startswith("BatchNorm_")),
                           key=lambda k: int(k.split("_")[1])):
            keras_name = ("batch_normalization" if bn_i == 0
                          else f"batch_normalization_{bn_i}")
            put(keras_name, {
                "gamma": params[name]["scale"],
                "beta": params[name]["bias"],
                "moving_mean": batch_stats[name]["mean"],
                "moving_variance": batch_stats[name]["var"]})
            bn_i += 1
        put("out", {"kernel": params["out"]["kernel"],
                    "bias": params["out"]["bias"]})
