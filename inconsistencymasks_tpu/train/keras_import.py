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

Validated both ways against REAL ``tf.keras`` HDF5 files
(tests/test_keras_real_h5.py): a genuine ``model.save('*.h5')`` checkpoint
of the reference architecture imports with forward agreement at 2e-5, and
our exports load back through ``tf.keras`` ``load_weights`` with the same
agreement.  tests/test_keras_import.py additionally covers the mechanical
layout round-trip without a TF dependency.
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


def _unet_keras_layer_sequence():
    """The reference U-Net's weighted-layer creation order (reference
    unet.py:46-63; mirrored by models/unet.py): input conv+BN, 4 encoder
    blocks (conv, conv, BN), bottleneck (conv, conv, BN), 4 decoder blocks
    (conv, BN, conv, conv, BN), f32 'out' head.  Keras's legacy HDF5
    loader zips ``layer_names`` against the model's weighted layers IN
    ORDER, so the exported attr must follow this sequence."""
    seq = [("conv", 0), ("bn", 0)]
    ci, bi = 1, 1
    for _ in range(4):                      # encoders
        seq += [("conv", ci), ("conv", ci + 1), ("bn", bi)]
        ci += 2
        bi += 1
    seq += [("conv", ci), ("conv", ci + 1), ("bn", bi)]   # bottleneck
    ci += 2
    bi += 1
    for _ in range(4):                      # decoders
        seq += [("conv", ci), ("bn", bi), ("conv", ci + 1),
                ("conv", ci + 2), ("bn", bi + 1)]
        ci += 3
        bi += 2
    seq.append(("out", None))
    return seq


def export_unet_variables_to_keras_h5(variables: Any, path: str) -> None:
    """Inverse of :func:`keras_h5_to_unet_variables` (same positional
    mapping), in the legacy Keras HDF5 weight layout with the
    ``layer_names``/``weight_names`` attrs a real ``tf.keras``
    ``load_weights`` requires (validated in tests/test_keras_real_h5.py)
    — lets reference tooling read models trained here."""
    import h5py

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def keras_name(kind, idx):
        if kind == "out":
            return "out"
        base = "conv2d" if kind == "conv" else "batch_normalization"
        return base if idx == 0 else f"{base}_{idx}"

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        mw.attrs["backend"] = np.bytes_("tensorflow")
        mw.attrs["keras_version"] = np.bytes_("2.15.0")

        layer_names = []

        def put(layer: str, weights):
            # weights: ordered (name, array) pairs, Keras variable order
            g = mw.create_group(layer)
            sub = g.create_group(layer)
            wnames = []
            for k, v in weights:
                sub.create_dataset(f"{k}:0", data=np.asarray(v))
                wnames.append(f"{layer}/{k}:0".encode())
            g.attrs["weight_names"] = np.array(wnames)
            layer_names.append(layer.encode())

        for kind, idx in _unet_keras_layer_sequence():
            if kind == "conv":
                p = params[f"Conv_{idx}"]
                put(keras_name(kind, idx),
                    [("kernel", p["kernel"]), ("bias", p["bias"])])
            elif kind == "bn":
                name = f"BatchNorm_{idx}"
                put(keras_name(kind, idx),
                    [("gamma", params[name]["scale"]),
                     ("beta", params[name]["bias"]),
                     ("moving_mean", batch_stats[name]["mean"]),
                     ("moving_variance", batch_stats[name]["var"])])
            else:
                put("out", [("kernel", params["out"]["kernel"]),
                            ("bias", params["out"]["bias"])])
        mw.attrs["layer_names"] = np.array(layer_names)
