"""Parity vs REFERENCE-EXECUTED golden artifacts.

tests/golden/ref_exec/ was produced by running the ORIGINAL reference
code (functions.py:2832-3070 IM drivers with genuine unet.py get_unet
tf.keras models — see tools/make_reference_goldens.py).  Here the exact
same Keras .h5 checkpoints go through the keras-import bridge and our
fused TPU drivers regenerate the trees; every PNG must match
pixel-for-pixel and the mean IM sizes must be equal.

Determinism: the generator trained each model until every probability is
>= 1e-4 from its decision boundary; we re-assert that margin on OUR
probabilities, so the comparison cannot flake on cross-framework float
noise (measured forward atol ~2e-5)."""

import json
import os

import cv2
import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                    "ref_exec")
pytestmark = pytest.mark.skipif(not os.path.isdir(GOLD),
                                reason="reference goldens not generated")

H = W = 32
ALPHA = 0.25


def _meta():
    with open(os.path.join(GOLD, "meta.json")) as f:
        return json.load(f)


def _load_models(kind, channels, num_classes, out_act):
    import jax.numpy as jnp  # noqa: F401  (device selection via conftest)

    from inconsistencymasks_tpu.models.unet import UNet, create_unet
    from inconsistencymasks_tpu.train.keras_import import (
        keras_h5_to_unet_variables)

    module = UNet(num_classes=num_classes, alpha=ALPHA, activation="relu",
                  out_activation=out_act, compute_dtype=jnp.float32)
    _, template = create_unet(H, W, channels, num_classes, ALPHA, "relu",
                              out_act)
    models = []
    i = 0
    while os.path.isfile(os.path.join(GOLD, kind, f"model_{i}.h5")):
        models.append(keras_h5_to_unet_variables(
            os.path.join(GOLD, kind, f"model_{i}.h5"), template))
        i += 1
    assert len(models) >= 2
    return module, models


def _assert_margin(module, models, images_rgb, kind, margin):
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(lambda v, x: module.apply(v, x, train=False))
    for v in models:
        p = np.asarray(fwd(v, jnp.asarray(images_rgb)))
        if kind == "multiclass":
            s = np.sort(p, axis=-1)
            got = float((s[..., -1] - s[..., -2]).min())
        else:
            got = float(np.abs(p - 0.5).min())
        assert got > margin / 5, (
            f"{kind}: our margin {got:.2e} too close to the boundary — "
            "parity comparison would be float-noise luck")


def _tree_equal(ref_dir, got_dir):
    # a missing dir counts as empty: the reference writer mkdirs every
    # subdir but may write nothing into it (multiclass filters all six
    # toy images out of images/masks), and git cannot track empty dirs —
    # a fresh checkout of the fixture legitimately lacks them
    def names(d):
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    ref_names = names(ref_dir)
    got_names = names(got_dir)
    assert ref_names == got_names, (ref_dir, ref_names, got_names)
    for n in ref_names:
        a = cv2.imread(os.path.join(ref_dir, n), cv2.IMREAD_UNCHANGED)
        b = cv2.imread(os.path.join(got_dir, n), cv2.IMREAD_UNCHANGED)
        assert a is not None and b is not None, n
        np.testing.assert_array_equal(a, b, err_msg=f"{ref_dir}/{n}")


def _load_rgb_inputs(kind):
    imgs = []
    d = os.path.join(GOLD, kind, "images")
    for n in sorted(os.listdir(d)):
        im = cv2.imread(os.path.join(d, n))
        imgs.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB))
    return np.stack(imgs)


def test_binary_matches_reference_executed(tmp_path):
    from inconsistencymasks_tpu.pseudo.im import create_pseudo_labels_im_binary

    meta = _meta()
    module, models = _load_models("binary", 3, 1, "sigmoid")
    _assert_margin(module, models, _load_rgb_inputs("binary"), "binary",
                   meta["margin"])
    out = str(tmp_path / "out")
    mean = create_pseudo_labels_im_binary(
        module, models, os.path.join(GOLD, "binary", "images"), out,
        channels=3, threshold=0.5, erode_kernel=3, dilate_kernel=3,
        block_input=True, block_output=True, filter_bad_predictions=True,
        batch_size=4)
    assert mean == meta["binary_mean_im_size"]
    for sub in ("images", "masks", "im"):
        _tree_equal(os.path.join(GOLD, "binary", "out", sub),
                    os.path.join(out, sub))


def test_multiclass_matches_reference_executed(tmp_path):
    from inconsistencymasks_tpu.pseudo.im import (
        create_pseudo_labels_im_multiclass)

    meta = _meta()
    module, models = _load_models("multiclass", 3, 4, "softmax")
    _assert_margin(module, models, _load_rgb_inputs("multiclass"),
                   "multiclass", meta["margin"])
    out = str(tmp_path / "out")
    mean = create_pseudo_labels_im_multiclass(
        module, models, os.path.join(GOLD, "multiclass", "images"), out,
        num_classes=4, channels=3, erode_kernel=3, dilate_kernel=3,
        block_input=True, block_output=True,
        filter_unequal_class_pred=True, batch_size=4)
    assert mean == meta["multiclass_mean_im_size"]
    for sub in ("images", "masks", "im"):
        _tree_equal(os.path.join(GOLD, "multiclass", "out", sub),
                    os.path.join(out, sub))


def test_hela_matches_reference_executed(tmp_path):
    from inconsistencymasks_tpu.pseudo.im import create_pseudo_labels_im_hela

    meta = _meta()
    module, models = _load_models("hela", 1, 3, "sigmoid")
    imgs = []
    d = os.path.join(GOLD, "hela", "images")
    for n in sorted(os.listdir(d)):
        imgs.append(cv2.imread(os.path.join(d, n), 0)[..., None])
    _assert_margin(module, models, np.stack(imgs), "hela", meta["margin"])
    out = str(tmp_path / "out")
    mean = create_pseudo_labels_im_hela(
        module, models, d, out, threshold=0.5, erode_kernel=3,
        dilate_kernel=3, block_input=True, block_output=True,
        batch_size=4)
    assert mean == meta["hela_mean_im_size"]
    for sub in ("brightfield", "alive", "dead", "mod_position", "im"):
        _tree_equal(os.path.join(GOLD, "hela", "out", sub),
                    os.path.join(out, sub))
