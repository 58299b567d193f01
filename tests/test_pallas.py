"""Pallas IM-postprocess kernel vs the XLA reference path (interpret mode
on CPU), across the production (erode, dilate, block) grid, plus the
IM_PALLAS=1 production wiring in pseudo/im.py."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from inconsistencymasks_tpu.ops import im_core, morphology
from inconsistencymasks_tpu.ops.pallas import fused_im_postprocess_binary


@pytest.mark.parametrize("k,ek,dk", [(2, 0, 0), (3, 0, 3), (4, 3, 0),
                                     (2, 3, 3), (2, 5, 5), (3, 0, 5)])
def test_pallas_matches_xla_path(rng, k, ek, dk):
    b, h, w, c = 2, 64, 128, 3
    probs = jnp.asarray(rng.rand(k, b, h, w, 1).astype(np.float32))
    images = jnp.asarray(rng.randint(0, 255, (b, h, w, c)).astype(np.uint8))

    img_p, mask_p, im_p, ims_p, ps_p = fused_im_postprocess_binary(
        probs, images, 0.5, erode_kernel=ek, dilate_kernel=dk,
        interpret=True)

    masks = im_core.probs_to_binary_masks(probs, 0.5)
    out = im_core.binary_im(masks)
    im_ref = out.im
    if ek > 0:
        im_ref = morphology.erode(im_ref, ek)
    if dk > 0:
        im_ref = morphology.dilate(im_ref, dk)
    img_ref, mask_ref = im_core.blockout_binary(images, out.pred_mask,
                                                im_ref, True, True)

    assert np.array_equal(np.asarray(img_p), np.asarray(img_ref))
    assert np.array_equal(np.asarray(mask_p),
                          np.asarray(mask_ref[..., 0]))
    assert np.array_equal(np.asarray(im_p), np.asarray(im_ref))
    assert np.array_equal(np.asarray(ims_p), np.asarray(out.im_size))
    assert np.array_equal(np.asarray(ps_p), np.asarray(out.pred_size))


@pytest.mark.parametrize("bi,bo", [(True, False), (False, True)])
def test_pallas_block_flags(rng, bi, bo):
    k, b, h, w, c = 2, 2, 64, 128, 3
    probs = jnp.asarray(rng.rand(k, b, h, w, 1).astype(np.float32))
    images = jnp.asarray(rng.randint(0, 255, (b, h, w, c)).astype(np.uint8))
    img_p, mask_p, im_p, _, _ = fused_im_postprocess_binary(
        probs, images, 0.5, dilate_kernel=3, block_input=bi,
        block_output=bo, interpret=True)
    masks = im_core.probs_to_binary_masks(probs, 0.5)
    out = im_core.binary_im(masks)
    im_ref = morphology.dilate(out.im, 3)
    img_ref, mask_ref = im_core.blockout_binary(images, out.pred_mask,
                                                im_ref, bi, bo)
    assert np.array_equal(np.asarray(img_p), np.asarray(img_ref))
    assert np.array_equal(np.asarray(mask_p), np.asarray(mask_ref[..., 0]))


def test_im_pallas_production_wiring(tmp_path, monkeypatch):
    """create_pseudo_labels_im_binary(IM_PALLAS=1) writes the same file
    tree as the XLA path (interpret-mode Pallas on CPU)."""
    import cv2

    from inconsistencymasks_tpu.data.synthetic import make_binary_dataset
    from inconsistencymasks_tpu.models.unet import UNet
    from inconsistencymasks_tpu.ops.pallas import im_postproc
    from inconsistencymasks_tpu.pseudo import create_pseudo_labels_im_binary
    from inconsistencymasks_tpu.train.checkpoint import unstack_variables
    from inconsistencymasks_tpu.train.population import init_population

    base = str(tmp_path / "d")
    make_binary_dataset(base, h=32, w=32, n_labeled=6)
    images_dir = os.path.join(base, "train_labeled", "images")
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    models = unstack_variables(init_population(m, 32, 32, 3, 2, 5), 2)

    orig = im_postproc.fused_im_postprocess_binary.__wrapped__
    outs = {}
    for tag, env in (("xla", "0"), ("pallas", "1")):
        monkeypatch.setenv("IM_PALLAS", env)
        if env == "1":
            # interpret mode on CPU (no Mosaic backend)
            monkeypatch.setattr(
                im_postproc, "fused_im_postprocess_binary",
                lambda *a, **kw: orig(*a, **dict(kw, interpret=True)))
        out = str(tmp_path / tag)
        size = create_pseudo_labels_im_binary(
            m, models, images_dir, out, dilate_kernel=3, batch_size=4)
        outs[tag] = (out, size)
    assert outs["xla"][1] == outs["pallas"][1]
    for sub in ("images", "masks", "im"):
        a_dir = os.path.join(outs["xla"][0], sub)
        b_dir = os.path.join(outs["pallas"][0], sub)
        assert sorted(os.listdir(a_dir)) == sorted(os.listdir(b_dir))
        for n in os.listdir(a_dir):
            a = cv2.imread(os.path.join(a_dir, n), cv2.IMREAD_UNCHANGED)
            b = cv2.imread(os.path.join(b_dir, n), cv2.IMREAD_UNCHANGED)
            assert np.array_equal(a, b), (sub, n)


@pytest.mark.parametrize("k,ek,dk,bo", [(2, 0, 0, True), (3, 3, 0, True),
                                        (2, 0, 3, False), (3, 3, 3, True)])
def test_pallas_multiclass_matches_xla(rng, k, ek, dk, bo):
    from inconsistencymasks_tpu.ops.pallas import (
        fused_im_postprocess_multiclass)

    nc, b, h, w = 6, 2, 64, 128
    class_maps = jnp.asarray(
        rng.randint(0, nc, (k, b, h, w)).astype(np.int32))

    pred_p, hole_p, ims_p = fused_im_postprocess_multiclass(
        class_maps, ek, dk, num_classes=nc, block_output=bo,
        interpret=True)

    out = im_core.multiclass_im(class_maps)
    im_ref = out.im
    pred_ref = out.pred_mask
    if ek > 0:
        im_ref = morphology.erode(im_ref, ek)
        pred_ref = morphology.dilate_multiclass(
            pred_ref.astype(jnp.int32), nc).astype(jnp.uint8)
    if dk > 0:
        im_ref = morphology.dilate(im_ref, dk)
    hole_ref = im_ref > 0
    if bo:
        pred_ref = jnp.where(hole_ref, jnp.uint8(0), pred_ref)

    assert np.array_equal(np.asarray(pred_p), np.asarray(pred_ref))
    assert np.array_equal(np.asarray(hole_p),
                          np.asarray(hole_ref).astype(np.uint8))
    assert np.array_equal(np.asarray(ims_p), np.asarray(out.im_size))


@pytest.mark.parametrize("k,ek,dk", [(2, 0, 0), (3, 3, 0), (2, 0, 3),
                                     (3, 3, 3)])
def test_pallas_hela_matches_xla(rng, k, ek, dk):
    from inconsistencymasks_tpu.ops import bitpack
    from inconsistencymasks_tpu.ops.pallas import fused_im_postprocess_hela
    from inconsistencymasks_tpu.pseudo.im import _fused_im_hela

    b, h, w = 2, 64, 128
    probs = jnp.asarray(rng.rand(k, b, h, w, 3).astype(np.float32))
    images = jnp.asarray(rng.randint(0, 255, (b, h, w, 1)).astype(np.uint8))

    planes_p, ims_p = fused_im_postprocess_hela(
        probs, 0.5, erode_kernel=ek, dilate_kernel=dk, interpret=True)

    bits_ref, ims_ref = _fused_im_hela(probs, images, 0.5, ek, dk)
    planes_ref = bitpack.unpackbits2d(np.asarray(bits_ref), w) * np.uint8(255)

    assert np.array_equal(np.asarray(planes_p), planes_ref)
    assert np.array_equal(np.asarray(ims_p), np.asarray(ims_ref))


@pytest.mark.parametrize("kind", ["multiclass", "hela"])
def test_im_pallas_production_wiring_mc_hela(tmp_path, monkeypatch, kind):
    """The multiclass/HeLa generation drivers write identical trees under
    IM_PALLAS=1 (interpret-mode Pallas) and the XLA path."""
    import cv2

    from inconsistencymasks_tpu.data.synthetic import (make_binary_dataset,
                                                       make_hela_dataset,
                                                       make_multiclass_dataset)
    from inconsistencymasks_tpu.models.unet import UNet
    from inconsistencymasks_tpu.ops.pallas import im_postproc
    from inconsistencymasks_tpu.pseudo import (
        create_pseudo_labels_im_hela, create_pseudo_labels_im_multiclass)
    from inconsistencymasks_tpu.train.checkpoint import unstack_variables
    from inconsistencymasks_tpu.train.population import init_population

    base = str(tmp_path / "d")
    if kind == "multiclass":
        make_multiclass_dataset(base, h=32, w=32, n_labeled=6, num_classes=5)
        images_dir = os.path.join(base, "train_labeled", "images")
        m = UNet(num_classes=5, alpha=0.25, activation="relu",
                 out_activation="softmax")
        models = unstack_variables(init_population(m, 32, 32, 3, 2, 5), 2)
        run = lambda out: create_pseudo_labels_im_multiclass(
            m, models, images_dir, out, num_classes=5, erode_kernel=3,
            dilate_kernel=0, batch_size=4)
        subs = ("images", "masks", "im")
    else:
        make_hela_dataset(base, h=32, w=32, n_labeled=6)
        images_dir = os.path.join(base, "train_labeled", "brightfield")
        m = UNet(num_classes=3, alpha=0.25, activation="relu",
                 out_activation="sigmoid")
        models = unstack_variables(init_population(m, 32, 32, 1, 2, 5), 2)
        run = lambda out: create_pseudo_labels_im_hela(
            m, models, images_dir, out, dilate_kernel=3, batch_size=4)
        subs = ("brightfield", "alive", "dead", "mod_position", "im")

    orig_mc = im_postproc.fused_im_postprocess_multiclass.__wrapped__
    orig_hela = im_postproc.fused_im_postprocess_hela.__wrapped__
    outs = {}
    for tag, env in (("xla", "0"), ("pallas", "1")):
        monkeypatch.setenv("IM_PALLAS", env)
        if env == "1":
            monkeypatch.setattr(
                im_postproc, "fused_im_postprocess_multiclass",
                lambda *a, **kw: orig_mc(*a, **dict(kw, interpret=True)))
            monkeypatch.setattr(
                im_postproc, "fused_im_postprocess_hela",
                lambda *a, **kw: orig_hela(*a, **dict(kw, interpret=True)))
        out = str(tmp_path / (kind + tag))
        outs[tag] = (out, run(out))
    assert outs["xla"][1] == outs["pallas"][1]
    for sub in subs:
        a_dir = os.path.join(outs["xla"][0], sub)
        b_dir = os.path.join(outs["pallas"][0], sub)
        assert sorted(os.listdir(a_dir)) == sorted(os.listdir(b_dir))
        for n in os.listdir(a_dir):
            a = cv2.imread(os.path.join(a_dir, n), cv2.IMREAD_UNCHANGED)
            b = cv2.imread(os.path.join(b_dir, n), cv2.IMREAD_UNCHANGED)
            assert np.array_equal(a, b), (sub, n)
