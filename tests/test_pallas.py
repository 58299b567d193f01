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
