"""End-to-end golden-file parity for the deterministic IM path.

A NumPy/cv2 oracle transcribing the reference host semantics
(functions.py:3104-3137 pred/IM math, 2858-2864 cv2 morphology,
2867-2887 blockout + write filter) consumes the SAME model probabilities
as the fused device path and writes the expected PNG tree; the production
drivers must reproduce every file byte-for-byte (pixel-exact decoded
arrays AND the same file sets) for (EK, DK) in {0,3,5}^2 across all three
dataset kinds.
"""

import os

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from inconsistencymasks_tpu.data.loader import list_pngs, load_images
from inconsistencymasks_tpu.data.synthetic import (make_binary_dataset,
                                                   make_hela_dataset,
                                                   make_multiclass_dataset)
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.pseudo import (create_pseudo_labels_im_binary,
                                           create_pseudo_labels_im_hela,
                                           create_pseudo_labels_im_multiclass)
from inconsistencymasks_tpu.pseudo.engine import StackedEnsemble
from inconsistencymasks_tpu.train.checkpoint import unstack_variables
from inconsistencymasks_tpu.train.population import init_population

KERNELS = [(0, 0), (3, 0), (0, 5), (3, 5), (5, 3), (5, 5)]


def _cmp_tree(oracle_dir, got_dir, subs):
    for sub in subs:
        o = list_pngs(os.path.join(oracle_dir, sub))
        g = list_pngs(os.path.join(got_dir, sub))
        assert o == g, f"{sub}: file sets differ: {o} vs {g}"
        for name in o:
            a = cv2.imread(os.path.join(oracle_dir, sub, name),
                           cv2.IMREAD_UNCHANGED)
            b = cv2.imread(os.path.join(got_dir, sub, name),
                           cv2.IMREAD_UNCHANGED)
            np.testing.assert_array_equal(a, b, err_msg=f"{sub}/{name}")


def _morph(im, ek, dk):
    if ek > 0:
        im = cv2.erode(im, np.ones((ek, ek), "uint8"), iterations=1)
    if dk > 0:
        im = cv2.dilate(im, np.ones((dk, dk), "uint8"), iterations=1)
    return im


@pytest.fixture(scope="module")
def binary_setup(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("golden_bin"))
    make_binary_dataset(tmp, h=32, w=32, n_labeled=6, n_val=2, n_test=2,
                        n_unlabeled=2)
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    models = unstack_variables(init_population(m, 32, 32, 3, 2, 9), 2)
    images_dir = os.path.join(tmp, "train_labeled", "images")
    ens = StackedEnsemble(m, models)
    ds = load_images(images_dir, 3)
    probs = np.asarray(ens.predict_probs(jnp.asarray(ds.images)))
    return tmp, m, models, images_dir, ds, probs


@pytest.mark.parametrize("ek,dk", KERNELS)
def test_golden_binary(binary_setup, tmp_path, ek, dk):
    tmp, m, models, images_dir, ds, probs = binary_setup
    # ---- oracle (reference functions.py:2832-2891)
    oracle = str(tmp_path / "oracle")
    for sub in ("images", "masks", "im"):
        os.makedirs(os.path.join(oracle, sub))
    k = probs.shape[0]
    for i, name in enumerate(ds.names):
        votes = (probs[:, i, ..., 0] > 0.5).astype(int).sum(axis=0)
        pred = np.where(votes == k, 255, 0).astype(np.uint8)
        im = np.where((votes != 0) & (votes != k), 255, 0).astype(np.uint8)
        pred_size = int((pred > 0).sum())
        im_size = int((im > 0).sum())
        im = _morph(im, ek, dk)
        image = cv2.imread(os.path.join(images_dir, name))  # BGR like ref
        image[im > 0] = [0, 0, 0]
        pred = pred.copy()
        pred[im > 0] = 0
        if pred_size > im_size and pred_size > 0:
            cv2.imwrite(os.path.join(oracle, "images", name), image)
            cv2.imwrite(os.path.join(oracle, "masks", name), pred)
        cv2.imwrite(os.path.join(oracle, "im", name), im)

    got = str(tmp_path / "got")
    create_pseudo_labels_im_binary(
        m, models, images_dir, got, erode_kernel=ek, dilate_kernel=dk,
        batch_size=4)
    _cmp_tree(oracle, got, ("images", "masks", "im"))


@pytest.mark.parametrize("ek,dk", [(0, 0), (0, 5), (5, 5)])
def test_golden_multiclass(tmp_path, ek, dk):
    nc = 5
    tmp = str(tmp_path / "data")
    make_multiclass_dataset(tmp, num_classes=nc, h=32, w=32, n_labeled=6,
                            n_val=2, n_test=2, n_unlabeled=2)
    m = UNet(num_classes=nc, alpha=0.25, activation="relu",
             out_activation="softmax")
    models = unstack_variables(init_population(m, 32, 32, 3, 3, 5), 3)
    images_dir = os.path.join(tmp, "train_labeled", "images")
    ens = StackedEnsemble(m, models)
    ds = load_images(images_dir, 3)
    probs = np.asarray(ens.predict_probs(jnp.asarray(ds.images)))

    # ---- oracle (functions.py:3123-3137 + 2988-3070)
    oracle = str(tmp_path / "oracle")
    for sub in ("images", "masks", "im"):
        os.makedirs(os.path.join(oracle, sub))
    cms = probs.argmax(axis=-1)                      # (K,B,H,W)
    for i, name in enumerate(ds.names):
        cm = cms[:, i]
        agree = np.all(cm == cm[0], axis=0)
        pred = np.where(agree, cm[0], 0).astype(np.uint8)
        im = np.where(agree, 0, 255).astype(np.uint8)
        if ek > 0:
            im = cv2.erode(im, np.ones((ek, ek), "uint8"), iterations=1)
            # reference 3x3-dilates the pred when eroding (3043-3047)
            pred = cv2.dilate(pred, np.ones((3, 3), "uint8"), iterations=1)
        if dk > 0:
            im = cv2.dilate(im, np.ones((dk, dk), "uint8"), iterations=1)
        image = cv2.imread(os.path.join(images_dir, name))
        image[im > 0] = [0, 0, 0]
        pred[im > 0] = 0
        cv2.imwrite(os.path.join(oracle, "images", name), image)
        cv2.imwrite(os.path.join(oracle, "masks", name), pred)
        cv2.imwrite(os.path.join(oracle, "im", name), im)

    got = str(tmp_path / "got")
    create_pseudo_labels_im_multiclass(
        m, models, images_dir, got, num_classes=nc, erode_kernel=ek,
        dilate_kernel=dk, batch_size=4)
    _cmp_tree(oracle, got, ("images", "masks", "im"))


@pytest.mark.parametrize("ek,dk", [(0, 0), (5, 5)])
def test_golden_hela(tmp_path, ek, dk):
    from inconsistencymasks_tpu.postproc.hela import (get_min_dist,
                                                      get_pos_contours)

    tmp = str(tmp_path / "data")
    make_hela_dataset(tmp, h=64, w=64, n_labeled=5, n_val=2)
    m = UNet(num_classes=3, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    models = unstack_variables(init_population(m, 64, 64, 1, 2, 3), 2)
    images_dir = os.path.join(tmp, "train_labeled", "brightfield")
    ens = StackedEnsemble(m, models)
    ds = load_images(images_dir, 1)
    probs = np.asarray(ens.predict_probs(jnp.asarray(ds.images)))

    # ---- oracle (functions.py:2895-2984 + 3165-3238): per-channel
    # unanimity with >= threshold; combined IM = max over channel IMs
    oracle = str(tmp_path / "oracle")
    subs = ("brightfield", "alive", "dead", "mod_position", "im")
    for sub in subs:
        os.makedirs(os.path.join(oracle, sub))
    k = probs.shape[0]
    for i, name in enumerate(ds.names):
        votes = (probs[:, i] >= 0.5).astype(int).sum(axis=0)  # (H,W,3)
        preds = np.where(votes == k, 255, 0).astype(np.uint8)
        ims = np.where((votes != 0) & (votes != k), 255, 0).astype(np.uint8)
        im = ims.max(axis=-1)
        alive, dead, pos_raw = preds[..., 0], preds[..., 1], preds[..., 2]
        if ek > 0:
            im = cv2.erode(im, np.ones((ek, ek), "uint8"), iterations=1)
            alive = cv2.dilate(alive, np.ones((3, 3), "uint8"),
                               iterations=1)
            dead = cv2.dilate(dead, np.ones((3, 3), "uint8"), iterations=1)
        if dk > 0:
            im = cv2.dilate(im, np.ones((dk, dk), "uint8"), iterations=1)
        positions = get_pos_contours(pos_raw)
        pos_mask = np.zeros((64, 64, 3), np.uint8)
        for p in positions:
            md = get_min_dist(p, positions) if len(positions) > 1 else 99
            size = max(min(int(md // 4), 8), 3)
            cv2.circle(pos_mask, (p[0], p[1]), size, (255, 255, 255), -1)
        bf = cv2.imread(os.path.join(images_dir, name), 0)
        bf[im > 0] = 0
        alive = alive.copy()
        alive[im > 0] = 0
        dead = dead.copy()
        dead[im > 0] = 0
        pos_mask[im > 0] = 0
        cv2.imwrite(os.path.join(oracle, "brightfield", name), bf)
        cv2.imwrite(os.path.join(oracle, "alive", name), alive)
        cv2.imwrite(os.path.join(oracle, "dead", name), dead)
        cv2.imwrite(os.path.join(oracle, "mod_position", name), pos_mask)
        cv2.imwrite(os.path.join(oracle, "im", name), im)

    got = str(tmp_path / "got")
    create_pseudo_labels_im_hela(
        m, models, images_dir, got, erode_kernel=ek, dilate_kernel=dk,
        batch_size=4)
    _cmp_tree(oracle, got, subs)
