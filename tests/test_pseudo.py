"""Pseudo-label generator tests: output layout, filter semantics, and
IM math through the fused device path."""

import os

import cv2
import numpy as np
import jax
import pytest

from inconsistencymasks_tpu.data.loader import list_pngs
from inconsistencymasks_tpu.data.synthetic import (make_binary_dataset,
                                                   make_hela_dataset,
                                                   make_multiclass_dataset)
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.pseudo import (
    StackedEnsemble,
    create_pseudo_labels_im_binary,
    create_pseudo_labels_im_hela,
    create_pseudo_labels_im_multiclass,
    create_pseudo_labels_input_ensemble_binary,
    create_pseudo_labels_model_ensemble_binary,
    create_pseudo_labels_model_ensemble_multiclass,
    create_pseudo_labels_noisy_student_binary,
)
from inconsistencymasks_tpu.train.population import init_population
from inconsistencymasks_tpu.train.checkpoint import unstack_variables


def _binary_setup(tmp_path, k=2):
    make_binary_dataset(str(tmp_path / "data"), h=32, w=32, n_unlabeled=6)
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    models = unstack_variables(init_population(m, 32, 32, 3, k), k)
    return m, models, str(tmp_path / "data" / "train_unlabeled" / "images")


def test_im_binary_outputs(tmp_path):
    m, models, images_dir = _binary_setup(tmp_path)
    out = str(tmp_path / "out")
    mean_im = create_pseudo_labels_im_binary(
        m, models, images_dir, out, filter_bad_predictions=False,
        batch_size=4)
    assert isinstance(mean_im, float)
    # every input produced an im PNG; images/masks written (no filter)
    assert len(list_pngs(os.path.join(out, "im"))) == 6
    assert len(list_pngs(os.path.join(out, "images"))) == 6
    # masks are binary {0, 255}
    mask = cv2.imread(os.path.join(out, "masks",
                                   list_pngs(os.path.join(out, "masks"))[0]),
                      0)
    assert set(np.unique(mask)).issubset({0, 255})
    # blockout invariant: blocked image is 0 wherever im > 0
    name = list_pngs(os.path.join(out, "im"))[0]
    im = cv2.imread(os.path.join(out, "im", name), 0)
    img = cv2.imread(os.path.join(out, "images", name))
    assert (img[im > 0] == 0).all()


def test_im_binary_filter_semantics(tmp_path):
    """filter_bad_predictions: images/masks written only when
    predsize > im_size and predsize > 0 (functions.py:2878-2882); im always."""
    m, models, images_dir = _binary_setup(tmp_path)
    out = str(tmp_path / "out_f")
    create_pseudo_labels_im_binary(m, models, images_dir, out,
                                   filter_bad_predictions=True, batch_size=4)
    n_im = len(list_pngs(os.path.join(out, "im")))
    n_img = len(list_pngs(os.path.join(out, "images")))
    assert n_im == 6
    assert n_img <= n_im
    assert len(list_pngs(os.path.join(out, "masks"))) == n_img


def test_im_multiclass_outputs(tmp_path):
    make_multiclass_dataset(str(tmp_path / "data"), num_classes=5, h=32,
                            w=32, n_unlabeled=6)
    m = UNet(num_classes=5, alpha=0.25, activation="relu",
             out_activation="softmax")
    models = unstack_variables(init_population(m, 32, 32, 3, 2), 2)
    out = str(tmp_path / "out")
    create_pseudo_labels_im_multiclass(
        m, models, str(tmp_path / "data" / "train_unlabeled" / "images"),
        out, num_classes=5, batch_size=4)
    names = list_pngs(os.path.join(out, "masks"))
    assert len(names) == 6
    mask = cv2.imread(os.path.join(out, "masks", names[0]), 0)
    assert mask.max() < 5
    im = cv2.imread(os.path.join(out, "im", names[0]), 0)
    # class-0 (IM class) pixels of the mask must cover disagreements
    assert (mask[im > 0] == 0).all()


def test_im_hela_outputs(tmp_path):
    make_hela_dataset(str(tmp_path / "data"), h=32, w=32, n_unlabeled=4)
    m = UNet(num_classes=3, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    models = unstack_variables(init_population(m, 32, 32, 1, 2), 2)
    out = str(tmp_path / "out")
    create_pseudo_labels_im_hela(
        m, models,
        str(tmp_path / "data" / "train_unlabeled" / "brightfield"),
        out, batch_size=2)
    for chan in ("brightfield", "alive", "dead", "mod_position", "im"):
        assert len(list_pngs(os.path.join(out, chan))) == 4


def test_model_ensemble_binary_unanimous(tmp_path):
    m, models, images_dir = _binary_setup(tmp_path, k=3)
    out = str(tmp_path / "out")
    create_pseudo_labels_model_ensemble_binary(m, models, images_dir, out,
                                               batch_size=4)
    assert len(list_pngs(os.path.join(out, "masks"))) == 6


def test_model_ensemble_multiclass_soft_vs_hard(tmp_path):
    make_multiclass_dataset(str(tmp_path / "data"), num_classes=4, h=32,
                            w=32, n_unlabeled=4)
    m = UNet(num_classes=4, alpha=0.25, activation="relu",
             out_activation="softmax")
    models = unstack_variables(init_population(m, 32, 32, 3, 2), 2)
    img_dir = str(tmp_path / "data" / "train_unlabeled" / "images")
    create_pseudo_labels_model_ensemble_multiclass(
        m, models, img_dir, str(tmp_path / "soft"), soft=True, batch_size=4)
    create_pseudo_labels_model_ensemble_multiclass(
        m, models, img_dir, str(tmp_path / "hard"), soft=False, batch_size=4)
    for d in ("soft", "hard"):
        assert len(list_pngs(str(tmp_path / d / "masks"))) == 4


def test_input_ensemble_binary(tmp_path):
    m, models, images_dir = _binary_setup(tmp_path, k=1)
    out = str(tmp_path / "out")
    create_pseudo_labels_input_ensemble_binary(
        m, models[0], images_dir, out, n=3,
        use_n_rnd_transformations=True, batch_size=3)
    # unanimity vote over noisy views may legitimately filter everything;
    # just assert the writer ran and produced <= inputs and binary masks
    names = list_pngs(os.path.join(out, "masks"))
    assert len(names) <= 6
    for n in names:
        u = set(np.unique(cv2.imread(os.path.join(out, "masks", n), 0)))
        assert u.issubset({0, 255})


def test_noisy_student_binary(tmp_path):
    m, models, images_dir = _binary_setup(tmp_path, k=1)
    out = str(tmp_path / "out")
    create_pseudo_labels_noisy_student_binary(
        m, models[0], images_dir, out, batch_size=3, max_noise=10)
    assert len(list_pngs(os.path.join(out, "images"))) == 6
    assert len(list_pngs(os.path.join(out, "masks"))) == 6


def test_stacked_ensemble_matches_individual(tmp_path):
    """Fused K-model inference must equal K separate forwards."""
    import jax.numpy as jnp
    m = UNet(num_classes=1, alpha=0.25, activation="relu",
             out_activation="sigmoid")
    models = unstack_variables(init_population(m, 32, 32, 3, 2), 2)
    ens = StackedEnsemble(m, models)
    x = jnp.asarray(np.random.RandomState(0)
                    .randint(0, 255, (2, 32, 32, 3)).astype(np.uint8))
    fused = np.asarray(ens.predict_probs(x))
    for k in range(2):
        single = np.asarray(jax.jit(
            lambda v, x: m.apply(v, x, train=False))(models[k], x))
        assert np.allclose(fused[k], single, atol=1e-5)


def test_im_binary_deterministic(tmp_path):
    """Two runs over the same inputs produce byte-identical PNGs (the
    deterministic IM path is the bit-for-bit parity surface)."""
    import hashlib
    m, models, images_dir = _binary_setup(tmp_path)
    outs = []
    for run in ("a", "b"):
        out = str(tmp_path / f"det_{run}")
        create_pseudo_labels_im_binary(m, models, images_dir, out,
                                       filter_bad_predictions=False,
                                       batch_size=3)
        digest = {}
        for sub in ("images", "masks", "im"):
            for n in list_pngs(os.path.join(out, sub)):
                with open(os.path.join(out, sub, n), "rb") as f:
                    digest[f"{sub}/{n}"] = hashlib.sha256(
                        f.read()).hexdigest()
        outs.append(digest)
    assert outs[0] == outs[1]


def test_noisy_student_multiclass_and_hela(tmp_path):
    """Packed-download noisy-student writers: multiclass class maps are
    nibble-packed (and survive values > background), HeLa emits the four
    _aug-suffixed channel trees with redrawn position circles."""
    from inconsistencymasks_tpu.data.synthetic import (make_hela_dataset,
                                                       make_multiclass_dataset)
    from inconsistencymasks_tpu.pseudo import (
        create_pseudo_labels_noisy_student_hela,
        create_pseudo_labels_noisy_student_multiclass)

    make_multiclass_dataset(str(tmp_path / "mc"), num_classes=9, h=32, w=32,
                            n_unlabeled=5)
    m = UNet(num_classes=9, alpha=0.25, activation="relu",
             out_activation="softmax")
    models = unstack_variables(init_population(m, 32, 32, 3, 1), 1)
    out = str(tmp_path / "mc_out")
    create_pseudo_labels_noisy_student_multiclass(
        m, models[0], str(tmp_path / "mc" / "train_unlabeled" / "images"),
        out, num_classes=9, batch_size=2, max_noise=10)
    names = list_pngs(os.path.join(out, "masks"))
    assert len(names) == 5
    for n in names:
        u = np.unique(cv2.imread(os.path.join(out, "masks", n), 0))
        assert u.max() < 9

    make_hela_dataset(str(tmp_path / "hela"), h=32, w=32, n_unlabeled=4)
    mh = UNet(num_classes=3, alpha=0.25, activation="relu",
              out_activation="sigmoid")
    hmodels = unstack_variables(init_population(mh, 32, 32, 1, 1), 1)
    hout = str(tmp_path / "hela_out")
    create_pseudo_labels_noisy_student_hela(
        mh, hmodels[0],
        str(tmp_path / "hela" / "train_unlabeled" / "brightfield"),
        hout, batch_size=2, max_noise=10)
    for chan in ("brightfield", "alive", "dead", "mod_position"):
        names = list_pngs(os.path.join(hout, chan))
        assert len(names) == 4 and all(n.endswith("_aug.png")
                                       for n in names)
