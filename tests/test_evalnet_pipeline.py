"""EvalNet pipeline end-to-end: datagen -> train -> filter -> adaptive aug.
EvalNet needs >=64 px inputs (6 maxpools)."""

import os

import numpy as np
import pytest

from inconsistencymasks_tpu.data.loader import (list_pngs,
                                                load_image_mask_dataset)
from inconsistencymasks_tpu.data.synthetic import make_binary_dataset
from inconsistencymasks_tpu.evalnet_pipeline import (
    EvalNetTrainer, create_augment_images_and_masks_with_evalnet_binary,
    create_augment_images_and_masks_with_gt,
    create_training_data_evalnet_binary,
    create_training_data_evalnet_im_binary,
    create_training_data_for_segnet_binary, load_evalnet_dataset_binary)
from inconsistencymasks_tpu.evalnet_pipeline.adaptive_aug import \
    num_augs_from_score
from inconsistencymasks_tpu.evaluate.benchmark import benchmark_binary
from inconsistencymasks_tpu.models.evalnet import EvalNet
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.checkpoint import unstack_variables
from inconsistencymasks_tpu.train.population import (init_population,
                                                     init_population_evalnet)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("evalnet"))
    make_binary_dataset(tmp, h=64, w=64, n_labeled=6, n_val=4, n_unlabeled=4)
    unet = UNet(num_classes=1, alpha=0.25, activation="relu",
                out_activation="sigmoid")
    teachers = unstack_variables(init_population(unet, 64, 64, 3, 4), 4)
    return tmp, unet, teachers


def test_num_augs_interpolation():
    """The 1..5 linear rule (reference functions.py:5742-5751)."""
    assert num_augs_from_score(0.80, 0.5, 0.75) == 5
    assert num_augs_from_score(0.40, 0.5, 0.75) == 1
    assert num_augs_from_score(0.52, 0.5, 0.75) == 1
    assert num_augs_from_score(0.62, 0.5, 0.75) == 3
    assert num_augs_from_score(0.74, 0.5, 0.75) == 5


def test_checkpoint_datagen_naming(pipeline):
    tmp, unet, teachers = pipeline
    out = os.path.join(tmp, "dg")
    create_training_data_evalnet_binary(
        unet, teachers[0], os.path.join(tmp, "train_labeled", "images"),
        os.path.join(tmp, "train_labeled", "masks"), out, i=0, batch_size=3)
    masks = list_pngs(os.path.join(out, "masks"))
    # 6 predictions named ___0 + 6 copied GT pairs
    assert sum("___0" in n for n in masks) == 6
    assert len(masks) == 12
    labels = open(os.path.join(out, "labels.csv")).read().splitlines()
    assert len(labels) == 12
    assert any(";1.0" in l for l in labels)  # GT rows labelled 1.0


def test_full_pipeline(pipeline):
    tmp, unet, teachers = pipeline
    tr_dir, va_dir = os.path.join(tmp, "ev_tr"), os.path.join(tmp, "ev_va")
    create_training_data_evalnet_im_binary(
        unet, teachers, os.path.join(tmp, "train_labeled", "images"),
        os.path.join(tmp, "train_labeled", "masks"), tr_dir, num_loops=2,
        batch_size=3)
    create_training_data_evalnet_im_binary(
        unet, teachers, os.path.join(tmp, "val", "images"),
        os.path.join(tmp, "val", "masks"), va_dir, num_loops=1,
        batch_size=2)
    assert len(list_pngs(os.path.join(tr_dir, "masks"))) == 12

    ev = EvalNet(alpha=0.5, activation="relu")
    ev_vars = init_population_evalnet(ev, 64, 64, 3, 1, population=2,
                                      identical=True)
    trainer = EvalNetTrainer(ev, ev_vars, two_head=False,
                             learning_rate=3e-3, weight_decay=1e-4)
    trainer.fit(load_evalnet_dataset_binary(tr_dir),
                load_evalnet_dataset_binary(va_dir), epochs=2, batch_size=4,
                log=None)
    assert np.all(np.isfinite(trainer.best_metrics()))

    unl = load_image_mask_dataset(os.path.join(tmp, "train_unlabeled",
                                               "images"))
    pred_dirs = []
    for i in range(2):
        d = os.path.join(tmp, f"preds_{i}")
        benchmark_binary(unet, teachers[i], unl, pred_dir=d)
        pred_dirs.append(d)

    best_evs = trainer.best_variables()
    n_acc = create_training_data_for_segnet_binary(
        ev, best_evs, os.path.join(tmp, "train_unlabeled", "images"),
        pred_dirs, os.path.join(tmp, "segnet"), threshold=0.0, batch_size=2)
    assert n_acc == 4  # threshold 0 accepts everything

    n_rej = create_training_data_for_segnet_binary(
        ev, best_evs, os.path.join(tmp, "train_unlabeled", "images"),
        pred_dirs, os.path.join(tmp, "segnet_hi"), threshold=1.1,
        batch_size=2)
    assert n_rej == 0  # threshold > 1 rejects everything (sigmoid scores)

    create_augment_images_and_masks_with_evalnet_binary(
        ev, best_evs, os.path.join(tmp, "segnet"),
        os.path.join(tmp, "segnet_aug"), min_threshold=0.3,
        max_threshold=0.7, batch_size=2)
    n_out = len(list_pngs(os.path.join(tmp, "segnet_aug", "images")))
    assert 4 <= n_out <= 20  # 1..5 copies per accepted image


def test_gt_oracle_aug(pipeline, tmp_path):
    """GT-IM++ oracle scores by true IoU (multiclass path, binary-ish gt)."""
    tmp, unet, teachers = pipeline
    # reuse segnet output from test_full_pipeline ordering not guaranteed;
    # build a tiny input set instead
    import cv2
    src = str(tmp_path / "in")
    gtd = str(tmp_path / "gt")
    os.makedirs(os.path.join(src, "images"))
    os.makedirs(os.path.join(src, "masks"))
    os.makedirs(gtd)
    rng = np.random.RandomState(0)
    for i in range(3):
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        mask = rng.randint(0, 3, (64, 64)).astype(np.uint8)
        cv2.imwrite(os.path.join(src, "images", f"x{i}.png"), img)
        cv2.imwrite(os.path.join(src, "masks", f"x{i}.png"), mask)
        cv2.imwrite(os.path.join(gtd, f"x{i}.png"), mask)  # perfect pred
    out = str(tmp_path / "out")
    create_augment_images_and_masks_with_gt(
        src, gtd, out, num_classes=3, min_threshold=0.3, max_threshold=0.7,
        batch_size=2)
    # perfect IoU -> 5 copies each
    assert len(list_pngs(os.path.join(out, "images"))) == 15


def test_hela_checkpoint_miou_datagen(tmp_path):
    """Reference create_training_data_evalnet_miou_hela semantics
    (functions.py:4011-4135): ___i pred names per channel dir, labels.csv
    rows (name, iou_a, iou_d, iou_p, det_a, det_d, det_p) with the
    1%/1%/0.1% detection rule, IoU zeroed when undetected, i==0 GT copies
    with the stale-detection quirk."""
    import csv

    from inconsistencymasks_tpu.data.synthetic import make_hela_dataset
    from inconsistencymasks_tpu.evalnet_pipeline import (
        create_training_data_evalnet_miou_hela)
    from inconsistencymasks_tpu.train.checkpoint import unstack_variables

    tmp = str(tmp_path)
    make_hela_dataset(tmp, h=64, w=64, n_labeled=5, n_val=2)
    unet = UNet(num_classes=3, alpha=0.25, activation="relu",
                out_activation="sigmoid")
    tv = unstack_variables(init_population(unet, 64, 64, 1, 1), 1)[0]
    out = os.path.join(tmp, "ev", "train")
    src = os.path.join(tmp, "train_labeled")
    create_training_data_evalnet_miou_hela(
        unet, tv, os.path.join(src, "brightfield"), src, out, 0)

    for chan in ("brightfield", "alive", "dead", "mod_position"):
        names = list_pngs(os.path.join(out, chan))
        if chan == "brightfield":
            # GT copies only (predictions have no brightfield image)
            assert len(names) == 5
        else:
            assert sum("___0" in n for n in names) == 5   # predictions
            assert len(names) == 10                       # + GT copies

    with open(os.path.join(out, "labels.csv")) as f:
        rows = list(csv.reader(f, delimiter=";"))
    assert len(rows) == 10 and all(len(r) == 7 for r in rows)
    pred_rows = [r for r in rows if "___0" in r[0]]
    gt_rows = [r for r in rows if "___0" not in r[0]]
    assert len(pred_rows) == 5 and len(gt_rows) == 5
    for r in pred_rows:
        ious = [float(v) for v in r[1:4]]
        dets = [int(v) for v in r[4:7]]
        assert set(dets) <= {0, 1}
        for iou, det in zip(ious, dets):
            assert 0.0 <= iou <= 1.0
            if det == 0:
                assert iou == 0.0     # IoU forced to 0 when undetected
    # the stale-label quirk: every GT row carries the same flags and
    # iou == detection
    assert len({tuple(r[1:]) for r in gt_rows}) == 1
    for r in gt_rows:
        assert [float(v) for v in r[1:4]] == [float(v) for v in r[4:7]]


def test_hela_checkpoint_miou_datagen_no_pos(tmp_path):
    """include_pos=False == the reference's vestigial _no_pos variant
    (functions.py:4138-4243): no mod_position outputs, 5-column rows."""
    import csv

    from inconsistencymasks_tpu.data.synthetic import make_hela_dataset
    from inconsistencymasks_tpu.evalnet_pipeline import (
        create_training_data_evalnet_miou_hela)
    from inconsistencymasks_tpu.train.checkpoint import unstack_variables

    tmp = str(tmp_path)
    make_hela_dataset(tmp, h=64, w=64, n_labeled=3, n_val=2)
    unet = UNet(num_classes=3, alpha=0.25, activation="relu",
                out_activation="sigmoid")
    tv = unstack_variables(init_population(unet, 64, 64, 1, 1), 1)[0]
    out = os.path.join(tmp, "ev2", "train")
    src = os.path.join(tmp, "train_labeled")
    create_training_data_evalnet_miou_hela(
        unet, tv, os.path.join(src, "brightfield"), src, out, 1,
        include_pos=False)
    assert not os.path.isdir(os.path.join(out, "mod_position"))
    with open(os.path.join(out, "labels.csv")) as f:
        rows = list(csv.reader(f, delimiter=";"))
    assert len(rows) == 3 and all(len(r) == 5 for r in rows)  # i!=0: no GT


def test_fit_smaller_than_batch():
    """A train split smaller than batch_size must clamp, not crash: the
    wrap-around reshuffle in EvalNetTrainer.fit slices a full batch from
    the fresh permutation (regression: ValueError broadcast (N,)->(B,))."""
    from inconsistencymasks_tpu.evalnet_pipeline.dataset import EvalNetDataset

    rng = np.random.RandomState(0)
    n = 5
    ds = EvalNetDataset(
        images=rng.randint(0, 256, (n, 64, 64, 3), dtype=np.uint8),
        masks=rng.randint(0, 2, (n, 64, 64, 1), dtype=np.uint8) * 255,
        labels=rng.rand(n).astype(np.float32))
    ev = EvalNet(alpha=0.25, activation="relu")
    ev_vars = init_population_evalnet(ev, 64, 64, 3, 1, population=2,
                                      identical=True)
    trainer = EvalNetTrainer(ev, ev_vars, two_head=False,
                             learning_rate=3e-3, weight_decay=1e-4)
    trainer.fit(ds, ds, epochs=2, batch_size=32, log=None)
    assert np.all(np.isfinite(trainer.best_metrics()))
