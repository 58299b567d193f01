"""EvalNet-arm CLI chains as pytest e2e markers (VERDICT r3 next-#7).

tools/preflight_chain.py exercised the ISIC EvalNet-arm CLIs once before
the round-3 production run; promoting the chain into the suite makes
stage-runner drift a test failure instead of an hours-in production crash.
Covers:

- the full ISIC priority chain the quality runs drive
  (03 04 09 11 12 10 14 13 08 06 07 05 — reference scripts
  ISIC_2018/03..14), including the EvalNet ensemble + segnet loop and the
  adaptive-augmentation stages;
- one non-ISIC IM+/IM++ chain (SUIM 04 -> 12 -> 13): the mIoU-EvalNet
  on-the-fly arm (reference SUIM/13_SUIM_IM++.py) at CLI level;
- the SUIM segnet loop (04 -> 11, reference
  SUIM/11_SUIM_evalnet_miou_ensemble.py): classwise EvalNet datagen +
  two-head training + detection-masked filtering + student retrain —
  the exact chain the unattended multiclass quality run drives.
"""

import configparser
import os

import pytest

from test_pipeline_e2e import REPO, _run

pytestmark = pytest.mark.e2e


def _write_cfg(root, section, base, h, w):
    """Tiny-scale config mirroring tools/preflight_chain.py build()."""
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp["DEFAULT"]["NUM_EPOCHS_EVALNET"] = "1"
    cp["DEFAULT"]["NUM_EPOCHS_CS"] = "1"
    cp["DEFAULT"]["NUM_LOOPS_TRAIN"] = "2"
    cp["DEFAULT"]["NUM_LOOPS_VAL"] = "1"
    cp[section]["BASE_DIR"] = base
    cp[section]["IMAGE_HEIGHT"] = str(h)
    cp[section]["IMAGE_WIDTH"] = str(w)
    cp[section]["ALPHA"] = "0.25"
    if "ALPHA_EVALNET" in cp[section]:
        cp[section]["ALPHA_EVALNET"] = "0.25"
    cfg_path = str(root / "config.ini")
    with open(cfg_path, "w") as f:
        cp.write(f)
    return cfg_path


def _link_train_full(base):
    for sub in ("images", "masks"):
        full = os.path.join(base, "train_full", sub)
        os.makedirs(full, exist_ok=True)
        for split in ("train_labeled", "train_unlabeled"):
            src = os.path.join(base, split, sub)
            if not os.path.isdir(src):
                continue
            for n in os.listdir(src):
                dst = os.path.join(full, n)
                if not os.path.exists(dst):
                    os.link(os.path.join(src, n), dst)


def test_isic_evalnet_arm_chain(tmp_path):
    """The production priority chain end-to-end on tiny data; every stage
    must exit 0 and leave its filesystem contract behind."""
    from inconsistencymasks_tpu.data.synthetic import make_binary_dataset
    base = str(tmp_path / "ISIC_2018") + os.sep
    make_binary_dataset(base, h=32, w=32, n_labeled=6, n_val=4, n_test=4,
                        n_unlabeled=6)
    _link_train_full(base)
    cfg = _write_cfg(tmp_path, "ISIC_2018", base, 32, 32)
    chain = ["03_ISIC_2018_subset.py", "04_ISIC_2018_subset_aug.py",
             "09_ISIC_2018_IM.py", "11_ISIC_2018_IM+.py",
             "12_ISIC_2018_IM++.py", "10_ISIC_2018_evalnet_ensemble.py",
             "14_ISIC_2018_aug_IM++.py", "13_ISIC_2018_aug_IM+.py",
             "08_ISIC_2018_noisy_student.py",
             "06_ISIC_2018_model_ensemble.py",
             "07_ISIC_2018_input_ensemble.py",
             "05_ISIC_2018_consistency_loss.py"]
    for script in chain:
        _run(os.path.join(REPO, "ISIC_2018", script), cfg)

    models = os.listdir(os.path.join(base, "models"))
    csvs = os.listdir(os.path.join(base, "csv"))
    # every strategy left topK checkpoints + a results CSV behind
    for tag, csv_prefix in (
            ("ISIC_2018_subset_1", "results_ISIC_2018_subset_1"),
            ("ISIC_2018_subset_aug_1", "results_ISIC_2018_subset_aug_1"),
            ("ISIC_2018_IM_1_n2_gen0", "results_ISIC_2018_IM_1_n2_gen0"),
            ("ISIC_2018_IM_plus_1_n2_gen0", "results_ISIC_2018_IM_plus_1"),
            ("ISIC_2018_IM_plus_plus_1_n2_gen0",
             "results_ISIC_2018_IM_plus_plus_1"),
            ("ISIC_2018_evalnet_1", "results_ISIC_2018_evalnet_1"),
            ("ISIC_2018_segnet_1_n2_gen0",
             "results_ISIC_2018_segnet_1_n2_gen0"),
            ("ISIC_2018_aug_IM_plus_plus_1_n2_gen0",
             "results_ISIC_2018_aug_IM_plus_plus_1"),
            ("ISIC_2018_aug_IM_plus_1_n2_gen0",
             "results_ISIC_2018_aug_IM_plus_1"),
            ("ISIC_2018_noisy_student_1_gen0",
             "results_ISIC_2018_noisy_student_1"),
            ("ISIC_2018_model_ensemble_1_n2_gen0",
             "results_ISIC_2018_model_ensemble_1"),
            ("ISIC_2018_input_ensemble_1_n", # n-grid starts at its ref value
             "results_ISIC_2018_input_ensemble_1"),
            ("ISIC_2018_consistency_loss_1",
             "results_ISIC_2018_consistency_loss_1")):
        assert any(m.startswith(tag) and "_topK_" in m
                   for m in models), tag
        assert any(c.startswith(csv_prefix) for c in csvs), csv_prefix


def test_suim_im_plus_plus_chain(tmp_path):
    """SUIM 04 (LDT) -> 12 (IM+) -> 13 (IM++, on-the-fly mIoU EvalNet
    ensemble + adaptive aug) through the real CLIs — the multiclass
    EvalNet arm's first CLI-level coverage (reference SUIM/13:61-216)."""
    from inconsistencymasks_tpu.data.synthetic import make_multiclass_dataset
    base = str(tmp_path / "SUIM") + os.sep
    # EvalNet towers have 6 maxpools -> need >=64 px inputs
    make_multiclass_dataset(base, num_classes=8, h=64, w=64, n_labeled=6,
                            n_val=4, n_test=4, n_unlabeled=4)
    _link_train_full(base)
    cfg = _write_cfg(tmp_path, "SUIM", base, 64, 64)
    _run(os.path.join(REPO, "SUIM", "04_SUIM_subset.py"), cfg)
    _run(os.path.join(REPO, "SUIM", "12_SUIM_IM+.py"), cfg)
    _run(os.path.join(REPO, "SUIM", "13_SUIM_IM++.py"), cfg)

    models = os.listdir(os.path.join(base, "models"))
    csvs = os.listdir(os.path.join(base, "csv"))
    assert any("IM_plus_1_n2_gen0" in m and "_topK_" in m
               for m in models)
    assert any("IM_plus_plus_1_n2_gen0" in m and "_topK_" in m
               for m in models)
    assert any("evalnet" in m and "_topK_" in m for m in models)
    assert any(c.startswith("results_SUIM_IM_plus_plus_1") for c in csvs)
    assert any(c.startswith("mean_im_size_SUIM_IM_plus_plus_1")
               for c in csvs)


def test_suim_evalnet_miou_ensemble_chain(tmp_path):
    """SUIM 04 (LDT) -> 11 (evalnet_miou_ensemble): classwise-IoU+detection
    datagen (reference functions.py:4248-4323), two-head EvalNet-mIoU
    population training, detection-masked candidate filtering
    (functions.py:5468-5577), and the segnet student retrain — through the
    real zero-arg CLIs (reference SUIM/11_SUIM_evalnet_miou_ensemble.py)."""
    from inconsistencymasks_tpu.data.synthetic import make_multiclass_dataset
    base = str(tmp_path / "SUIM") + os.sep
    # EvalNet towers have 6 maxpools -> need >=64 px inputs
    make_multiclass_dataset(base, num_classes=8, h=64, w=64, n_labeled=6,
                            n_val=4, n_test=4, n_unlabeled=4)
    _link_train_full(base)
    cfg = _write_cfg(tmp_path, "SUIM", base, 64, 64)
    _run(os.path.join(REPO, "SUIM", "04_SUIM_subset.py"), cfg)
    _run(os.path.join(REPO, "SUIM", "11_SUIM_evalnet_miou_ensemble.py"),
         cfg)

    models = os.listdir(os.path.join(base, "models"))
    csvs = os.listdir(os.path.join(base, "csv"))
    assert any(m.startswith("SUIM_evalnet_miou_1") and "_topK_" in m
               for m in models)
    assert any("segnet_1_n2_gen0" in m and "_topK_" in m for m in models)
    assert any(c.startswith("results_SUIM_segnet_1_n2_gen0")
               for c in csvs)
