"""End-to-end pipeline-script smoke: the actual zero-arg CLI scripts run
against a tiny synthetic dataset (LDT -> IM generation chain), checking the
reference's filesystem contract (topK checkpoints, results CSVs,
mean_im_size CSVs, prediction PNG trees)."""

import configparser
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synthetic_isic(tmp_path_factory):
    from inconsistencymasks_tpu.data.synthetic import make_binary_dataset
    root = tmp_path_factory.mktemp("e2e")
    base = str(root / "ISIC_2018") + os.sep
    make_binary_dataset(base, h=32, w=32, n_labeled=6, n_val=4, n_test=4,
                        n_unlabeled=4)
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp["ISIC_2018"]["BASE_DIR"] = base
    cp["ISIC_2018"]["IMAGE_HEIGHT"] = "32"
    cp["ISIC_2018"]["IMAGE_WIDTH"] = "32"
    cp["ISIC_2018"]["ALPHA"] = "0.25"
    cfg_path = str(root / "config.ini")
    with open(cfg_path, "w") as f:
        cp.write(f)
    return base, cfg_path


def _run(script, cfg_path, extra_env=None):
    env = dict(os.environ,
               IM_CONFIG=cfg_path, IM_RUNIDS="1", IM_GENS="0",
               IM_N_VALUES="2", IM_POPULATION_FIRST="3",
               IM_POPULATION_GEN="2", IM_EPOCHS="1",
               JAX_PLATFORMS="cpu")
    env.update(extra_env or {})
    # force CPU despite sitecustomize via a -c wrapper
    code = (f"import jax; jax.config.update('jax_platforms','cpu');"
            f"import runpy, sys; sys.argv=['x'];"
            f"runpy.run_path({script!r}, run_name='__main__')")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


@pytest.mark.e2e
def test_subset_then_im_chain(synthetic_isic):
    base, cfg = synthetic_isic
    _run(os.path.join(REPO, "ISIC_2018", "03_ISIC_2018_subset.py"), cfg)
    models = os.listdir(os.path.join(base, "models"))
    assert sum("_topK_" in m for m in models) == 3  # population 3 < TOP_Ks
    assert os.path.isfile(os.path.join(
        base, "csv", "results_ISIC_2018_subset_1.csv"))

    _run(os.path.join(REPO, "ISIC_2018", "09_ISIC_2018_IM.py"), cfg)
    csvs = os.listdir(os.path.join(base, "csv"))
    assert any(c.startswith("mean_im_size_ISIC_2018_IM_1_n2_gen0")
               for c in csvs)
    im_models = [m for m in os.listdir(os.path.join(base, "models"))
                 if "IM_1_n2_gen0" in m and "_topK_" in m]
    assert len(im_models) == 2
    # pseudo-label tree exists with the im/ dump
    pseudo = [d for d in os.listdir(os.path.join(
        base, "train_unlabeled_predictions", "IM")) if "gen0" in d][0]
    tree = os.listdir(os.path.join(base, "train_unlabeled_predictions",
                                   "IM", pseudo))
    assert {"images", "masks", "im"}.issubset(set(tree))

    # resume: second run of 03 must skip (fast) and not retrain
    r = _run(os.path.join(REPO, "ISIC_2018", "03_ISIC_2018_subset.py"), cfg)
    assert "skipping completed cell" in r.stdout


def _make_cfg(root, section, base, h, w, alpha="0.25"):
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp[section]["BASE_DIR"] = base
    cp[section]["IMAGE_HEIGHT"] = str(h)
    cp[section]["IMAGE_WIDTH"] = str(w)
    cp[section]["ALPHA"] = alpha
    if "ALPHA_EVALNET" in cp[section]:
        cp[section]["ALPHA_EVALNET"] = "0.25"
    cfg_path = str(root / "config.ini")
    with open(cfg_path, "w") as f:
        cp.write(f)
    return cfg_path


@pytest.mark.e2e
def test_hela_subset_then_evalnet_chain(tmp_path):
    """HeLa 03 (LDT) -> 10 (mIoU EvalNet ensemble + segnet loop) through
    the real CLIs (VERDICT r1 item 9)."""
    from inconsistencymasks_tpu.data.synthetic import make_hela_dataset
    base = str(tmp_path / "HeLa") + os.sep
    # EvalNet has 6 maxpools -> needs >=64 px
    make_hela_dataset(base, h=64, w=64, n_labeled=6, n_val=4, n_test=4,
                      n_unlabeled=4)
    cfg = _make_cfg(tmp_path, "HELA", base, 64, 64)
    extra = {"IM_POPULATION_FIRST": "2", "IM_POPULATION_GEN": "2"}
    _run(os.path.join(REPO, "HeLa", "03_HeLa_subset.py"), cfg, extra)
    models = os.listdir(os.path.join(base, "models"))
    assert sum("_topK_" in m for m in models) == 2
    assert os.path.isfile(os.path.join(base, "csv",
                                       "results_HELA_subset_1.csv"))

    _run(os.path.join(REPO, "HeLa", "10_HeLa_evalnet_miou_ensemble.py"),
         cfg, extra)
    models = os.listdir(os.path.join(base, "models"))
    assert any("evalnet" in m and "_topK_" in m for m in models)
    assert any("segnet" in m and "_topK_" in m for m in models)
    # checkpoint-based datagen tree (reference HeLa/10:52)
    dg = os.path.join(base, "evalnet_miou_ensemble", "run_1", "train")
    assert os.path.isfile(os.path.join(dg, "labels.csv"))
    assert os.path.isdir(os.path.join(dg, "mod_position"))


@pytest.mark.e2e
def test_suim_subset_then_im_chain(tmp_path):
    """SUIM 04 (LDT) -> 10 (IM) through the real CLIs."""
    from inconsistencymasks_tpu.data.synthetic import make_multiclass_dataset
    base = str(tmp_path / "SUIM") + os.sep
    make_multiclass_dataset(base, num_classes=8, h=32, w=32, n_labeled=6,
                            n_val=4, n_test=4, n_unlabeled=4)
    cfg = _make_cfg(tmp_path, "SUIM", base, 32, 32)
    _run(os.path.join(REPO, "SUIM", "04_SUIM_subset.py"), cfg)
    assert os.path.isfile(os.path.join(base, "csv",
                                       "results_SUIM_subset_1.csv"))
    _run(os.path.join(REPO, "SUIM", "10_SUIM_IM.py"), cfg)
    csvs = os.listdir(os.path.join(base, "csv"))
    assert any(c.startswith("mean_im_size_SUIM_IM_1_n2_gen0")
               for c in csvs)


@pytest.mark.e2e
def test_cityscapes_subset_then_im_chain(tmp_path):
    """Cityscapes 03 (LDT) -> 09 (IM) through the real CLIs."""
    from inconsistencymasks_tpu.data.synthetic import make_multiclass_dataset
    base = str(tmp_path / "Cityscapes") + os.sep
    make_multiclass_dataset(base, num_classes=12, h=32, w=32, n_labeled=6,
                            n_val=4, n_test=4, n_unlabeled=4)
    cfg = _make_cfg(tmp_path, "CITYSCAPES", base, 32, 32)
    _run(os.path.join(REPO, "Cityscapes", "03_Cityscapes_subset.py"), cfg)
    assert os.path.isfile(os.path.join(
        base, "csv", "results_CITYSCAPES_subset_1.csv"))
    _run(os.path.join(REPO, "Cityscapes", "09_Cityscapes_IM.py"), cfg)
    csvs = os.listdir(os.path.join(base, "csv"))
    assert any(c.startswith("mean_im_size_CITYSCAPES_IM_1_n2_gen0")
               for c in csvs)
