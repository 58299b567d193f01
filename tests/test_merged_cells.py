"""Runid-merged supervised training == per-runid solo training.

The merged path must produce the same artifact set (per-runid candidate
checkpoints, topK renames, results CSVs) with per-candidate metrics close
to the solo path's (same init seeds; only conv group packing differs)."""

import configparser
import csv
import os

import numpy as np
import pytest


@pytest.fixture()
def isic_env(tmp_path, monkeypatch):
    from inconsistencymasks_tpu.data.synthetic import make_binary_dataset

    def build(sub):
        base = str(tmp_path / sub / "ISIC_2018") + os.sep
        make_binary_dataset(base, h=32, w=32, n_labeled=8, n_val=4,
                            n_test=4, n_unlabeled=4)
        cp = configparser.ConfigParser()
        cp.read(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "config.ini"))
        cp["ISIC_2018"]["BASE_DIR"] = base
        cp["ISIC_2018"]["IMAGE_HEIGHT"] = "32"
        cp["ISIC_2018"]["IMAGE_WIDTH"] = "32"
        cp["ISIC_2018"]["ALPHA"] = "0.25"
        cfg_path = str(tmp_path / sub / "config.ini")
        with open(cfg_path, "w") as f:
            cp.write(f)
        return base, cfg_path

    return build, monkeypatch


def _run_stage(cfg_path, merge, monkeypatch):
    from inconsistencymasks_tpu import pipeline

    monkeypatch.setenv("IM_MERGE_RUNIDS", "1" if merge else "0")
    ad = pipeline.make_adapter("isic", cfg_path, runids=(1, 2),
                               population_first=2, epochs=1, log=None)
    pipeline.run_supervised_stage(ad, "subset", ad.train_labeled_dir)
    return ad


def _read_rows(ad, runid):
    path = os.path.join(ad.csv_dir, f"results_ISIC_2018_subset_{runid}.csv")
    with open(path) as f:
        return list(csv.reader(f, delimiter=";"))


def test_merged_matches_solo(isic_env):
    build, monkeypatch = isic_env
    base_m, cfg_m = build("merged")
    base_s, cfg_s = build("solo")
    ad_m = _run_stage(cfg_m, True, monkeypatch)
    ad_s = _run_stage(cfg_s, False, monkeypatch)

    models_m = sorted(os.listdir(os.path.join(base_m, "models")))
    models_s = sorted(os.listdir(os.path.join(base_s, "models")))
    assert models_m == models_s          # identical artifact set
    assert sum("_topK_" in m for m in models_m) == 4  # 2 runids x pop 2

    for runid in (1, 2):
        rows_m = _read_rows(ad_m, runid)
        rows_s = _read_rows(ad_s, runid)
        assert [r[0] for r in rows_m] == [r[0] for r in rows_s]
        a = np.array([[float(v) for v in r[1:]] for r in rows_m[1:]])
        b = np.array([[float(v) for v in r[1:]] for r in rows_s[1:]])
        # same inits + same stream; only packing-order float noise after
        # one epoch of training on random data
        np.testing.assert_allclose(a, b, atol=0.08)


def test_merged_noisy_student_cells(isic_env):
    """run_noisy_student_stage fuses a generation's runid cells (shared
    per-gen student alpha) and still produces every per-cell artifact."""
    build, monkeypatch = isic_env
    base, cfg = build("ns_merged")
    from inconsistencymasks_tpu import pipeline

    monkeypatch.setenv("IM_MERGE_CELLS", "1")
    monkeypatch.setenv("IM_MESH", "none")  # force fit_multi (no data mesh)
    ad = pipeline.make_adapter("isic", cfg, runids=(1, 2), gens=(0, 1),
                               population_first=2, population_gen=2,
                               epochs=1, log=None)
    pipeline.run_supervised_stage(ad, "subset", ad.train_labeled_dir)
    pipeline.run_noisy_student_stage(ad)

    models = os.listdir(os.path.join(base, "models"))
    csvs = os.listdir(os.path.join(base, "csv"))
    for runid in (1, 2):
        for gen in (0, 1):
            cell = f"ISIC_2018_noisy_student_{runid}_gen{gen}"
            assert sum(f"{cell}_topK_" in m for m in models) == 2, models
            assert f"results_{cell}.csv" in csvs


def test_merged_steps_per_cell(isic_env):
    """run_grid_cells_merged honours per-cell steps_per_epoch (the segnet
    min-clamp, reference SUIM/11:205-211) on the fused fit_multi path."""
    build, monkeypatch = isic_env
    base, cfg = build("steps")
    from inconsistencymasks_tpu import pipeline
    from inconsistencymasks_tpu.workflows import run_grid_cells_merged

    monkeypatch.setenv("IM_MESH", "none")  # fit_multi needs no data mesh
    ad = pipeline.make_adapter("isic", cfg, log=None)
    cells = [("cellA", 1), ("cellB", 2)]
    ds = ad.load_split(ad.train_labeled_dir)
    run_grid_cells_merged(
        kind="binary", cfg=ad.cfg, module=ad.module(),
        train_ds=None, val_ds=ad.load_split(ad.val_dir),
        test_ds=ad.load_split(ad.test_dir),
        unlabeled_ds=ad.load_split(ad.train_unlabeled_dir),
        cells=cells, train_datasets=[ds, ds], steps_per_cell=[2, None],
        pred_dir_fn=lambda split, mn: ad.pred_dir(split, mn, "steps"),
        model_dir=ad.model_dir, csv_dir=ad.csv_dir, population=2,
        epochs=1, log=None)
    models = os.listdir(os.path.join(base, "models"))
    for cell in ("cellA", "cellB"):
        assert sum(f"{cell}_topK_" in m for m in models) == 2


def test_im_plus_growing_teacher_alpha(isic_env):
    """IM+ generation g>=2 must load its gen-(g-1) teachers at
    ns_alpha(g-1) — WIDER than the config base (regression: _generate_im
    rebuilt the base-width module and died with ScopeParamShapeError at
    gen 2; the reference cannot hit this because it loads full Keras
    models, 11_*_IM+.py:66-77)."""
    build, monkeypatch = isic_env
    base, cfg = build("implus")
    from inconsistencymasks_tpu import pipeline

    monkeypatch.setenv("IM_MESH", "none")
    ad = pipeline.make_adapter("isic", cfg, runids=(1,), gens=(0, 1, 2),
                               n_values=(2,), population_first=2,
                               population_gen=2, epochs=1, log=None)
    pipeline.run_supervised_stage(ad, "subset", ad.train_labeled_dir)
    pipeline.run_im_plus_stage(ad)
    models = os.listdir(os.path.join(base, "models"))
    for gen in (0, 1, 2):
        cell = f"ISIC_2018_IM_plus_1_n2_gen{gen}_e0_d0_bi_True_bo_True"
        assert sum(f"{cell}_topK_" in m for m in models) == 2, models


def test_merged_im_cells(isic_env):
    """run_im_stage fuses the (runid, n) student cells of a generation
    (fit_multi path) and still produces every per-cell artifact."""
    build, monkeypatch = isic_env
    base, cfg = build("im_merged")
    from inconsistencymasks_tpu import pipeline

    monkeypatch.setenv("IM_MERGE_CELLS", "1")
    monkeypatch.setenv("IM_MESH", "none")  # force fit_multi (no data mesh)
    ad = pipeline.make_adapter("isic", cfg, runids=(1,), gens=(0,),
                               n_values=(2, 3), population_first=3,
                               population_gen=2, epochs=1, log=None)
    pipeline.run_supervised_stage(ad, "subset", ad.train_labeled_dir)
    pipeline.run_im_stage(ad)

    models = os.listdir(os.path.join(base, "models"))
    csvs = os.listdir(os.path.join(base, "csv"))
    for n in (2, 3):
        cell = f"ISIC_2018_IM_1_n{n}_gen0_e0_d0_bi_True_bo_True"
        assert sum(f"{cell}_topK_" in m for m in models) == 2, models
        assert f"results_{cell}.csv" in csvs
        assert f"mean_im_size_{cell}.csv" in csvs


def test_oom_backoff_halves_chunk(isic_env):
    """An HBM OOM during a fused chunk's fit halves the chunk and retries
    instead of dying (guards the uncalibrated _hbm_chunk_candidates
    extrapolation — VERDICT r2 weak #7)."""
    build, monkeypatch = isic_env
    base, cfg_path = build("oom")
    from inconsistencymasks_tpu import pipeline, workflows

    real = workflows.PopulationTrainer
    state = {"failed": False, "pops": []}

    class OOMOnce(real):
        def fit(self, *a, **k):
            state["pops"].append(self.population)
            if self.population > 1 and not state["failed"]:
                state["failed"] = True
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Out of memory while trying to "
                    "allocate 23.1GiB")
            return real.fit(self, *a, **k)

    monkeypatch.setattr(workflows, "PopulationTrainer", OOMOnce)
    ad = pipeline.make_adapter("isic", cfg_path, runids=(1,),
                               population_first=2, epochs=1, log=None)
    pipeline.run_supervised_stage(ad, "subset", ad.train_labeled_dir)
    # first attempt pop 2 OOMed, retries ran pop-1 chunks to completion
    assert state["pops"][0] == 2 and set(state["pops"][1:]) == {1}
    models = os.listdir(os.path.join(base, "models"))
    assert sum("_topK_" in m for m in models) == 2
