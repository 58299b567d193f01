"""Pipeline stage runners — the shared engine behind the numbered scripts.

The reference implements each dataset x approach as a standalone ~100-300
line script of nested grid loops (reference ISIC_2018/02..14_*.py etc.);
the loops' structure is identical across datasets (SURVEY.md 2.2):

    for runid in 1..3 [-> for n in 2..4] -> for gen in 0..4:
        load n teacher checkpoints (gen 0: seed approach's topK)
        generate pseudo-labels for val/test/unlabeled
        merge the labeled set in
        train 5(-10) student candidates -> keep top-K -> results CSV

Here each stage is ONE function parameterised by a :class:`DatasetAdapter`;
the numbered scripts stay as thin zero-arg wrappers preserving the
reference CLI contract (script names, checkpoint names, CSV/PNG outputs).

Naming contracts preserved exactly:
- modelname grids: ``{prefix}_{approach}_{runid}[_n{n}]_gen{gen}`` with the
  IM family's ``_e{EK}_d{DK}_bi_{BI}_bo_{BO}`` suffix (reference 09:59);
- teachers: gen 0 from ``{prefix}_{seed_approach}_{runid}_topK_{j}``, later
  gens from the previous generation's topK (09:66-74);
- pseudo-label dirs under ``{split}_predictions/{approach}/{modelname}``;
- ``results_*.csv`` + ``mean_im_size_*.csv`` (09:130-154).

Noisy-Student/IM+ per-generation schedules are dataset-specific (see
NS_SCHEDULES / CS_SCHEDULES below): alpha grows base+0.25/gen, noise/blur/
brightness ramps widen per generation (gentler for HeLa/Cityscapes).
"""

from __future__ import annotations

import os
import shutil
import zlib
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from .config import DatasetConfig, load_config
from .data.loader import (Dataset, list_pngs, load_hela_dataset,
                          load_image_mask_dataset)
from .train.checkpoint import load_variables
from .utils.csv_io import write_results_csv
from .workflows import make_unet, run_grid_cell
from . import class_mappings

# Per-generation schedules — DATASET-SPECIFIC in the reference:
# student width alpha = base ALPHA + 0.25/gen everywhere (ISIC
# 08:39/12:52 [0.5..1.5]; HeLa 08:41, SUIM 09:42, Cityscapes 08:42
# [1..2]); noise/blur/brightness ramps are gentler for HeLa
# (08:42-45) and much gentler for Cityscapes (08:43-46).
NS_SCHEDULES = {
    "isic": dict(
        max_blurs=[0, 1, 1, 2, 3], max_noises=[5, 10, 15, 20, 25],
        brightness_alphas=[(0.9, 1.1), (0.8, 1.2), (0.7, 1.3),
                           (0.6, 1.4), (0.5, 1.5)],
        brightness_betas=[(-5, 5), (-10, 10), (-15, 15), (-20, 20),
                          (-25, 25)]),
    "suim": dict(
        max_blurs=[0, 1, 1, 2, 3], max_noises=[5, 10, 15, 20, 25],
        brightness_alphas=[(0.9, 1.1), (0.8, 1.2), (0.7, 1.3),
                           (0.6, 1.4), (0.5, 1.5)],
        brightness_betas=[(-5, 5), (-10, 10), (-15, 15), (-20, 20),
                          (-25, 25)]),
    "hela": dict(
        max_blurs=[0, 1, 1, 2, 3], max_noises=[5, 10, 15, 20, 25],
        brightness_alphas=[(0.9, 1.1), (0.9, 1.1), (0.8, 1.2),
                           (0.8, 1.2), (0.7, 1.3)],
        brightness_betas=[(-3, 3), (-6, 6), (-9, 9), (-12, 12),
                          (-15, 15)]),
    "cityscapes": dict(
        max_blurs=[0, 0, 0, 0, 1], max_noises=[3, 6, 9, 12, 15],
        brightness_alphas=[(0.95, 1.05), (0.9, 1.1), (0.8, 1.2),
                           (0.7, 1.3), (0.6, 1.4)],
        brightness_betas=[(-3, 3), (-6, 6), (-9, 9), (-12, 12),
                          (-15, 15)]),
}


def ns_alpha(ad, gen: int) -> float:
    """Student width for generation ``gen``: base ALPHA + 0.25 per gen."""
    return ad.cfg.alpha + 0.25 * gen


def ns_sched(ad, gen: int) -> dict:
    s = NS_SCHEDULES[ad.key]
    return dict(brightness_range_alpha=s["brightness_alphas"][gen],
                brightness_range_beta=s["brightness_betas"][gen],
                max_blur=s["max_blurs"][gen],
                max_noise=s["max_noises"][gen])


# consistency-loss augmentation strengths (reference 05:40-45; Cityscapes
# 05:43-46 is gentler, the other three datasets share one table)
CS_STRENGTHS = ["low", "mid", "high"]
CS_SCHEDULES = {
    "default": dict(
        max_blurs=[1, 2, 3], max_noises=[10, 17, 25],
        brightness_alphas=[(0.85, 1.15), (0.7, 1.3), (0.5, 1.5)],
        brightness_betas=[(-10, 10), (-17, 17), (-25, 25)]),
    "cityscapes": dict(
        max_blurs=[0, 0, 1], max_noises=[3, 9, 15],
        brightness_alphas=[(0.95, 1.05), (0.8, 1.2), (0.6, 1.4)],
        brightness_betas=[(-3, 3), (-9, 9), (-15, 15)]),
}


def cs_sched(ad, idx: int) -> dict:
    s = CS_SCHEDULES.get(ad.key, CS_SCHEDULES["default"])
    return dict(brightness_alpha=s["brightness_alphas"][idx],
                brightness_beta=s["brightness_betas"][idx],
                max_blur=s["max_blurs"][idx],
                max_noise=s["max_noises"][idx])


def stable_seed(name: str) -> int:
    """Process-independent candidate seed from a modelname.

    The reference's reproducibility contract is a single global SEED=42
    (reference config.ini:2) — every rerun must produce the same candidate
    inits.  Python's ``hash(str)`` is salted per process, so it cannot be
    used here; CRC32 is stable across processes and platforms."""
    return zlib.crc32(name.encode("utf-8")) & 0x7FFFFFFF


@dataclass
class DatasetAdapter:
    """Everything a stage runner needs to know about one dataset."""
    key: str                 # 'isic' | 'hela' | 'suim' | 'cityscapes'
    kind: str                # 'binary' | 'hela' | 'multiclass'
    prefix: str              # modelname prefix, e.g. 'ISIC_2018'
    cfg: DatasetConfig
    base_dir: str
    model_dir: str
    csv_dir: str
    train_labeled_dir: str       # main dir (hela) or images dir (others)
    train_labeled_aug_dir: str
    train_unlabeled_dir: str
    val_dir: str
    test_dir: str
    train_full_dir: str
    class_to_color: dict = field(default_factory=dict)
    mesh: object = None
    # overridable knobs for smoke/testing
    runids: Sequence[int] = (1, 2, 3)
    gens: Sequence[int] = (0, 1, 2, 3, 4)
    n_values: Sequence[int] = (2, 3, 4)
    population_first: int = 10   # FDT/LDT candidates
    population_gen: int = 5      # per-generation students
    epochs: Optional[int] = None
    log: Callable = print

    # ------------------------------------------------------------- loading

    def load_split(self, main_dir: str) -> Dataset:
        """Load a split from its MAIN dir (the one holding images/masks or
        the HeLa channel dirs)."""
        if self.kind == "hela":
            return load_hela_dataset(main_dir)
        return load_image_mask_dataset(
            os.path.join(main_dir, "images"),
            channels=self.cfg.image_channels,
            binary=self.kind != "multiclass")

    def images_dir(self, main_dir: str) -> str:
        """The dir holding network inputs for a split main dir."""
        if self.kind == "hela":
            return os.path.join(main_dir, "brightfield")
        return os.path.join(main_dir, "images")

    def split_main(self, split: str) -> str:
        return {"val": self.val_dir, "test": self.test_dir,
                "unlabeled": self.train_unlabeled_dir,
                "labeled": self.train_labeled_dir,
                "labeled_aug": self.train_labeled_aug_dir,
                "full": self.train_full_dir}[split]

    def pred_dir(self, split: str, modelname: str, approach: str) -> str:
        sub = {"val": "val_predictions", "test": "test_predictions",
               "unlabeled": "train_unlabeled_predictions"}[split]
        return os.path.join(self.base_dir, sub, approach, modelname)

    def module(self, alpha: Optional[float] = None):
        return make_unet(self.cfg, alpha=alpha)

    def copy_labeled_into(self, pseudo_main_dir: str,
                          source_main: Optional[str] = None) -> None:
        """Merge the labeled set into a pseudo-label dir (reference
        09:83-86)."""
        src = source_main or self.train_labeled_dir
        if self.kind == "hela":
            for chan in ("brightfield", "alive", "dead", "mod_position"):
                sdir = os.path.join(src, chan)
                ddir = os.path.join(pseudo_main_dir, chan)
                os.makedirs(ddir, exist_ok=True)
                for n in list_pngs(sdir):
                    shutil.copy(os.path.join(sdir, n),
                                os.path.join(ddir, n))
        else:
            for sub in ("images", "masks"):
                sdir = os.path.join(src, sub)
                ddir = os.path.join(pseudo_main_dir, sub)
                os.makedirs(ddir, exist_ok=True)
                for n in list_pngs(sdir):
                    shutil.copy(os.path.join(sdir, n),
                                os.path.join(ddir, n))

    def topk_path(self, modelname: str, j: int) -> str:
        return os.path.join(self.model_dir, f"{modelname}_topK_{j}.h5")

    def load_topk(self, modelname: str, count: int) -> list:
        out = []
        for j in range(1, count + 1):
            variables, _ = load_variables(self.topk_path(modelname, j))
            out.append(variables)
        return out


def make_adapter(key: str, config_path: Optional[str] = None,
                 default_n_values: Optional[Sequence[int]] = None,
                 **overrides) -> DatasetAdapter:
    """Build the dataset adapter for a pipeline script.

    ``default_n_values`` is the SCRIPT's reference n grid (the reference's
    ``for n in range(a, b)`` loop — e.g. n=2 only for the whole IM++/aug_IM++
    family outside ISIC, see HeLa/12_HeLa_IM++.py:150).  It is applied
    BEFORE the IM_* environment knobs so smoke-test scale-downs
    (IM_N_VALUES=...) still override it; explicit ``overrides`` kwargs are
    applied last and beat both."""
    fw = load_config(config_path)
    if key == "isic":
        cfg = fw.isic_2018
        ad = DatasetAdapter(
            key=key, kind="binary", prefix="ISIC_2018", cfg=cfg,
            base_dir=cfg.base_dir,
            model_dir=os.path.join(cfg.base_dir, "models"),
            csv_dir=os.path.join(cfg.base_dir, "csv"),
            train_labeled_dir=os.path.join(cfg.base_dir, "train_labeled"),
            train_labeled_aug_dir=os.path.join(cfg.base_dir,
                                               "train_labeled_aug"),
            train_unlabeled_dir=os.path.join(cfg.base_dir,
                                             "train_unlabeled"),
            val_dir=os.path.join(cfg.base_dir, "val"),
            test_dir=os.path.join(cfg.base_dir, "test"),
            train_full_dir=os.path.join(cfg.base_dir, "train_full"))
    elif key == "hela":
        cfg = fw.hela
        ad = DatasetAdapter(
            key=key, kind="hela", prefix="HELA", cfg=cfg,  # reference modelname prefix (HeLa/03:46)
            base_dir=cfg.base_dir,
            model_dir=os.path.join(cfg.base_dir, "models"),
            csv_dir=os.path.join(cfg.base_dir, "csv"),
            train_labeled_dir=os.path.join(cfg.base_dir, "train_labeled"),
            train_labeled_aug_dir=os.path.join(cfg.base_dir,
                                               "train_labeled_aug"),
            train_unlabeled_dir=os.path.join(cfg.base_dir,
                                             "train_unlabeled"),
            val_dir=os.path.join(cfg.base_dir, "val"),
            test_dir=os.path.join(cfg.base_dir, "test"),
            train_full_dir=os.path.join(cfg.base_dir, "train_full"))
    elif key in ("suim", "cityscapes"):
        cfg = fw.suim if key == "suim" else fw.cityscapes
        mapping = (class_mappings.CLASS_TO_COLOR_MAPPING_SUIM
                   if key == "suim"
                   else class_mappings.CLASS_TO_COLOR_MAPPING_CITYSCAPES)
        ad = DatasetAdapter(
            key=key, kind="multiclass",
            prefix="SUIM" if key == "suim" else "CITYSCAPES",  # (Cityscapes/03:45)
            cfg=cfg,
            base_dir=cfg.base_dir,
            model_dir=os.path.join(cfg.base_dir, "models"),
            csv_dir=os.path.join(cfg.base_dir, "csv"),
            train_labeled_dir=os.path.join(cfg.base_dir, "train_labeled"),
            train_labeled_aug_dir=os.path.join(cfg.base_dir,
                                               "train_labeled_aug"),
            train_unlabeled_dir=os.path.join(cfg.base_dir,
                                             "train_unlabeled"),
            val_dir=os.path.join(cfg.base_dir, "val"),
            test_dir=os.path.join(cfg.base_dir, "test"),
            train_full_dir=os.path.join(cfg.base_dir, "train_full"),
            class_to_color=mapping)
    else:
        raise ValueError(key)

    if default_n_values is not None:
        ad.n_values = tuple(default_n_values)

    # environment scale-down knobs (smoke tests / partial reruns); default
    # behaviour (full reference grid) is unchanged when unset
    def _env_ints(name):
        v = os.environ.get(name)
        return tuple(int(x) for x in v.split(",")) if v else None

    for attr, env in (("runids", "IM_RUNIDS"), ("gens", "IM_GENS"),
                      ("n_values", "IM_N_VALUES")):
        v = _env_ints(env)
        if v is not None:
            setattr(ad, attr, v)
    for attr, env in (("population_first", "IM_POPULATION_FIRST"),
                      ("population_gen", "IM_POPULATION_GEN"),
                      ("epochs", "IM_EPOCHS")):
        v = os.environ.get(env)
        if v is not None:
            setattr(ad, attr, int(v))

    for k, v in overrides.items():
        setattr(ad, k, v)

    # Multi-chip wiring (SURVEY.md 2.3): build the device mesh once per
    # process (IM_MESH env override; all-devices 'data' mesh by default on
    # multi-chip; None on a single chip) and register it as the process
    # default so every StackedEnsemble / PopulationTrainer constructed by
    # the stage runners inherits it.
    from .parallel import build_mesh, set_default_mesh
    if ad.mesh is None:
        ad.mesh = build_mesh()
    set_default_mesh(ad.mesh)
    if ad.mesh is not None and ad.log:
        ad.log(f"[mesh] {dict(zip(ad.mesh.axis_names, ad.mesh.devices.shape))}")
    return ad




def cell_done(ad: DatasetAdapter, modelname: str) -> bool:
    """Crash-resume: a grid cell is complete when its results CSV and topK-1
    checkpoint both exist (SURVEY.md section 5: the reference's recovery
    model is rerun-the-script; we add artifact-keyed skipping so reruns
    resume at the first unfinished cell).  Disable with IM_NO_RESUME=1."""
    if os.environ.get("IM_NO_RESUME") == "1":
        return False
    done = (os.path.isfile(os.path.join(ad.csv_dir,
                                        f"results_{modelname}.csv"))
            and os.path.isfile(ad.topk_path(modelname, 1)))
    if done and ad.log:
        ad.log(f"[resume] skipping completed cell {modelname}")
    return done

# ==========================================================================
# core helper: one training cell (population -> benchmarks -> topK -> CSV)
# ==========================================================================

def _train_cell(ad: DatasetAdapter, approach: str, modelname: str,
                train_main: str, *, population: int,
                alpha: Optional[float] = None,
                initial_variables=None, steps_per_epoch=None):
    module = ad.module(alpha)
    train_ds = ad.load_split(train_main)
    val_ds = ad.load_split(ad.val_dir)
    test_ds = ad.load_split(ad.test_dir)
    unl_ds = ad.load_split(ad.train_unlabeled_dir)
    return run_grid_cell(
        kind=ad.kind, cfg=ad.cfg, module=module, train_ds=train_ds,
        val_ds=val_ds, test_ds=test_ds, unlabeled_ds=unl_ds,
        modelname=modelname, model_dir=ad.model_dir, csv_dir=ad.csv_dir,
        pred_dir_fn=lambda split, mn: ad.pred_dir(split, mn, approach),
        population=population, epochs=ad.epochs,
        steps_per_epoch=steps_per_epoch, mesh=ad.mesh,
        base_seed=stable_seed(modelname),
        initial_variables=initial_variables,
        class_to_color=ad.class_to_color, log=ad.log)


def _train_pending_cells(ad: DatasetAdapter, approach: str, pending,
                         *, alpha: Optional[float] = None,
                         steps: Optional[list] = None) -> None:
    """Train a generation's pending grid cells, FUSED when possible.

    ``pending``: [(modelname, train_main_dir)] — the cells of ONE
    generation, whose teachers all come from the previous generation, so
    they are mutually independent and can train as one packed population
    (fit_multi: per-cell batch gathering, per-cell steps via update
    masking) instead of the reference's serial per-cell loop (e.g.
    08_*_noisy_student.py / 11_*_IM+.py / 10_*_evalnet_ensemble.py train
    every cell's 5 students one-by-one).  ``steps``: optional per-cell
    steps_per_epoch (None entries = reference default len(ds)//batch).
    Disable with IM_MERGE_CELLS=0 (also off on a data-sharded mesh:
    fit_multi gathers per-candidate batches from replicated HBM datasets,
    which a sharded batch axis would break — a 'model'-axis mesh shards
    the fused population instead, so multi-chip keeps the FAST fused
    path, VERDICT r2 weak #3)."""
    from .workflows import run_grid_cells_merged

    def _data_sharded(mesh):
        if mesh is None or "data" not in mesh.axis_names:
            return False
        return dict(zip(mesh.axis_names, mesh.devices.shape))["data"] > 1

    merge = (os.environ.get("IM_MERGE_CELLS", "1") != "0"
             and not _data_sharded(ad.mesh) and len(pending) > 1)
    if merge:
        run_grid_cells_merged(
            kind=ad.kind, cfg=ad.cfg, module=ad.module(alpha),
            train_ds=None, val_ds=ad.load_split(ad.val_dir),
            test_ds=ad.load_split(ad.test_dir),
            unlabeled_ds=ad.load_split(ad.train_unlabeled_dir),
            cells=[(mn, stable_seed(mn)) for mn, _ in pending],
            train_datasets=[ad.load_split(tm) for _, tm in pending],
            steps_per_cell=steps,
            pred_dir_fn=lambda split, mn: ad.pred_dir(split, mn, approach),
            model_dir=ad.model_dir, csv_dir=ad.csv_dir,
            population=ad.population_gen, epochs=ad.epochs, mesh=ad.mesh,
            class_to_color=ad.class_to_color, log=ad.log)
        return
    for i, (modelname, train_main) in enumerate(pending):
        _train_cell(ad, approach, modelname, train_main,
                    population=ad.population_gen, alpha=alpha,
                    steps_per_epoch=steps[i] if steps else None)


# ==========================================================================
# Stage: FDT / LDT / ALDT  (reference 02/03/04_*.py)
# ==========================================================================

def run_supervised_stage(ad: DatasetAdapter, approach: str,
                         train_main: str) -> None:
    """FDT ('full_dataset'), LDT ('subset') or ALDT ('subset_aug').

    All pending runids train as ONE fused packed population (the runid
    cells are identical configurations on identical data differing only by
    init seed — reference ISIC_2018/03:44 re-runs them serially), cutting
    per-generation wall-clock ~x(number of runids) while producing the
    exact per-runid artifacts.  Disable with IM_MERGE_RUNIDS=0."""
    from .workflows import run_grid_cells_merged
    os.makedirs(ad.model_dir, exist_ok=True)
    pending = [r for r in ad.runids
               if not cell_done(ad, f"{ad.prefix}_{approach}_{r}")]
    if (len(pending) > 1
            and os.environ.get("IM_MERGE_RUNIDS", "1") != "0"):
        cells = [(f"{ad.prefix}_{approach}_{r}",
                  stable_seed(f"{ad.prefix}_{approach}_{r}"))
                 for r in pending]
        run_grid_cells_merged(
            kind=ad.kind, cfg=ad.cfg, module=ad.module(),
            train_ds=ad.load_split(train_main),
            val_ds=ad.load_split(ad.val_dir),
            test_ds=ad.load_split(ad.test_dir),
            unlabeled_ds=ad.load_split(ad.train_unlabeled_dir),
            cells=cells,
            pred_dir_fn=lambda split, mn: ad.pred_dir(split, mn, approach),
            model_dir=ad.model_dir, csv_dir=ad.csv_dir,
            population=ad.population_first, epochs=ad.epochs, mesh=ad.mesh,
            class_to_color=ad.class_to_color, log=ad.log)
        return
    for runid in pending:
        modelname = f"{ad.prefix}_{approach}_{runid}"
        _train_cell(ad, approach, modelname, train_main,
                    population=ad.population_first)


def run_aldt_stage(ad: DatasetAdapter) -> None:
    """ALDT = build the augmented labeled set (C23), then train on it
    (reference 04_*_subset_aug.py:38-41)."""
    from .pseudo import aldt
    if ad.kind == "hela":
        aldt.create_augment_images_and_masks_hela(
            ad.train_labeled_dir, ad.train_labeled_aug_dir,
            free_rotation=ad.cfg.free_rotation)
    else:
        aldt.create_augment_images_and_masks_binary(
            os.path.join(ad.train_labeled_dir, "images"),
            os.path.join(ad.train_labeled_dir, "masks"),
            ad.train_labeled_aug_dir, channels=ad.cfg.image_channels,
            free_rotation=ad.cfg.free_rotation)
    run_supervised_stage(ad, "subset_aug", ad.train_labeled_aug_dir)


# ==========================================================================
# Stage: consistency loss  (reference 05_*.py)
# ==========================================================================

def run_consistency_stage(ad: DatasetAdapter, population: int = 5) -> None:
    from .data.loader import load_images
    from .ops.augment import AugmentParams
    from .train.checkpoint import stack_variables
    from .train.consistency import ConsistencyTrainer
    from .workflows import _finish_cell

    approach = "consistency_loss"
    d = ad.cfg.defaults
    labeled = ad.load_split(ad.train_labeled_dir)
    unlabeled = load_images(ad.images_dir(ad.train_unlabeled_dir),
                            ad.cfg.image_channels)
    val = ad.load_split(ad.val_dir)
    test = ad.load_split(ad.test_dir)
    unl_eval = ad.load_split(ad.train_unlabeled_dir)
    module = ad.module()

    for runid in ad.runids:
        for idx, strength in enumerate(CS_STRENGTHS):
            modelname = f"{ad.prefix}_{approach}_{runid}_aug_{strength}"
            # crash-resume like every other stage (cell_done keys on the
            # results CSV + topK-1 artifacts this loop writes last) — its
            # cells are the longest-running ones (NUM_EPOCHS_CS), so a
            # relay wedge mid-05 must not restart the stage from zero
            if cell_done(ad, modelname):
                continue
            warm, _ = load_variables(
                ad.topk_path(f"{ad.prefix}_subset_{runid}", 1))
            stacked = stack_variables([warm] * population)
            aug = AugmentParams(**cs_sched(ad, idx),
                                free_rotation=ad.cfg.free_rotation)
            trainer = ConsistencyTrainer(
                module, stacked,
                loss="cce" if ad.kind == "multiclass" else "mse",
                learning_rate=d.lr, weight_decay=d.wd,
                num_classes=ad.cfg.num_classes, aug_params=aug)
            trainer.fit(labeled, unlabeled, val,
                        epochs=ad.epochs or d.num_epochs_cs,
                        batch_size=d.batch_size,
                        validation_frequency=d.validation_frequency,
                        seed=d.seed, log=ad.log)

            # same benchmark/rank/topK/CSV finish as every grid cell —
            # shares one stacked forward per split and the pred_splits()
            # dump gating (workflows._finish_cell)
            _finish_cell(
                kind=ad.kind, cfg=ad.cfg, module=module, val_ds=val,
                test_ds=test, unlabeled_ds=unl_eval, modelname=modelname,
                model_dir=ad.model_dir, csv_dir=ad.csv_dir,
                pred_dir_fn=lambda s, mn: ad.pred_dir(s, mn, approach),
                best=trainer.best_variables(),
                class_to_color=ad.class_to_color, write_csv=True,
                create_pred_images=True, log=ad.log)


# ==========================================================================
# Stage: generation loops (model/input ensemble, noisy student, IM family)
# ==========================================================================

def _teacher_names(ad: DatasetAdapter, approach_tag: str, runid: int,
                   gen: int, n: Optional[int], suffix: str = "",
                   seed_approach: str = "subset") -> Callable[[int], str]:
    """modelname (without _topK_) providing the teachers of (runid, n, gen)."""
    if gen == 0:
        return f"{ad.prefix}_{seed_approach}_{runid}"
    n_part = f"_n{n}" if n is not None else ""
    return f"{ad.prefix}_{approach_tag}_{runid}{n_part}_gen{gen - 1}{suffix}"


def _im_suffix(ad: DatasetAdapter) -> str:
    c = ad.cfg
    return (f"_e{c.erode_kernel}_d{c.dilate_kernel}"
            f"_bi_{c.block_input}_bo_{c.block_output}")


def _generate_im(ad: DatasetAdapter, teachers, approach: str,
                 modelname: str, out_root: str = "",
                 teacher_alpha: Optional[float] = None):
    """IM pseudo-labels for val/test/unlabeled; returns mean-im sizes.

    ``teacher_alpha``: width of the TEACHER checkpoints — the IM+/IM++
    family grows student alpha per generation (ns_alpha), so generation
    g>=2 loads gen-(g-1) teachers wider than the config base (the
    reference has no such parameter because it loads full Keras models
    with the architecture embedded, 11_*_IM+.py:66-77)."""
    from .pseudo import (create_pseudo_labels_im_binary,
                         create_pseudo_labels_im_hela,
                         create_pseudo_labels_im_multiclass)
    c = ad.cfg
    module = ad.module(teacher_alpha)
    sizes = []
    for split in ("val", "test", "unlabeled"):
        out = ad.pred_dir(split, modelname, approach)
        if out_root:
            out = ad.pred_dir(split, os.path.join(out_root, modelname),
                              approach)
        src = ad.images_dir(ad.split_main(split))
        if ad.kind == "binary":
            sizes.append(create_pseudo_labels_im_binary(
                module, teachers, src, out, channels=c.image_channels,
                threshold=c.defaults.threshold,
                erode_kernel=c.erode_kernel, dilate_kernel=c.dilate_kernel,
                block_input=c.block_input, block_output=c.block_output))
        elif ad.kind == "hela":
            sizes.append(create_pseudo_labels_im_hela(
                module, teachers, src, out,
                threshold=c.defaults.threshold,
                erode_kernel=c.erode_kernel, dilate_kernel=c.dilate_kernel,
                block_input=c.block_input, block_output=c.block_output))
        else:
            sizes.append(create_pseudo_labels_im_multiclass(
                module, teachers, src, out, num_classes=c.num_classes,
                channels=c.image_channels, erode_kernel=c.erode_kernel,
                dilate_kernel=c.dilate_kernel, block_input=c.block_input,
                block_output=c.block_output,
                filter_unequal_class_pred=c.filter_inconsistent_class_pred))
    return sizes


def run_im_stage(ad: DatasetAdapter, approach: str = "IM",
                 seed_approach: str = "subset") -> None:
    """The IM generation loop (reference 09_*_IM.py).

    Per generation, ALL pending (runid, n) cells generate their
    pseudo-labels first, then their student populations train FUSED
    (_train_pending_cells) — the reference trains the 9 cells' 45 students
    serially."""
    suffix = _im_suffix(ad)
    for gen in ad.gens:
        pending = []
        for runid in ad.runids:
            for n in ad.n_values:
                modelname = (f"{ad.prefix}_{approach}_{runid}_n{n}"
                             f"_gen{gen}{suffix}")
                if cell_done(ad, modelname):
                    continue
                teacher_name = _teacher_names(ad, approach, runid, gen, n,
                                              suffix, seed_approach)
                teachers = ad.load_topk(teacher_name, n)
                sizes = _generate_im(ad, teachers, approach, modelname)
                pseudo_main = ad.pred_dir("unlabeled", modelname, approach)
                ad.copy_labeled_into(pseudo_main)
                # written right after generation so a crash between the
                # fused trainings cannot lose a completed cell's statistic
                write_results_csv(
                    os.path.join(ad.csv_dir,
                                 f"mean_im_size_{modelname}.csv"),
                    ["val_mean_im_size", "test_mean_im_size",
                     "unlabeled_mean_im_size"], [sizes])
                pending.append((modelname, pseudo_main))
        _train_pending_cells(ad, approach, pending)


def run_model_ensemble_stage(ad: DatasetAdapter) -> None:
    """reference 06_*_model_ensemble.py."""
    from .pseudo import (create_pseudo_labels_model_ensemble_binary,
                         create_pseudo_labels_model_ensemble_hela,
                         create_pseudo_labels_model_ensemble_multiclass)
    approach = "model_ensemble"
    module = ad.module()
    c = ad.cfg
    for gen in ad.gens:
        pending = []
        for runid in ad.runids:
            for n in ad.n_values:
                modelname = f"{ad.prefix}_{approach}_{runid}_n{n}_gen{gen}"
                if cell_done(ad, modelname):
                    continue
                teacher_name = _teacher_names(ad, approach, runid, gen, n)
                teachers = ad.load_topk(teacher_name, n)
                for split in ("val", "test", "unlabeled"):
                    out = ad.pred_dir(split, modelname, approach)
                    src = ad.images_dir(ad.split_main(split))
                    if ad.kind == "binary":
                        create_pseudo_labels_model_ensemble_binary(
                            module, teachers, src, out,
                            channels=c.image_channels,
                            threshold=c.defaults.threshold)
                    elif ad.kind == "hela":
                        create_pseudo_labels_model_ensemble_hela(
                            module, teachers, src, out,
                            threshold=c.defaults.threshold)
                    else:
                        create_pseudo_labels_model_ensemble_multiclass(
                            module, teachers, src, out,
                            channels=c.image_channels, soft=True)
                pseudo_main = ad.pred_dir("unlabeled", modelname, approach)
                ad.copy_labeled_into(pseudo_main)
                pending.append((modelname, pseudo_main))
        _train_pending_cells(ad, approach, pending)


def run_input_ensemble_stage(ad: DatasetAdapter,
                             n_views: Sequence[int] = (3, 5, 7)) -> None:
    """reference 07_*_input_ensemble.py: a SINGLE topK-1 teacher with n TTA
    views."""
    from .pseudo import (create_pseudo_labels_input_ensemble_binary,
                         create_pseudo_labels_input_ensemble_hela,
                         create_pseudo_labels_input_ensemble_multiclass)
    approach = "input_ensemble"
    module = ad.module()
    c = ad.cfg
    for gen in ad.gens:
        pending = []
        for runid in ad.runids:
            for n in n_views:
                modelname = f"{ad.prefix}_{approach}_{runid}_n{n}_gen{gen}"
                if cell_done(ad, modelname):
                    continue
                teacher_name = _teacher_names(ad, approach, runid, gen, n)
                teacher = ad.load_topk(teacher_name, 1)[0]
                for split in ("val", "test", "unlabeled"):
                    out = ad.pred_dir(split, modelname, approach)
                    src = ad.images_dir(ad.split_main(split))
                    if ad.kind == "binary":
                        create_pseudo_labels_input_ensemble_binary(
                            module, teacher, src, out,
                            channels=c.image_channels, n=n,
                            use_n_rnd_transformations=
                            c.use_n_rnd_transformations,
                            threshold=c.defaults.threshold)
                    elif ad.kind == "hela":
                        create_pseudo_labels_input_ensemble_hela(
                            module, teacher, src, out, n=n,
                            threshold=c.defaults.threshold)
                    else:
                        create_pseudo_labels_input_ensemble_multiclass(
                            module, teacher, src, out,
                            channels=c.image_channels, n=n)
                pseudo_main = ad.pred_dir("unlabeled", modelname, approach)
                ad.copy_labeled_into(pseudo_main)
                pending.append((modelname, pseudo_main))
        _train_pending_cells(ad, approach, pending)


def run_noisy_student_stage(ad: DatasetAdapter) -> None:
    """reference 08_*_noisy_student.py: growing student alpha + noise."""
    from .pseudo import (create_pseudo_labels_noisy_student_binary,
                         create_pseudo_labels_noisy_student_hela,
                         create_pseudo_labels_noisy_student_multiclass)
    approach = "noisy_student"
    c = ad.cfg
    for gen in ad.gens:
        pending = []
        for runid in ad.runids:
            modelname = f"{ad.prefix}_{approach}_{runid}_gen{gen}"
            if cell_done(ad, modelname):
                continue
            teacher_name = _teacher_names(ad, approach, runid, gen, None)
            teacher = ad.load_topk(teacher_name, 1)[0]
            out = ad.pred_dir("unlabeled", modelname, approach)
            src = ad.images_dir(ad.train_unlabeled_dir)
            kwargs = dict(**ns_sched(ad, gen),
                          free_rotation=c.free_rotation)
            # the teacher of gen g has alpha ns_alpha(g-1) (gen 0: cfg)
            t_alpha = c.alpha if gen == 0 else ns_alpha(ad, gen - 1)
            t_module = ad.module(alpha=t_alpha)
            if ad.kind == "binary":
                create_pseudo_labels_noisy_student_binary(
                    t_module, teacher, src, out,
                    channels=c.image_channels,
                    threshold=c.defaults.threshold, **kwargs)
            elif ad.kind == "hela":
                create_pseudo_labels_noisy_student_hela(
                    t_module, teacher, src, out,
                    threshold=c.defaults.threshold, **kwargs)
            else:
                create_pseudo_labels_noisy_student_multiclass(
                    t_module, teacher, src, out,
                    channels=c.image_channels,
                    num_classes=c.num_classes, **kwargs)
            ad.copy_labeled_into(out)
            pending.append((modelname, out))
        # all of a generation's runid cells share the student width
        # ns_alpha(gen), so they fuse into one packed population
        _train_pending_cells(ad, approach, pending,
                             alpha=ns_alpha(ad, gen))


def run_im_plus_stage(ad: DatasetAdapter, approach: str = "IM_plus",
                      seed_approach: str = "subset",
                      labeled_source: Optional[str] = None,
                      keep_unaugmented: bool = False) -> None:
    """IM+ (reference 11_*_IM+.py): IM -> noisy-student-style augmentation
    of the blocked pairs (NUM_IMAGES_IM_PLUS copies, originals dropped) ->
    students with growing alpha.  AIM+ (13_*_aug_IM+.py) = same with
    ALDT seeds/labeled set and keep_unaugmented=True."""
    from .pseudo.aldt import (create_augment_images_and_masks_binary,
                              create_augment_images_and_masks_hela)
    suffix = _im_suffix(ad)
    c = ad.cfg
    for gen in ad.gens:
        pending = []
        for runid in ad.runids:
            for n in ad.n_values:
                modelname = (f"{ad.prefix}_{approach}_{runid}_n{n}"
                             f"_gen{gen}{suffix}")
                if cell_done(ad, modelname):
                    continue
                teacher_name = _teacher_names(ad, approach, runid, gen, n,
                                              suffix, seed_approach)
                teachers = ad.load_topk(teacher_name, n)
                # IM into a temp dir (reference 11:67-70); gen g>0
                # teachers are the previous gen's students at
                # ns_alpha(g-1)
                _generate_im(ad, teachers, approach, modelname,
                             out_root="temp",
                             teacher_alpha=(None if gen == 0
                                            else ns_alpha(ad, gen - 1)))
                im_main = ad.pred_dir(
                    "unlabeled", os.path.join("temp", modelname), approach)
                plus_main = ad.pred_dir("unlabeled", modelname, approach)
                aug_kwargs = dict(
                    num_images=c.num_images_im_plus,
                    copy_org=keep_unaugmented,
                    **ns_sched(ad, gen),
                    free_rotation=c.free_rotation)
                if ad.kind == "hela":
                    create_augment_images_and_masks_hela(
                        im_main, plus_main, **aug_kwargs)
                else:
                    create_augment_images_and_masks_binary(
                        os.path.join(im_main, "images"),
                        os.path.join(im_main, "masks"), plus_main,
                        channels=c.image_channels, **aug_kwargs)
                ad.copy_labeled_into(plus_main,
                                     source_main=labeled_source)
                pending.append((modelname, plus_main))
        _train_pending_cells(ad, approach, pending,
                             alpha=ns_alpha(ad, gen))


# ==========================================================================
# Stage: EvalNet training + segnet filtering loop (reference 10_*_evalnet*)
# ==========================================================================

def _evalnet_module(ad: DatasetAdapter):
    from .models.evalnet import EvalNet, EvalNetMIoU
    c = ad.cfg
    if ad.kind == "binary":
        return EvalNet(alpha=c.alpha_evalnet, activation="relu",
                       normalize_b=True), False
    if ad.kind == "hela":
        return EvalNetMIoU(num_mask_channels=3, alpha=c.alpha_evalnet,
                           activation="relu", normalize_b=False), True
    return EvalNetMIoU(num_mask_channels=c.num_classes,
                       alpha=c.alpha_evalnet, activation="relu",
                       normalize_b=False), True


def _gather_candidate_models(ad: DatasetAdapter, pattern: str) -> list:
    """All checkpoints whose filename contains ``pattern`` (the reference
    loads every ISIC_2018_subset_{runid}* file, 12:73-82)."""
    out = []
    for fname in sorted(os.listdir(ad.model_dir)):
        if pattern in fname and fname.endswith(".h5"):
            variables, _ = load_variables(os.path.join(ad.model_dir, fname))
            out.append(variables)
    return out


def train_evalnet_population(ad: DatasetAdapter, evalnet_name: str,
                             train_main: str, val_main: str,
                             population: int = 5,
                             single: bool = False) -> list:
    """Train 5 EvalNet candidates from identical init, keep top-4 by val
    metric, write results CSV (reference 12:104-133).  Returns the ranked
    best variables.

    ``single=True``: the non-ensemble scripts' semantics (ISIC 10:87-104,
    SUIM 11:91-116) — ONE candidate, saved as ``{evalnet_name}.h5`` (no
    topK renames), one-row results CSV named after the model itself."""
    from .evalnet_pipeline.dataset import (load_evalnet_dataset_binary,
                                           load_evalnet_dataset_hela,
                                           load_evalnet_dataset_multiclass)
    from .evalnet_pipeline.trainer import EvalNetTrainer
    from .train.checkpoint import save_variables
    from .train.population import init_population_evalnet

    c = ad.cfg
    d = c.defaults
    if single:
        population = 1
    module, two_head = _evalnet_module(ad)
    cb = {"binary": 1, "hela": 3, "multiclass": c.num_classes}[ad.kind]
    stacked = init_population_evalnet(
        module, c.image_height, c.image_width, c.image_channels, cb,
        population=population, identical=True,
        base_seed=stable_seed(evalnet_name))
    if ad.kind == "binary":
        train_ds = load_evalnet_dataset_binary(train_main,
                                               c.image_channels)
        val_ds = load_evalnet_dataset_binary(val_main, c.image_channels)
    elif ad.kind == "hela":
        train_ds = load_evalnet_dataset_hela(train_main)
        val_ds = load_evalnet_dataset_hela(val_main)
    else:
        train_ds = load_evalnet_dataset_multiclass(
            train_main, c.num_classes, c.image_channels, classwise=True)
        val_ds = load_evalnet_dataset_multiclass(
            val_main, c.num_classes, c.image_channels, classwise=True)

    trainer = EvalNetTrainer(module, stacked, two_head=two_head,
                             learning_rate=d.lr, weight_decay=d.wd,
                             batch_size_hint=d.batch_size_evalnet,
                             image_hw=(c.image_height, c.image_width))
    trainer.fit(train_ds, val_ds,
                epochs=ad.epochs or d.num_epochs_evalnet,
                batch_size=d.batch_size_evalnet, seed=d.seed, log=ad.log)
    best = trainer.best_variables()
    # Full best-epoch val metric rows: (mse, mae) single-head / 5-col
    # two-head (reference ISIC_2018/12:110-119, functions.py:4631-4645).
    best_rows = trainer.best_rows
    if single:
        save_variables(os.path.join(ad.model_dir, f"{evalnet_name}.h5"),
                       best[0], {"modelname": evalnet_name})
        write_results_csv(
            os.path.join(ad.csv_dir, f"results_{evalnet_name}.csv"),
            ["modelname"] + trainer.metric_names,
            [(evalnet_name,) + tuple(float(v) for v in best_rows[0])])
        return best
    rows = []
    for i, variables in enumerate(best):
        mn = f"{evalnet_name}_{i}"
        save_variables(os.path.join(ad.model_dir, f"{mn}.h5"), variables,
                       {"modelname": mn})
        rows.append((mn,) + tuple(float(v) for v in best_rows[i]))
    # Per-dataset rank column and CSV header, preserving each reference
    # script's quirks:
    # - binary: rank by val MAE (ISIC 12:126 key=x[2]);
    # - hela: rank by iou_mae (HeLa 10:115 key=x[4]); header's last column
    #   is MISNAMED 'detection_mae' though the value is the detection
    #   accuracy (HeLa 10:127 vs functions.py:4706 metrics=['acc']);
    # - multiclass: rank by total loss (functions.py:4649 key=x[1]).
    if ad.kind == "binary":
        rank_col, header = 2, ["modelname"] + trainer.metric_names
    elif ad.kind == "hela":
        rank_col = 4
        header = ["modelname", "total_loss", "iou_loss", "detection_loss",
                  "iou_mae", "detection_mae"]
    else:
        rank_col, header = 1, ["modelname"] + trainer.metric_names
    order = sorted(range(len(rows)), key=lambda i: rows[i][rank_col])
    for rank, idx in enumerate(order[:d.top_ks], start=1):
        os.replace(os.path.join(ad.model_dir, f"{rows[idx][0]}.h5"),
                   ad.topk_path(evalnet_name, rank))
    # CSV filename quirk preserved: the reference names the file after the
    # LAST candidate trained in the loop (12:142 / functions.py:4665 use
    # modelname_evalnet_im, still bound to f'{evalnet_name}_{4}').
    write_results_csv(
        os.path.join(ad.csv_dir, f"results_{rows[-1][0]}.csv"),
        header, rows)
    return [best[i] for i in order]


def run_evalnet_datagen(ad: DatasetAdapter, runid: int,
                        evalnet_dir_tag: str = "evalnet_im") -> tuple:
    """IM-style EvalNet training data from the subset candidates
    (reference 12:67-97)."""
    from .evalnet_pipeline import (create_training_data_evalnet_im_binary,
                                   create_training_data_evalnet_miou_im_hela,
                                   create_training_data_evalnet_miou_im_multiclass)
    c = ad.cfg
    d = c.defaults
    teachers = _gather_candidate_models(ad, f"{ad.prefix}_subset_{runid}")
    module = ad.module()
    # fresh tree: the writers APPEND to labels.csv, so a rerun after a
    # mid-datagen crash must not duplicate rows
    shutil.rmtree(os.path.join(ad.base_dir, evalnet_dir_tag,
                               f"run_{runid}"), ignore_errors=True)
    train_main = os.path.join(ad.base_dir, evalnet_dir_tag, f"run_{runid}",
                              "train")
    val_main = os.path.join(ad.base_dir, evalnet_dir_tag, f"run_{runid}",
                            "val")
    if ad.kind == "binary":
        create_training_data_evalnet_im_binary(
            module, teachers,
            os.path.join(ad.train_labeled_dir, "images"),
            os.path.join(ad.train_labeled_dir, "masks"),
            train_main, d.num_loops_train, channels=c.image_channels)
        create_training_data_evalnet_im_binary(
            module, teachers, os.path.join(ad.val_dir, "images"),
            os.path.join(ad.val_dir, "masks"),
            val_main, d.num_loops_val, channels=c.image_channels)
    elif ad.kind == "hela":
        create_training_data_evalnet_miou_im_hela(
            module, teachers,
            os.path.join(ad.train_labeled_dir, "brightfield"),
            ad.train_labeled_dir, train_main, d.num_loops_train)
        create_training_data_evalnet_miou_im_hela(
            module, teachers, os.path.join(ad.val_dir, "brightfield"),
            ad.val_dir, val_main, d.num_loops_val)
    else:
        create_training_data_evalnet_miou_im_multiclass(
            module, teachers,
            os.path.join(ad.train_labeled_dir, "images"),
            os.path.join(ad.train_labeled_dir, "masks"),
            train_main, d.num_loops_train, num_classes=c.num_classes,
            channels=c.image_channels)
        create_training_data_evalnet_miou_im_multiclass(
            module, teachers, os.path.join(ad.val_dir, "images"),
            os.path.join(ad.val_dir, "masks"),
            val_main, d.num_loops_val, num_classes=c.num_classes,
            channels=c.image_channels)
    return train_main, val_main


def evalnet_done(ad: DatasetAdapter, evalnet_name: str,
                 single: bool = False) -> bool:
    """Crash-resume for the on-the-fly EvalNet trainings (stages 10/12-16):
    skip the datagen + training when the results CSV and the checkpoint
    artifact (topK-1 for ensembles, the plain .h5 for singles) exist.
    Disable with IM_NO_RESUME=1 (same knob as cell_done)."""
    if os.environ.get("IM_NO_RESUME") == "1":
        return False
    import glob
    ckpt = (os.path.join(ad.model_dir, f"{evalnet_name}.h5") if single
            else ad.topk_path(evalnet_name, 1))
    if single:
        csv_ok = os.path.isfile(os.path.join(
            ad.csv_dir, f"results_{evalnet_name}.csv"))
    else:
        # ensemble CSVs carry the reference's last-candidate naming quirk
        # (results_{evalnet_name}_{population-1}.csv, see
        # train_evalnet_population)
        csv_ok = bool(glob.glob(os.path.join(
            ad.csv_dir, f"results_{evalnet_name}_*.csv")))
    done = csv_ok and os.path.isfile(ckpt)
    if done and ad.log:
        ad.log(f"[resume] skipping completed evalnet {evalnet_name}")
    return done


def _min_clamped_steps(ad: DatasetAdapter, pseudo_main: str,
                       div: int = 3) -> int:
    """The mIoU segnet scripts clamp the student steps_per_epoch from
    below by the FULL training set's step count / ``div`` (reference
    SUIM/11_SUIM_evalnet_miou_ensemble.py:205-211, HeLa/10:206-213,
    Cityscapes/10:206-213; SUIM/16_SUIM_GT_IM++.py:130 uses div=1)."""
    bs = ad.cfg.defaults.batch_size
    full_dir = ad.images_dir(ad.train_full_dir)
    n_full = len(list_pngs(full_dir)) if os.path.isdir(full_dir) else 0
    n_pseudo = len(list_pngs(ad.images_dir(pseudo_main)))
    return max(n_full // bs // div, n_pseudo // bs, 1)


def run_evalnet_segnet_stage(ad: DatasetAdapter,
                             train_new_evalnet: bool = True,
                             evalnet_count: Optional[int] = None,
                             variant: str = "ensemble") -> None:
    """The segnet filtering loop (reference 10_*_evalnet[_ensemble].py):
    train EvalNet(s) per runid (on plain checkpoint predictions), then
    filter the unlabeled set's candidate masks and retrain students.

    ``variant='ensemble'``: 5-candidate EvalNet population, top-K kept,
    (n, gen) grid — modelnames ``{prefix}_segnet_{runid}_n{n}_gen{gen}``
    (HeLa: ``segnet_ensemble``, HeLa/10:148).
    ``variant='single'``: ONE EvalNet saved as ``{evalnet_name}.h5``, gen
    grid only — ``{prefix}_segnet_{runid}_gen{gen}`` (ISIC 10:113) resp.
    ``{prefix}_segnet_miou_{runid}_gen{gen}`` (SUIM 11:119)."""
    from .evalnet_pipeline import (
        create_training_data_evalnet_binary,
        create_training_data_evalnet_multiclass,
        create_training_data_for_segnet_binary,
        create_training_data_for_segnet_miou_hela,
        create_training_data_for_segnet_miou_multiclass)
    c = ad.cfg
    d = c.defaults
    seg_approach = "segnet"
    module = ad.module()
    ev_module, _two_head = _evalnet_module(ad)
    # mIoU datasets name their quality nets *_evalnet_miou_* (HeLa
    # 10:101, SUIM 11:91/102, Cityscapes 10:102)
    ev_base = ("evalnet" if ad.kind == "binary" else "evalnet_miou")

    for runid in ad.runids:
        evalnet_name = f"{ad.prefix}_{ev_base}_{runid}"
        if train_new_evalnet and not evalnet_done(
                ad, evalnet_name, single=(variant == "single")):
            # datagen from the 10 subset candidates (pred masks ___i);
            # HeLa's datagen tree lives under 'evalnet_miou_ensemble'
            # (reference HeLa/10:52-53)
            tag = "evalnet_miou_ensemble" if ad.kind == "hela" else "evalnet"
            # fresh tree (labels.csv is append-mode; see run_evalnet_datagen)
            shutil.rmtree(os.path.join(ad.base_dir, tag, f"run_{runid}"),
                          ignore_errors=True)
            train_main = os.path.join(ad.base_dir, tag,
                                      f"run_{runid}", "train")
            val_main = os.path.join(ad.base_dir, tag,
                                    f"run_{runid}", "val")
            teachers = ([] if ad.kind == "hela" else
                        _gather_candidate_models(
                            ad, f"{ad.prefix}_subset_{runid}"))
            for i, tv in enumerate(teachers):
                if ad.kind == "binary":
                    create_training_data_evalnet_binary(
                        module, tv,
                        os.path.join(ad.train_labeled_dir, "images"),
                        os.path.join(ad.train_labeled_dir, "masks"),
                        train_main, i, channels=c.image_channels)
                    create_training_data_evalnet_binary(
                        module, tv, os.path.join(ad.val_dir, "images"),
                        os.path.join(ad.val_dir, "masks"), val_main, i,
                        channels=c.image_channels)
                elif ad.kind == "multiclass":
                    # the mIoU EvalNet needs classwise labels (reference
                    # create_training_data_evalnet_miou_multiclass,
                    # functions.py:4248-4323)
                    create_training_data_evalnet_multiclass(
                        module, tv,
                        os.path.join(ad.train_labeled_dir, "images"),
                        os.path.join(ad.train_labeled_dir, "masks"),
                        train_main, i, num_classes=c.num_classes,
                        channels=c.image_channels, classwise_labels=True)
                    create_training_data_evalnet_multiclass(
                        module, tv, os.path.join(ad.val_dir, "images"),
                        os.path.join(ad.val_dir, "masks"), val_main, i,
                        num_classes=c.num_classes,
                        channels=c.image_channels, classwise_labels=True)
            if ad.kind == "hela":
                # HeLa trains its mIoU EvalNet on plain checkpoint
                # predictions from BOTH the subset (LDT, loop ids 0..9,
                # val only for the first 3) and subset_aug (ALDT, ids
                # 10..19, val for 10..12) candidates — reference
                # HeLa/10_HeLa_evalnet_miou_ensemble.py:54-91 calling
                # create_training_data_evalnet_miou_hela
                # (functions.py:4011-4135).
                from .evalnet_pipeline import (
                    create_training_data_evalnet_miou_hela)
                for fam, start, val_upto in (("subset", 0, 3),
                                             ("subset_aug", 10, 13)):
                    fam_teachers = _gather_candidate_models(
                        ad, f"{ad.prefix}_{fam}_{runid}")
                    for off, tv in enumerate(fam_teachers):
                        model_i = start + off
                        create_training_data_evalnet_miou_hela(
                            module, tv,
                            os.path.join(ad.train_labeled_dir,
                                         "brightfield"),
                            ad.train_labeled_dir, train_main, model_i)
                        if model_i < val_upto:
                            create_training_data_evalnet_miou_hela(
                                module, tv,
                                os.path.join(ad.val_dir, "brightfield"),
                                ad.val_dir, val_main, model_i)
            train_evalnet_population(ad, evalnet_name, train_main,
                                     val_main,
                                     single=(variant == "single"))

    def seg_name(runid, n, gen):
        if variant == "single":
            mid = ("segnet_miou" if ad.kind == "multiclass"
                   else "segnet")
            return f"{ad.prefix}_{mid}_{runid}_gen{gen}"
        mid = "segnet_ensemble" if ad.kind == "hela" else "segnet"
        return f"{ad.prefix}_{mid}_{runid}_n{n}_gen{gen}"

    # generation-outer filtering + FUSED student training: a generation's
    # (runid, n) cells depend only on generation g-1 artifacts (the
    # per-candidate unlabeled prediction dirs written by the benchmarks),
    # so they are independent and train as one packed population.
    n_grid = [None] if variant == "single" else list(ad.n_values)
    for gen in ad.gens:
        pending = []
        steps_list = []
        for runid in ad.runids:
            evalnet_name = f"{ad.prefix}_{ev_base}_{runid}"
            for n in n_grid:
                modelname = seg_name(runid, n, gen)
                if cell_done(ad, modelname):
                    continue
                if variant == "single":
                    variables, _ = load_variables(os.path.join(
                        ad.model_dir, f"{evalnet_name}.h5"))
                    evalnets = [variables]
                else:
                    evalnets = ad.load_topk(evalnet_name,
                                            evalnet_count or n)
                pseudo_main = ad.pred_dir("unlabeled", modelname,
                                          seg_approach)
                if gen == 0:
                    mask_dirs = [
                        ad.pred_dir("unlabeled",
                                    f"{ad.prefix}_subset_{runid}_{j}",
                                    "subset")
                        for j in range(ad.population_first)]
                    last_gen = ""
                else:
                    prev = seg_name(runid, n, gen - 1)
                    mask_dirs = [
                        ad.pred_dir("unlabeled", f"{prev}_{j}",
                                    seg_approach)
                        for j in range(ad.population_gen)]
                    last_gen = ad.pred_dir("unlabeled", prev, seg_approach)
                if ad.kind == "binary":
                    create_training_data_for_segnet_binary(
                        ev_module, evalnets,
                        os.path.join(ad.train_unlabeled_dir, "images"),
                        mask_dirs, pseudo_main, d.threshold,
                        last_gen_main_path=last_gen,
                        channels=c.image_channels)
                elif ad.kind == "hela":
                    create_training_data_for_segnet_miou_hela(
                        ev_module, evalnets,
                        os.path.join(ad.train_unlabeled_dir,
                                     "brightfield"),
                        mask_dirs, pseudo_main, d.threshold,
                        last_gen_main_path=last_gen)
                else:
                    create_training_data_for_segnet_miou_multiclass(
                        ev_module, evalnets,
                        os.path.join(ad.train_unlabeled_dir, "images"),
                        mask_dirs, pseudo_main, d.threshold,
                        num_classes=c.num_classes,
                        last_gen_main_path=last_gen,
                        channels=c.image_channels)
                ad.copy_labeled_into(pseudo_main)
                pending.append((modelname, pseudo_main))
                steps_list.append(
                    None if ad.kind == "binary" or variant == "single"
                    else _min_clamped_steps(ad, pseudo_main))
        _train_pending_cells(ad, seg_approach, pending, steps=steps_list)


def run_im_plus_plus_stage(ad: DatasetAdapter,
                           approach: str = "IM_plus_plus",
                           seed_approach: str = "subset",
                           labeled_source: Optional[str] = None,
                           evalnet_tag: str = "evalnet_im",
                           train_new_evalnet: bool = True,
                           use_gt_oracle: bool = False) -> None:
    """IM++ (reference 12_*_IM++.py): per runid train an EvalNet-IM
    ensemble on the fly, then per (n, gen): IM -> EvalNet-guided adaptive
    1-5x augmentation of the blocked pairs -> students with growing alpha.
    AIM++ (14_*) = ALDT seeds + aug labeled set.  GT_IM++ (SUIM 16) =
    use_gt_oracle=True replaces the EvalNet with true-GT scoring."""
    from .evalnet_pipeline import (
        create_augment_images_and_masks_with_evalnet_binary,
        create_augment_images_and_masks_with_evalnet_multiclass,
        create_augment_images_and_masks_with_gt)
    c = ad.cfg
    suffix = _im_suffix(ad)
    # mIoU datasets name the IM quality nets *_evalnet_miou_[aug_]im_*
    # (SUIM 13:108 / 15:108, HeLa 12/14 likewise); binary keeps
    # evalnet_[aug_]im (ISIC 12:105 / 14:104)
    if ad.kind != "binary" and not evalnet_tag.startswith("evalnet_miou"):
        evalnet_tag = evalnet_tag.replace("evalnet_", "evalnet_miou_", 1)
    ev_module, _ = _evalnet_module(ad)
    if not use_gt_oracle and train_new_evalnet:
        for runid in ad.runids:
            evalnet_name = f"{ad.prefix}_{evalnet_tag}_{runid}"
            if evalnet_done(ad, evalnet_name):
                continue
            train_main, val_main = run_evalnet_datagen(ad, runid,
                                                       evalnet_tag)
            train_evalnet_population(ad, evalnet_name, train_main,
                                     val_main)
    for gen in ad.gens:
        pending = []
        steps_list = []
        for runid in ad.runids:
            evalnet_name = f"{ad.prefix}_{evalnet_tag}_{runid}"
            for n in ad.n_values:
                modelname = (f"{ad.prefix}_{approach}_{runid}_n{n}"
                             f"_gen{gen}{suffix}")
                if cell_done(ad, modelname):
                    continue
                teacher_name = _teacher_names(ad, approach, runid, gen, n,
                                              suffix, seed_approach)
                teachers = ad.load_topk(teacher_name, n)
                sizes = _generate_im(ad, teachers, approach, modelname,
                                     out_root="temp",
                                     teacher_alpha=(None if gen == 0
                                                    else ns_alpha(ad,
                                                                  gen - 1)))
                im_main = ad.pred_dir("unlabeled",
                                      os.path.join("temp", modelname),
                                      approach)
                out_main = ad.pred_dir("unlabeled", modelname, approach)
                aug_kwargs = dict(
                    min_threshold=c.min_threshold,
                    max_threshold=c.max_threshold,
                    **ns_sched(ad, gen),
                    free_rotation=c.free_rotation)
                if use_gt_oracle:
                    create_augment_images_and_masks_with_gt(
                        im_main,
                        os.path.join(ad.train_unlabeled_dir, "masks"),
                        out_main, num_classes=c.num_classes,
                        channels=c.image_channels, **aug_kwargs)
                elif ad.kind == "binary":
                    evalnets = ad.load_topk(evalnet_name, n)
                    create_augment_images_and_masks_with_evalnet_binary(
                        ev_module, evalnets, im_main, out_main,
                        channels=c.image_channels, **aug_kwargs)
                else:
                    evalnets = ad.load_topk(evalnet_name, n)
                    create_augment_images_and_masks_with_evalnet_multiclass(
                        ev_module, evalnets, im_main, out_main,
                        num_classes=c.num_classes,
                        channels=c.image_channels, **aug_kwargs)
                ad.copy_labeled_into(out_main,
                                     source_main=labeled_source)
                # written right after generation (crash safety, as IM)
                write_results_csv(
                    os.path.join(ad.csv_dir,
                                 f"mean_im_size_{modelname}.csv"),
                    ["val_mean_im_size", "test_mean_im_size",
                     "unlabeled_mean_im_size"], [sizes])
                pending.append((modelname, out_main))
                # GT_IM++ clamps student steps by the FULL set's count
                # (reference SUIM/16:126-132, div=1)
                steps_list.append(
                    _min_clamped_steps(ad, out_main, div=1)
                    if use_gt_oracle else None)
        _train_pending_cells(ad, approach, pending,
                             alpha=ns_alpha(ad, gen), steps=steps_list)
