"""High-level training workflows — the "grid cell" every pipeline script
runs: train a population of candidates, benchmark each best-epoch model on
val/test/unlabeled, save ``{modelname}_{i}.h5``, rank, rename the top-K to
``{modelname}_topK_{i}.h5``, and return the CSV rows.

The reference runs this cell serially per candidate (e.g.
ISIC_2018/03_ISIC_2018_subset.py:43-104); here the population trains as one
vmapped program (train/trainer.py) and only the benchmarks loop per
candidate.

Ranking parity (the part that decides which models seed the next
generation):
- ISIC/binary: sort by benchmark mIoU_val desc (03:82);
- HeLa: sort by mcce_test ASC — the reference keys on x[6] = cell-count
  error on TEST (HeLa/03_HeLa_subset.py:82);
- multiclass: sort by mIoU_val desc (SUIM/04_SUIM_subset.py:84, x[4]).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional

from jax.sharding import Mesh

from .config import DatasetConfig
from .data.loader import Dataset
from .evaluate.benchmark import (benchmark_binary, benchmark_hela,
                                 benchmark_multiclass)
from .models.unet import UNet
from .train.checkpoint import save_variables
from .train.population import init_population
from .train.trainer import Monitor, PopulationTrainer
from .utils.csv_io import write_results_csv

BINARY_HEADER = ["modelname", "mIoU_val", "mIoU_test", "mIoU_train_unlabeled",
                 "dice_score_val", "dice_score_test",
                 "dice_score_train_unlabeled"]
HELA_HEADER = ["modelname", "mIoU_val", "mIoU_ad_val", "mcce_val",
               "mIoU_test", "mIoU_ad_test", "mcce_test", "mIoU_unlabeled",
               "mIoU_ad_unlabeled", "mcce_unlabeled"]
MULTICLASS_HEADER = ["modelname", "mPA_val", "mPA_test", "mPA_train_unlabeled",
                     "mIoU_val", "mIoU_test", "mIoU_train_unlabeled"]


@dataclass
class GridCellResult:
    rows: list                      # CSV rows, candidate order
    ranked_rows: list               # rows sorted by the selection key
    best_variables: list            # per-candidate best-epoch variables
    header: list = field(default_factory=list)


def make_unet(cfg: DatasetConfig, alpha: Optional[float] = None,
              dropout: float = 0.0) -> UNet:
    return UNet(
        num_classes=cfg.num_classes,
        alpha=cfg.alpha if alpha is None else alpha,
        activation=cfg.actifu,
        out_activation=cfg.actifu_output,
        dropout_rate_encoder=dropout,
        dropout_rate_decoder=dropout,
    )


def _hbm_chunk_candidates(cfg: DatasetConfig, module) -> int:
    """How many packed candidates fit one training program in HBM.

    Anchor: measured on v5e-1, 15 candidates at alpha 0.5, 256^2, batch
    32, 1-channel f32 head (pop 30 does not compile — ~19 GiB).  Other
    configurations scale by relative per-candidate cost: activation bytes
    ~ alpha x pixels; the f32 softmax/one-hot/loss chain adds
    ~num_classes-proportional head bytes (noisy-student/IM+ generations
    reach alpha 1.5-2.0; Cityscapes heads have 35 classes).  An explicit
    IM_MERGE_MAX is respected verbatim."""
    merge_env = os.environ.get("IM_MERGE_MAX")
    if merge_env is not None:
        return max(int(merge_env), 1)
    px = cfg.image_height * cfg.image_width
    alpha = getattr(module, "alpha", 0.5)
    rel = ((alpha / 0.5) * (px / 65536.0)
           * (1.0 + 0.1 * max(cfg.num_classes - 1, 0)))
    return max(int(round(15.0 / max(rel, 1e-6))), 1)


def _is_oom(err: Exception) -> bool:
    s = str(err)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "OOM" in s


def _sort_spec(kind: str):
    if kind == "binary":
        return 1, True        # mIoU_val desc
    if kind == "hela":
        return 6, False       # mcce_test asc (reference HeLa/03:82)
    if kind == "multiclass":
        return 4, True        # mIoU_val desc
    raise ValueError(kind)


def run_grid_cell(
    *,
    kind: str,                       # 'binary' | 'hela' | 'multiclass'
    cfg: DatasetConfig,
    module: UNet,
    train_ds: Dataset,
    val_ds: Dataset,
    test_ds: Dataset,
    unlabeled_ds: Dataset,
    modelname: str,
    model_dir: str,
    csv_dir: str,
    pred_dir_fn: Callable[[str, str], str],  # (split, modelname_i) -> dir
    population: int,
    epochs: Optional[int] = None,
    steps_per_epoch: Optional[int] = None,
    base_seed: int = 0,
    mesh: Optional[Mesh] = None,
    initial_variables=None,          # warm start (noisy student / IM+)
    class_to_color: Optional[dict] = None,
    write_csv: bool = True,
    create_pred_images: bool = True,
    log=print,
) -> GridCellResult:
    d = cfg.defaults
    epochs = d.num_epochs if epochs is None else epochs

    import jax

    if initial_variables is None:
        stacked = init_population(module, cfg.image_height, cfg.image_width,
                                  cfg.image_channels, population, base_seed)
    else:
        stacked = initial_variables

    monitor = {"binary": Monitor.isic(), "hela": Monitor.hela(),
               "multiclass": Monitor.multiclass()}[kind]
    loss = "cce" if kind == "multiclass" else "mse"

    # HBM-bounded candidate chunks (one chunk = one fused packed program;
    # the anchor config trains all 10 FDT/LDT candidates in one).
    # Equalized via ceil-division so population % chunk does not leave a
    # smaller final chunk — a distinct program shape costs a separate
    # multi-minute remote compile (same scheme as run_grid_cells_merged).
    # _hbm_chunk_candidates is an extrapolation from one measured anchor,
    # so the first compile of each chunk size is guarded: an OOM halves
    # the chunk and retries instead of killing a production run hours in.
    merge_max = _hbm_chunk_candidates(cfg, module)
    n_chunks = -(-population // merge_max)
    chunk = -(-population // n_chunks)
    best = []
    start = 0
    while start < population:
        part = jax.tree.map(lambda a: a[start:start + chunk], stacked)
        trainer = PopulationTrainer(
            module, part, loss=loss, monitor=monitor,
            learning_rate=d.lr, weight_decay=d.wd,
            num_classes=cfg.num_classes, mesh=mesh)
        try:
            trainer.fit(train_ds, val_ds, epochs=epochs,
                        batch_size=d.batch_size,
                        steps_per_epoch=steps_per_epoch, seed=d.seed,
                        log=(lambda m: log(f"[{modelname}] {m}"))
                        if log else None)
        except Exception as e:              # noqa: BLE001
            if chunk > 1 and _is_oom(e):
                chunk = max(chunk // 2, 1)
                if log:
                    log(f"[{modelname}] HBM OOM — retrying with "
                        f"chunk={chunk}")
                del trainer
                continue
            raise
        best.extend(trainer.best_variables())
        del trainer
        start += chunk

    return _finish_cell(
        kind=kind, cfg=cfg, module=module, val_ds=val_ds, test_ds=test_ds,
        unlabeled_ds=unlabeled_ds, modelname=modelname, model_dir=model_dir,
        csv_dir=csv_dir, pred_dir_fn=pred_dir_fn,
        best=best, class_to_color=class_to_color,
        write_csv=write_csv, create_pred_images=create_pred_images, log=log)


def pred_splits() -> Optional[set]:
    """Which splits dump prediction PNGs (None = all).

    ``IM_PRED_SPLITS`` (comma list of val/test/unlabeled; ``all``;
    ``none``) overrides.  Default: **unlabeled only** — the only dumps any
    downstream stage consumes (the per-candidate dirs feeding stage 10;
    reference functions.py:1106-1133 writes val/test trees too, but nothing
    reads them back — they are inspection artifacts).  Metrics are device
    scalars either way; skipping a split's dump skips its packed-mask
    download (~8 KB/image over the ~1 MB/s relay) and its PNG encodes.
    Set ``IM_PRED_SPLITS=all`` for full reference-parity dumps."""
    raw = os.environ.get("IM_PRED_SPLITS")
    if raw is None:
        return {"unlabeled"}
    raw = raw.strip().lower()
    if raw == "all":
        return None
    if raw in ("", "none"):
        return set()
    return {s.strip() for s in raw.split(",")}


def _finish_cell(*, kind, cfg, module, val_ds, test_ds, unlabeled_ds,
                 modelname, model_dir, csv_dir, pred_dir_fn, best,
                 class_to_color, write_csv, create_pred_images, log
                 ) -> GridCellResult:
    """Post-training half of a grid cell: benchmark each candidate on
    val/test/unlabeled, save, rank, topK-rename, CSV (reference 03:82-106).

    All K candidates share ONE stacked forward pass per split
    (evaluate/benchmark.py population benchmarks) instead of the
    reference's per-candidate loops; ``IM_BENCH_STACKED=0`` restores the
    per-candidate path.  Prediction-PNG dumps follow ``pred_splits()``
    (default: unlabeled only)."""
    from .evaluate import benchmark as _bm

    d = cfg.defaults
    allowed = pred_splits()

    def want(split):
        return create_pred_images and (allowed is None or split in allowed)

    d2h0 = _bm.d2h_bytes()
    stacked_ok = (os.environ.get("IM_BENCH_STACKED", "1") != "0"
                  and len(best) > 1)
    names = [f"{modelname}_{i}" for i in range(len(best))]
    for mn, variables in zip(names, best):
        save_variables(os.path.join(model_dir, f"{mn}.h5"), variables,
                       {"modelname": mn, "module": repr(module)})

    splits = (("val", val_ds), ("test", test_ds),
              ("unlabeled", unlabeled_ds))

    if stacked_ok:
        per_split = []
        for split, ds in splits:
            dirs = [pred_dir_fn(split, mn) if want(split) else None
                    for mn in names]
            if kind == "binary":
                per_split.append(_bm.benchmark_binary_population(
                    module, best, ds, pred_dirs=dirs))
            elif kind == "hela":
                per_split.append(_bm.benchmark_hela_population(
                    module, best, ds, pred_dirs=dirs))
            else:
                per_split.append(_bm.benchmark_multiclass_population(
                    module, best, ds, num_classes=cfg.num_classes,
                    class_to_color=class_to_color or {}, pred_dirs=dirs))
        rows = []
        for i, mn in enumerate(names):
            v, t, u = (per_split[0][i], per_split[1][i], per_split[2][i])
            if kind == "binary":
                rows.append((mn, v[0], t[0], u[0], v[1], t[1], u[1]))
            elif kind == "hela":
                rows.append((mn, *v, *t, *u))
            else:
                rows.append((mn, v[0], t[0], u[0], v[1], t[1], u[1]))
            if log:
                log(f"[{modelname}] candidate {i}: {rows[-1][1:]}")
    else:
        rows = []
        for i, (mn, variables) in enumerate(zip(names, best)):
            if kind == "binary":
                r = [mn]
                for split, ds in splits:
                    miou, dice = benchmark_binary(
                        module, variables, ds,
                        pred_dir=pred_dir_fn(split, mn),
                        create_images=want(split))
                    r.append((miou, dice))
                mious, dices = zip(*r[1:])
                rows.append((mn, *mious, *dices))
            elif kind == "hela":
                r = [mn]
                for split, ds in splits:
                    r.append(benchmark_hela(
                        module, variables, ds,
                        pred_dir=pred_dir_fn(split, mn),
                        save_output=want(split)))
                rows.append((mn, *r[1], *r[2], *r[3]))
            else:
                r = [mn]
                for split, ds in splits:
                    r.append(benchmark_multiclass(
                        module, variables, ds, num_classes=cfg.num_classes,
                        class_to_color=class_to_color or {},
                        pred_dir=pred_dir_fn(split, mn),
                        create_images=want(split)))
                (mpa_v, miou_v), (mpa_t, miou_t), (mpa_u, miou_u) = r[1:]
                rows.append((mn, mpa_v, mpa_t, mpa_u, miou_v, miou_t,
                             miou_u))
            if log:
                log(f"[{modelname}] candidate {i}: {rows[-1][1:]}")
    if log:
        log(f"[{modelname}] benchmark d2h "
            f"{(_bm.d2h_bytes() - d2h0) / 1e6:.1f} MB "
            f"({len(best)} candidates, dumps="
            f"{'all' if allowed is None else ','.join(sorted(allowed)) or 'none'})")

    key_idx, desc = _sort_spec(kind)
    order = sorted(range(len(rows)), key=lambda i: rows[i][key_idx],
                   reverse=desc)
    ranked_rows = [rows[i] for i in order]

    # topK rename protocol (reference 03:89-93)
    for rank, idx in enumerate(order[:d.top_ks], start=1):
        old = os.path.join(model_dir, f"{rows[idx][0]}.h5")
        new = os.path.join(model_dir, f"{modelname}_topK_{rank}.h5")
        os.replace(old, new)

    header = {"binary": BINARY_HEADER, "hela": HELA_HEADER,
              "multiclass": MULTICLASS_HEADER}[kind]
    if write_csv:
        write_results_csv(os.path.join(csv_dir, f"results_{modelname}.csv"),
                          header, rows)

    return GridCellResult(rows=rows, ranked_rows=ranked_rows,
                          best_variables=[best[i] for i in order],
                          header=header)


def run_grid_cells_merged(
    *,
    kind: str,
    cfg: DatasetConfig,
    module: UNet,
    train_ds: Dataset,
    val_ds: Dataset,
    test_ds: Dataset,
    unlabeled_ds: Dataset,
    cells,                            # [(modelname, base_seed), ...]
    pred_dir_fn: Callable[[str, str], str],
    model_dir: str,
    csv_dir: str,
    population: int,
    epochs: Optional[int] = None,
    steps_per_epoch: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    class_to_color: Optional[dict] = None,
    train_datasets: Optional[list] = None,   # per-cell sets (fit_multi)
    steps_per_cell: Optional[list] = None,   # per-cell steps (None entries
                                             # default to len(ds)//batch)
    log=print,
) -> list:
    """Train SEVERAL grid cells that share one training set as a single
    fused population (len(cells) x population candidates in one packed
    program), then finish each cell separately (benchmarks, topK renames,
    results CSV) exactly as a solo :func:`run_grid_cell` would.

    Motivation: the reference's runid loop re-trains the identical
    configuration 3x serially (ISIC_2018/03_ISIC_2018_subset.py:44); the
    candidates differ only by init, and all consume the same seeded stream
    (functions.py:208), so fusing runids multiplies the packed population
    — at alpha 0.5 the 8-channel full-res level fits 16 models in one
    128-lane MXU pass (models/packed_unet.py) — without changing any
    per-cell artifact.  Per-cell init seeds are preserved, so a merged run
    produces the same candidates as three solo runs (crash-resume safe).
    """
    import jax
    import jax.numpy as jnp

    d = cfg.defaults
    epochs = d.num_epochs if epochs is None else epochs
    stacks = [init_population(module, cfg.image_height, cfg.image_width,
                              cfg.image_channels, population, seed)
              for _, seed in cells]
    stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs), *stacks)

    monitor = {"binary": Monitor.isic(), "hela": Monitor.hela(),
               "multiclass": Monitor.multiclass()}[kind]
    loss = "cce" if kind == "multiclass" else "mse"
    tag = "+".join(mn for mn, _ in cells)

    # Train in candidate chunks sized by HBM cost (_hbm_chunk_candidates);
    # with per-cell train_datasets, chunks respect cell boundaries
    # (fit_multi).
    total = len(cells) * population
    merge_max = _hbm_chunk_candidates(cfg, module)
    if train_datasets is None:
        n_chunks = -(-total // merge_max)
        chunk = -(-total // n_chunks)
    else:
        assert len(train_datasets) == len(cells)
        cells_per_chunk = max(merge_max // population, 1)
        chunk = cells_per_chunk * population
        if steps_per_cell is not None:
            assert len(steps_per_cell) == len(cells)
            steps_per_cell = [
                s if s is not None else max(len(ds) // d.batch_size, 1)
                for s, ds in zip(steps_per_cell, train_datasets)]
    best = []
    start = 0
    while start < total:
        part = jax.tree.map(lambda a: a[start:start + chunk], stacked)
        trainer = PopulationTrainer(
            module, part, loss=loss, monitor=monitor,
            learning_rate=d.lr, weight_decay=d.wd,
            num_classes=cfg.num_classes, mesh=mesh)
        chunk_log = ((lambda m: log(f"[{tag} {start}:{start + chunk}] {m}"))
                     if log else None)
        try:
            if train_datasets is None:
                trainer.fit(
                    train_ds, val_ds, epochs=epochs,
                    batch_size=d.batch_size,
                    steps_per_epoch=steps_per_epoch, seed=d.seed,
                    log=chunk_log)
            else:
                cell_lo = start // population
                cell_hi = min((start + chunk) // population, len(cells))
                trainer.fit_multi(
                    train_datasets[cell_lo:cell_hi], val_ds, epochs=epochs,
                    batch_size=d.batch_size,
                    steps_per_epoch=(steps_per_cell[cell_lo:cell_hi]
                                     if steps_per_cell is not None
                                     else steps_per_epoch),
                    seed=d.seed, log=chunk_log)
        except Exception as e:              # noqa: BLE001
            # uncalibrated-HBM-estimate guard: halve the chunk and retry
            # (cell-granular when per-cell datasets pin the layout)
            shrinkable = (chunk > 1 if train_datasets is None
                          else chunk > population)
            if shrinkable and _is_oom(e):
                if train_datasets is None:
                    chunk = max(chunk // 2, 1)
                else:
                    cells_per_chunk = max((chunk // population) // 2, 1)
                    chunk = cells_per_chunk * population
                if log:
                    log(f"[{tag}] HBM OOM — retrying with chunk={chunk}")
                del trainer
                continue
            raise
        best.extend(trainer.best_variables())
        del trainer
        start += chunk

    results = []
    for ci, (modelname, _) in enumerate(cells):
        results.append(_finish_cell(
            kind=kind, cfg=cfg, module=module, val_ds=val_ds,
            test_ds=test_ds, unlabeled_ds=unlabeled_ds,
            modelname=modelname, model_dir=model_dir, csv_dir=csv_dir,
            pred_dir_fn=pred_dir_fn,
            best=best[ci * population:(ci + 1) * population],
            class_to_color=class_to_color, write_csv=True,
            create_pred_images=True, log=log))
    return results
