"""Render the reference-style results figure from a quality run's CSVs.

The reference's headline deliverable is a per-dataset chart of test-set
quality per strategy (/root/reference/README.md:27 -> main_results.png).
This renders the same view for a proxy run driven by
tools/run_quality_proxy.py: top-1 test IoU (candidate selected by VAL IoU,
the reference's topK rule, ISIC_2018/03_ISIC_2018_subset.py:86-97) versus
pseudo-label generation, one line per strategy, with the LDT/ALDT/FDT
baselines as neutral reference lines.

Strategies are faceted into two panels (IM family vs the other SSL
strategies) so each panel stays within the validated categorical palette's
series budget; every line is direct-labeled at its end.

Usage: python tools/make_results_figure.py <BASE_DIR> [out.png]
"""

import csv
import os
import re
import sys
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Categorical palette (validated fixed order, light mode) + text/neutral ink.
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e4e3de"
SURFACE = "#fcfcfb"

# results_<cell>.csv name -> (strategy, generation).  Cell grammar comes from
# pipeline.py's model names (reference script naming, e.g.
# ISIC_2018_IM_plus_1_n2_gen3_e0_d0_bi_True_bo_True).
STRATEGIES = [
    ("aug_IM_plus_plus", "AIM++"),
    ("aug_IM_plus", "AIM+"),
    ("IM_plus_plus", "IM++"),
    ("IM_plus", "IM+"),
    ("IM", "IM"),
    ("noisy_student", "Noisy Student"),
    ("model_ensemble", "Model Ensemble"),
    ("input_ensemble", "Input Ensemble"),
    ("consistency_loss", "Consistency"),
    ("segnet", "EvalNet (segnet)"),
]
BASELINES = [("subset_aug", "ALDT"), ("full_dataset", "FDT"),
             ("subset", "LDT")]
PANELS = [
    ("IM family", ["IM", "IM+", "IM++", "AIM+", "AIM++"]),
    ("Other SSL strategies", ["Consistency", "Model Ensemble",
                              "Input Ensemble", "Noisy Student",
                              "EvalNet (segnet)"]),
]


def read_cells(csv_dir):
    """-> {cell_name: (top1_val, top1_test)} selected by val IoU."""
    cells = {}
    for fname in sorted(os.listdir(csv_dir)):
        if not fname.startswith("results_") or not fname.endswith(".csv"):
            continue
        with open(os.path.join(csv_dir, fname)) as f:
            rows = list(csv.reader(f, delimiter=";"))
        if not rows or "mIoU_val" not in rows[0]:
            continue
        iv, it = rows[0].index("mIoU_val"), rows[0].index("mIoU_test")
        body = [r for r in rows[1:] if len(r) > max(iv, it)]
        if not body:
            continue
        best = max(body, key=lambda r: float(r[iv]))
        cells[fname[len("results_"):-len(".csv")]] = (
            float(best[iv]), float(best[it]))
    return cells


def classify(cell):
    """cell name -> (strategy_label, generation) or None."""
    for key, label in BASELINES:
        if re.fullmatch(rf"[A-Za-z_0-9]*{key}_\d+", cell):
            return label, None
    m = re.search(r"_gen(\d+)", cell)
    gen = int(m.group(1)) if m else None
    for key, label in STRATEGIES:
        if f"_{key}_" in cell:
            # consistency cells carry an aug strength, not a generation —
            # plot their best as a single gen-0 point
            return label, 0 if gen is None else gen
    return None


def collect(csv_dir, extra_csvs=()):
    """-> ({strategy: {gen: test_iou}}, {baseline: test_iou}).

    Per (strategy, gen) the cell with the best top-1 VAL IoU wins (val
    selection across the n-grid, test reported) — the reference's rule.
    Each ``extra_csvs`` file supplements cells from an earlier run of the
    same protocol (``cell;top1_val;top1_test`` rows); strategies drawn
    entirely from supplements are labeled with their source tag.
    """
    items = [(c, vt, None) for c, vt in read_cells(csv_dir).items()]
    for extra_csv in extra_csvs:
        tag = None
        with open(extra_csv) as f:
            for row in csv.reader(f, delimiter=";"):
                if not row or row[0].startswith("#"):
                    if row and row[0].startswith("#source:"):
                        tag = row[0][len("#source:"):].strip()
                    continue
                items.append((row[0], (float(row[1]), float(row[2])),
                              tag or "supplement"))
    lines, bases = defaultdict(dict), {}
    best_val, sources = defaultdict(dict), defaultdict(set)
    for cell, (v, t), src in items:
        c = classify(cell)
        if not c:
            continue
        label, gen = c
        if gen is None:
            if v > bases.get(label, (-1, -1, None))[0]:
                bases[label] = (v, t, src)
            continue
        if v > best_val[label].get(gen, -1):
            best_val[label][gen] = v
            lines[label][gen] = t
            sources[label].add(src)
    renamed = {}
    for label, d in lines.items():
        srcs = sources[label] - {None}
        if srcs and sources[label] == srcs:  # every point is supplemental
            renamed[f"{label} ({sorted(srcs)[0]})"] = d
        else:
            renamed[label] = d
    return renamed, {(k if src is None else f"{k} ({src})"): t
                     for k, (v, t, src) in bases.items()}


def main(base, out, extra_csvs=(), suptitle=None):
    lines, bases = collect(os.path.join(base, "csv"), extra_csvs)

    def resolve(name):
        return next((k for k in lines
                     if k == name or k.startswith(name + " (")), None)

    panels = [(title, [r for r in map(resolve, names) if r and lines[r]])
              for title, names in PANELS]
    panels = [(t, n) for t, n in panels if n]
    if not panels:
        print("no strategy cells found — nothing to plot")
        return
    fig, axes = plt.subplots(1, len(panels), figsize=(5.4 * len(panels), 4.2),
                             sharey=True, facecolor=SURFACE)
    axes = [axes] if len(panels) == 1 else list(axes)
    all_gens = sorted({g for d in lines.values() for g in d})
    for ax, (title, names) in zip(axes, panels):
        ax.set_facecolor(SURFACE)
        edge_labels = []  # (y, text, ink) placed in one pass, collision-free
        for label, t in sorted(bases.items(), key=lambda kv: kv[1]):
            ax.axhline(t, color=INK_2, lw=1, ls=(0, (4, 3)), zorder=1)
            edge_labels.append((t, f"{label} {t:.3f}", INK_2))
        for i, name in enumerate(names):
            d = lines[name]
            gens = sorted(d)
            col = SERIES[i % len(SERIES)]
            ax.plot(gens, [d[g] for g in gens], color=col, lw=2,
                    marker="o", ms=5, zorder=3,
                    mec=SURFACE, mew=1)
            edge_labels.append((d[gens[-1]], name, INK))
        # spread right-edge labels to a minimum vertical separation
        ys = [y for y, _, _ in edge_labels]
        gap = 0.055 * (max(ys) - min(ys) + 1e-9)
        edge_labels.sort()
        placed = []
        for y, text, ink in edge_labels:
            if placed and y - placed[-1] < gap:
                y = placed[-1] + gap
            placed.append(y)
            ax.annotate(text, (all_gens[-1] + 0.12, y),
                        color=ink, fontsize=8.5, va="center", zorder=4,
                        bbox=dict(fc=SURFACE, ec="none", pad=0.4))
        ax.set_title(title, color=INK, fontsize=11, loc="left")
        ax.set_xlabel("pseudo-label generation", color=INK_2, fontsize=9)
        ax.set_xticks(all_gens)
        ax.set_xlim(all_gens[0] - 0.2, all_gens[-1] + 1.25)
        ax.tick_params(colors=INK_2, labelsize=8.5)
        ax.grid(axis="y", color=GRID, lw=0.8)
        for side in ("top", "right", "left"):
            ax.spines[side].set_visible(False)
        ax.spines["bottom"].set_color(GRID)
    axes[0].set_ylabel("top-1 test IoU (selected by val IoU)", color=INK_2,
                       fontsize=9)
    if suptitle is None:
        ds = os.path.basename(os.path.normpath(base))
        suptitle = (f"SSL strategy quality on the hard {ds} proxy\n"
                    "(real CLIs, reference populations/epochs, TPU v5e)")
    fig.suptitle(suptitle, color=INK, fontsize=11, x=0.02, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.90))
    fig.savefig(out, dpi=160, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    extras = []
    while "--extra" in argv:
        i = argv.index("--extra")
        extras.append(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    title = None
    if "--title" in argv:
        i = argv.index("--title")
        title = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main(argv[0] if argv else "/root/repo/.quality_r3/ISIC_2018",
         argv[1] if len(argv) > 1 else "quality_results.png", extras,
         suptitle=title)
