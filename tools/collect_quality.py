"""Collect the quality-trajectory table from a pipeline run's results CSVs.

Usage: python tools/collect_quality.py <BASE_DIR> [--md]

Prints, per approach cell, the TOP-1 candidate's val/test IoU (binary
header: modelname;mIoU_val;mIoU_test;... ranked by mIoU_val like the
reference's topK selection), then the mean-IM-size trajectory
(mean_im_size_*.csv, the reference's convergence signal: sizes fall as
the population agrees).  --md emits QUALITY_r3.md-ready markdown tables.
"""

import csv
import os
import re
import sys


def _read_rows(csv_dir):
    rows = []
    for fname in sorted(os.listdir(csv_dir)):
        if not fname.startswith("results_"):
            continue
        with open(os.path.join(csv_dir, fname)) as f:
            r = list(csv.reader(f, delimiter=";"))
        if not r:
            continue
        header, body = r[0], r[1:]
        if "mIoU_val" not in header:
            continue
        # HeLa cells rank by the alive/dead mIoU (the reference's headline
        # HeLa metric; BASELINE.md LDT mIoU_ad ~0.512) when present.
        iv = header.index("mIoU_ad_val" if "mIoU_ad_val" in header
                          else "mIoU_val")
        it = header.index("mIoU_ad_test" if "mIoU_ad_test" in header
                          else "mIoU_test")
        body = [b for b in body if len(b) > max(iv, it)]
        if not body:
            continue
        best = max(body, key=lambda b: float(b[iv]))
        mean_v = sum(float(b[iv]) for b in body) / len(body)
        mean_t = sum(float(b[it]) for b in body) / len(body)
        rows.append((fname[len("results_"):-len(".csv")],
                     float(best[iv]), float(best[it]), mean_v, mean_t,
                     len(body)))
    return rows


def _read_im_sizes(csv_dir):
    """mean_im_size_<cell>.csv -> {cell: mean_size} (single-value files)."""
    out = {}
    for fname in sorted(os.listdir(csv_dir)):
        if not fname.startswith("mean_im_size_"):
            continue
        with open(os.path.join(csv_dir, fname)) as f:
            r = list(csv.reader(f, delimiter=";"))
        vals = [float(c) for row in r for c in row
                if re.fullmatch(r"[0-9.]+", c or "")]
        if vals:
            out[fname[len("mean_im_size_"):-len(".csv")]] = vals[-1]
    return out


def main(base, md=False):
    csv_dir = os.path.join(base, "csv")
    rows = _read_rows(csv_dir)
    sizes = _read_im_sizes(csv_dir)

    if md:
        print("| cell | top1 val | top1 test | mean val | mean test | n |")
        print("|---|---|---|---|---|---|")
        for name, bv, bt, mv, mt, n in rows:
            print(f"| {name} | {bv:.3f} | {bt:.3f} | {mv:.3f} | "
                  f"{mt:.3f} | {n} |")
        if sizes:
            print("\n| cell | mean IM size |")
            print("|---|---|")
            for name, v in sizes.items():
                print(f"| {name} | {v:.1f} |")
        return

    print(f"{'cell':55s} {'top1_val':>8s} {'top1_test':>9s} "
          f"{'mean_val':>8s} {'mean_test':>9s} {'n':>3s}")
    for name, bv, bt, mv, mt, n in rows:
        print(f"{name:55s} {bv:8.3f} {bt:9.3f} {mv:8.3f} {mt:9.3f} {n:3d}")
    if sizes:
        print(f"\n{'cell (mean IM size)':55s} {'size':>10s}")
        for name, v in sizes.items():
            print(f"{name:55s} {v:10.1f}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--md"]
    main(args[0] if args else "/tmp/isic_proxy/ISIC_2018/",
         md="--md" in sys.argv)
