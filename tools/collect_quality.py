"""Collect the quality-trajectory table from a pipeline run's results CSVs.

Usage: python tools/collect_quality.py <BASE_DIR>

Prints, per approach cell, the TOP-1 candidate's val/test IoU (binary
header: modelname;mIoU_val;mIoU_test;... ranked by mIoU_val like the
reference's topK selection)."""

import csv
import os
import sys


def main(base):
    csv_dir = os.path.join(base, "csv")
    rows = []
    for fname in sorted(os.listdir(csv_dir)):
        if not fname.startswith("results_"):
            continue
        with open(os.path.join(csv_dir, fname)) as f:
            r = list(csv.reader(f, delimiter=";"))
        header, body = r[0], r[1:]
        if "mIoU_val" not in header:
            continue
        iv = header.index("mIoU_val")
        it = header.index("mIoU_test")
        body = [b for b in body if len(b) > max(iv, it)]
        if not body:
            continue
        best = max(body, key=lambda b: float(b[iv]))
        mean_v = sum(float(b[iv]) for b in body) / len(body)
        mean_t = sum(float(b[it]) for b in body) / len(body)
        rows.append((fname[len("results_"):-len(".csv")],
                     float(best[iv]), float(best[it]), mean_v, mean_t,
                     len(body)))
    print(f"{'cell':55s} {'top1_val':>8s} {'top1_test':>9s} "
          f"{'mean_val':>8s} {'mean_test':>9s} {'n':>3s}")
    for name, bv, bt, mv, mt, n in rows:
        print(f"{name:55s} {bv:8.3f} {bt:9.3f} {mv:8.3f} {mt:9.3f} {n:3d}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/isic_proxy/ISIC_2018/")
