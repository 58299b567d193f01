"""Quality-trajectory run on the structured ISIC-scale proxy (QUALITY_r3.md).

The real ISIC 2018 archive needs network access this environment lacks, so
this drives the FULL production pipeline (the actual zero-arg CLI scripts,
real TPU, reference epochs/populations) on the structured skin-lesion proxy
(data/synthetic.make_isic_like_dataset: 2,594 train split 10/90, 100 val,
1,000 test at 256^2 — the real task's scale and split protocol, reference
ISIC_2018/01_ISIC_2018_split_original_train.py:21-57).

Round 3 uses the HARD proxy (difficulty='hard': LDT ~0.7 instead of the
round-2 generator's saturated 0.94 — VERDICT r2 weak #5) and extends the
trajectory to the EvalNet arm: 10 (evalnet ensemble + segnet), 12 (IM++),
13/14 (AIM+/AIM++) — the reference's headline strategies
(/root/reference/README.md:27,34-38).

Usage:
    python tools/run_quality_proxy.py [stage ...]
stages default to: build 02 03 04 09 11 12 10 14 13 08 06 07 05 collect
(priority order: the reference's headline strategies first).  Scale-down
knobs are inherited from the environment (IM_RUNIDS defaults to "1" here —
one runid instead of the reference's three; set IM_GENS=0,1,2 for a
breadth-first pass — every stage resumes per cell, so a later run with
the full IM_GENS=0,1,2,3,4 extends the trajectories in place).
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Default base lives INSIDE the repo (gitignored): /tmp is wiped on VM
# restarts, which round 3 learned the hard way — a wipe loses every
# cell_done resume marker and forces the multi-hour run back to zero.
BASE = os.environ.get("IM_QUALITY_BASE",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".quality_r3"))
ISIC = os.path.join(BASE, "ISIC_2018") + os.sep
CFG = os.path.join(BASE, "config.ini")

SCRIPTS = {
    "02": "02_ISIC_2018_full_dataset.py",
    "03": "03_ISIC_2018_subset.py",
    "04": "04_ISIC_2018_subset_aug.py",
    "05": "05_ISIC_2018_consistency_loss.py",
    "06": "06_ISIC_2018_model_ensemble.py",
    "07": "07_ISIC_2018_input_ensemble.py",
    "08": "08_ISIC_2018_noisy_student.py",
    "09": "09_ISIC_2018_IM.py",
    "10": "10_ISIC_2018_evalnet_ensemble.py",
    "10s": "10_ISIC_2018_evalnet.py",
    "11": "11_ISIC_2018_IM+.py",
    "12": "12_ISIC_2018_IM++.py",
    "13": "13_ISIC_2018_aug_IM+.py",
    "14": "14_ISIC_2018_aug_IM++.py",
}


def build():
    import configparser
    sys.path.insert(0, REPO)
    from inconsistencymasks_tpu.data.synthetic import make_isic_like_dataset

    # Gate regeneration on a completion sentinel, not mere existence: the
    # tree appears at the first _write, so an interrupted generation would
    # otherwise be silently accepted as complete (ADVICE r4 medium).
    done = os.path.join(BASE, ".build_done")
    if not os.path.exists(done):
        if os.path.isdir(ISIC):
            import shutil
            print("[build] partial tree without .build_done — regenerating",
                  flush=True)
            shutil.rmtree(ISIC)
        t0 = time.time()
        make_isic_like_dataset(ISIC, difficulty="hard")
        with open(done, "w") as f:
            f.write(time.strftime("%F %T") + "\n")
        print(f"[build] hard proxy dataset in {time.time() - t0:.0f}s")
    # train_full = labeled + unlabeled (the reference's 01 split goes the
    # other way: train_full is the source); hardlinks, no copies
    for sub in ("images", "masks"):
        full = os.path.join(ISIC, "train_full", sub)
        os.makedirs(full, exist_ok=True)
        for split in ("train_labeled", "train_unlabeled"):
            src_dir = os.path.join(ISIC, split, sub)
            for n in os.listdir(src_dir):
                dst = os.path.join(full, n)
                if not os.path.exists(dst):
                    os.link(os.path.join(src_dir, n), dst)
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp["ISIC_2018"]["BASE_DIR"] = ISIC
    with open(CFG, "w") as f:
        cp.write(f)
    print(f"[build] config at {CFG}")


def run_stage(num: str):
    env = dict(os.environ, IM_CONFIG=CFG)
    env.setdefault("IM_RUNIDS", "1")
    # dump prediction PNGs only for the split downstream stages consume
    # (stage-10 candidate dirs); val/test dumps are inspection artifacts
    # whose packed-mask downloads would dominate benchmark wall-clock on
    # this relay.  Unset/override to restore full reference dumps.
    env.setdefault("IM_PRED_SPLITS", "unlabeled")
    script = os.path.join(REPO, "ISIC_2018", SCRIPTS[num])
    t0 = time.time()
    print(f"[{num}] {SCRIPTS[num]} starting", flush=True)
    r = subprocess.run([sys.executable, script], env=env, cwd=REPO)
    dt = time.time() - t0
    print(f"[{num}] exit {r.returncode} in {dt / 60:.1f} min", flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)


def collect():
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "collect_quality.py"),
                    ISIC])


def main():
    stages = sys.argv[1:] or ["build", "02", "03", "04", "09", "11", "12",
                              "10", "14", "13", "08", "06", "07", "05",
                              "collect"]
    for s in stages:
        if s == "build":
            build()
        elif s == "collect":
            collect()
        else:
            run_stage(s)


if __name__ == "__main__":
    main()
