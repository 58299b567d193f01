"""Multiclass (mIoU-arm) quality run on the structured SUIM-like proxy.

VERDICT r3 next-#2: every quality number so far is binary/ISIC; the whole
mIoU arm — two-head EvalNet scoring (reference functions.py:5468-5577),
classwise-IoU+detection datagen (functions.py:3773-4006), detection-masked
filtering (functions.py:5421-5434) — has only tiny-shape CPU coverage.
This drives the REAL SUIM zero-arg CLIs on the real TPU against
data/synthetic.make_suim_like_dataset (class 0 = IM, 9 classes, the real
task's crop counts; LDT calibration target ~0.333 mIoU per BASELINE.md).

Usage:
    python tools/run_quality_multiclass.py [stage ...]
stages default to: build 04 05 10 12 13 11 collect
(SUIM numbering: 04=LDT, 05=ALDT, 10=IM, 12=IM+, 13=IM++,
11=evalnet_miou_ensemble/segnet — reference SUIM/README run order).
Scale-down via env: IM_RUNIDS=1 (default here), IM_GENS=0,1 (default
here — a later run with more gens resumes per cell in place), IM_N_VALUES
inherits each wrapper's reference grid unless set.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("IM_QUALITY_MC_BASE", os.path.join(REPO, ".quality_mc"))
SUIM = os.path.join(BASE, "SUIM") + os.sep
CFG = os.path.join(BASE, "config.ini")

SCRIPTS = {
    "03": "03_SUIM_full_dataset.py",
    "04": "04_SUIM_subset.py",
    "05": "05_SUIM_subset_aug.py",
    "06": "06_SUIM_consistency_loss.py",
    "07": "07_SUIM_model_ensemble.py",
    "08": "08_SUIM_input_ensemble.py",
    "09": "09_SUIM_noisy_student.py",
    "10": "10_SUIM_IM.py",
    "11": "11_SUIM_evalnet_miou_ensemble.py",
    "11s": "11_SUIM_evalnet_miou.py",
    "12": "12_SUIM_IM+.py",
    "13": "13_SUIM_IM++.py",
    "14": "14_SUIM_aug_IM+.py",
    "15": "15_SUIM_aug_IBAs++.py",
    "16": "16_SUIM_GT_IM++.py",
}


def build():
    import configparser
    sys.path.insert(0, REPO)
    from inconsistencymasks_tpu.data.synthetic import make_suim_like_dataset

    # Completion sentinel, not mere existence: the tree appears at the
    # first _write, so an interrupted generation would otherwise be
    # silently accepted as complete (ADVICE r4 medium).
    done = os.path.join(BASE, ".build_done")
    if not os.path.exists(done):
        if os.path.isdir(SUIM):
            import shutil
            print("[build] partial tree without .build_done — regenerating",
                  flush=True)
            shutil.rmtree(SUIM)
        t0 = time.time()
        make_suim_like_dataset(SUIM, difficulty="hard")
        with open(done, "w") as f:
            f.write(time.strftime("%F %T") + "\n")
        print(f"[build] SUIM-like proxy in {time.time() - t0:.0f}s",
              flush=True)
    for sub in ("images", "masks"):
        full = os.path.join(SUIM, "train_full", sub)
        os.makedirs(full, exist_ok=True)
        for split in ("train_labeled", "train_unlabeled"):
            src_dir = os.path.join(SUIM, split, sub)
            for n in os.listdir(src_dir):
                dst = os.path.join(full, n)
                if not os.path.exists(dst):
                    os.link(os.path.join(src_dir, n), dst)
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp["SUIM"]["BASE_DIR"] = SUIM
    with open(CFG, "w") as f:
        cp.write(f)
    print(f"[build] config at {CFG}", flush=True)


def run_stage(num: str):
    env = dict(os.environ, IM_CONFIG=CFG)
    env.setdefault("IM_RUNIDS", "1")
    env.setdefault("IM_GENS", "0,1")
    script = os.path.join(REPO, "SUIM", SCRIPTS[num])
    t0 = time.time()
    print(f"[{num}] {SCRIPTS[num]} starting", flush=True)
    r = subprocess.run([sys.executable, script], env=env, cwd=REPO)
    dt = time.time() - t0
    print(f"[{num}] exit {r.returncode} in {dt / 60:.1f} min", flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)


def collect():
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "collect_quality.py"), SUIM])


def main():
    stages = sys.argv[1:] or ["build", "04", "05", "10", "12", "13", "11",
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
