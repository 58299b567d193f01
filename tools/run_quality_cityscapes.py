"""Cityscapes-arm quality run on the structured street-scene proxy.

Completes the reference's result chart (README.md:27 -> main_results.png,
panel 4): ISIC binary and SUIM multiclass and HeLa cell-culture have
proxy quality runs (tools/run_quality_proxy.py / run_quality_multiclass.py
/ run_quality_hela.py); the Cityscapes arm — the 35-class shifted mapping
(Cityscapes_class_mapping.py:42-120), 208x416 blocked IO
(config.ini [CITYSCAPES] BLOCK_INPUT/BLOCK_OUTPUT), softmax head — had no
at-scale quality numbers.  This drives the REAL Cityscapes zero-arg CLIs
on the real TPU against data/synthetic.make_cityscapes_like_dataset
(perspective street scenes, 10/90 labeled split, 500-image val/test pool;
BASELINE.md panel-4 targets: LDT mIoU ~0.310, ALDT ~0.372, FDT ~0.453,
IM++ gen 5 ~0.425).

Usage:
    python tools/run_quality_cityscapes.py [stage ...]
stages default to: build 03 04 09 11 12 10 collect
(Cityscapes numbering: 03=LDT, 04=ALDT, 09=IM, 10=evalnet_miou_ensemble/
segnet, 11=IM+, 12=IM++ — reference Cityscapes/ run order; 02=FDT, 05=CS,
06=ME, 07=IE, 08=NS, 13/14=aug_IM+/++ selectable explicitly).
Scale-down via env: IM_RUNIDS=1 (default here), IM_GENS=0,1 (default
here — a later run with more gens resumes per cell in place).
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("IM_QUALITY_CS_BASE",
                      os.path.join(REPO, ".quality_cs"))
CS = os.path.join(BASE, "Cityscapes") + os.sep
CFG = os.path.join(BASE, "config.ini")

SCRIPTS = {
    "02": "02_Cityscapes_full_dataset.py",
    "03": "03_Cityscapes_subset.py",
    "04": "04_Cityscapes_subset_aug.py",
    "05": "05_Cityscapes_consistency_loss.py",
    "06": "06_Cityscapes_model_ensemble.py",
    "07": "07_Cityscapes_input_ensemble.py",
    "08": "08_Cityscapes_noisy_student.py",
    "09": "09_Cityscapes_IM.py",
    "10": "10_Cityscapes_evalnet_miou_ensemble.py",
    "11": "11_Cityscapes_IM+.py",
    "12": "12_Cityscapes_IM++.py",
    "13": "13_Cityscapes_aug_IM+.py",
    "14": "14_Cityscapes_aug_IM++.py",
}


def build():
    import configparser
    sys.path.insert(0, REPO)
    from inconsistencymasks_tpu.data.synthetic import (
        make_cityscapes_like_dataset)

    # Completion sentinel, not mere existence: the tree appears at the
    # first _write, so an interrupted generation would otherwise be
    # silently accepted as complete (ADVICE r4 medium).
    done = os.path.join(BASE, ".build_done")
    if not os.path.exists(done):
        if os.path.isdir(CS):
            import shutil
            print("[build] partial tree without .build_done — regenerating",
                  flush=True)
            shutil.rmtree(CS)
        t0 = time.time()
        make_cityscapes_like_dataset(CS, difficulty="hard")
        with open(done, "w") as f:
            f.write(time.strftime("%F %T") + "\n")
        print(f"[build] Cityscapes-like proxy in {time.time() - t0:.0f}s",
              flush=True)
    # train_full = labeled + unlabeled (for the FDT ceiling, stage 02)
    for sub in ("images", "masks"):
        full = os.path.join(CS, "train_full", sub)
        os.makedirs(full, exist_ok=True)
        for split in ("train_labeled", "train_unlabeled"):
            src_dir = os.path.join(CS, split, sub)
            for n in os.listdir(src_dir):
                dst = os.path.join(full, n)
                if not os.path.exists(dst):
                    os.link(os.path.join(src_dir, n), dst)
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp["CITYSCAPES"]["BASE_DIR"] = CS
    with open(CFG, "w") as f:
        cp.write(f)
    print(f"[build] config at {CFG}", flush=True)


def run_stage(num: str):
    env = dict(os.environ, IM_CONFIG=CFG)
    env.setdefault("IM_RUNIDS", "1")
    env.setdefault("IM_GENS", "0,1")
    script = os.path.join(REPO, "Cityscapes", SCRIPTS[num])
    t0 = time.time()
    print(f"[{num}] {SCRIPTS[num]} starting", flush=True)
    r = subprocess.run([sys.executable, script], env=env, cwd=REPO)
    dt = time.time() - t0
    print(f"[{num}] exit {r.returncode} in {dt / 60:.1f} min", flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)


def collect():
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "collect_quality.py"), CS])


def main():
    stages = sys.argv[1:] or ["build", "03", "04", "09", "11", "12", "10",
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
