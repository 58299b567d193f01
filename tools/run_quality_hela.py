"""HeLa-arm quality run on the structured brightfield cell proxy.

Extends VERDICT r3 next-#2 beyond SUIM: the HeLa arm has its own
protocol — 3-channel alive/dead/mod_pos masks with class 0 = IM
(reference HeLa/00_HeLa_create_crops.py:20-224), the mod_pos_size rule
(functions.py cell-position handling; postproc/hela.py), the mIoU_ad
benchmark and cell-count eval (reference functions.py:6299-6371) — and
until this run had only tiny-shape CPU e2e coverage.  This drives the
REAL HeLa zero-arg CLIs on the real TPU against
data/synthetic.make_hela_like_dataset (brightfield appearance model,
10/90 labeled split, 256^2 crops; BASELINE.md targets: LDT mIoU_ad
~0.512, FDT ~0.693).

Usage:
    python tools/run_quality_hela.py [stage ...]
stages default to: build 03 04 09 11 12 10 collect
(HeLa numbering: 03=LDT, 04=ALDT, 09=IM, 10=evalnet_miou_ensemble/
segnet, 11=IM+, 12=IM++ — reference HeLa/ run order; 02=FDT, 05=CS,
06=ME, 07=IE, 08=NS, 13/14=aug_IM+/++ selectable explicitly).
Scale-down via env: IM_RUNIDS=1 (default here), IM_GENS=0,1 (default
here — a later run with more gens resumes per cell in place).
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("IM_QUALITY_HELA_BASE",
                      os.path.join(REPO, ".quality_hela"))
HELA = os.path.join(BASE, "HeLa") + os.sep
CFG = os.path.join(BASE, "config.ini")

SCRIPTS = {
    "02": "02_HeLa_full_dataset.py",
    "03": "03_HeLa_subset.py",
    "04": "04_HeLa_subset_aug.py",
    "05": "05_HeLa_consistency_loss.py",
    "06": "06_HeLa_model_ensemble.py",
    "07": "07_HeLa_input_ensemble.py",
    "08": "08_HeLa_noisy_student.py",
    "09": "09_HeLa_IM.py",
    "10": "10_HeLa_evalnet_miou_ensemble.py",
    "11": "11_HeLa_IM+.py",
    "12": "12_HeLa_IM++.py",
    "13": "13_HeLa_aug_IM+.py",
    "14": "14_HeLa_aug_IM++.py",
}

HELA_CHANNELS = ("brightfield", "alive", "dead", "pos", "mod_position")


def build():
    import configparser
    sys.path.insert(0, REPO)
    from inconsistencymasks_tpu.data.synthetic import make_hela_like_dataset

    # Completion sentinel, not mere existence: the tree appears at the
    # first _write, so an interrupted generation would otherwise be
    # silently accepted as complete (ADVICE r4 medium).
    done = os.path.join(BASE, ".build_done")
    if not os.path.exists(done):
        if os.path.isdir(HELA):
            import shutil
            print("[build] partial tree without .build_done — regenerating",
                  flush=True)
            shutil.rmtree(HELA)
        t0 = time.time()
        make_hela_like_dataset(
            HELA, difficulty=os.environ.get("IM_PROXY_DIFFICULTY", "hard"))
        with open(done, "w") as f:
            f.write(time.strftime("%F %T") + "\n")
        print(f"[build] HeLa-like proxy in {time.time() - t0:.0f}s",
              flush=True)
    # train_full = labeled + unlabeled (for the FDT ceiling, stage 02)
    for sub in HELA_CHANNELS:
        full = os.path.join(HELA, "train_full", sub)
        os.makedirs(full, exist_ok=True)
        for split in ("train_labeled", "train_unlabeled"):
            src_dir = os.path.join(HELA, split, sub)
            for n in os.listdir(src_dir):
                dst = os.path.join(full, n)
                if not os.path.exists(dst):
                    os.link(os.path.join(src_dir, n), dst)
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp["HELA"]["BASE_DIR"] = HELA
    with open(CFG, "w") as f:
        cp.write(f)
    print(f"[build] config at {CFG}", flush=True)


def run_stage(num: str):
    env = dict(os.environ, IM_CONFIG=CFG)
    env.setdefault("IM_RUNIDS", "1")
    env.setdefault("IM_GENS", "0,1")
    script = os.path.join(REPO, "HeLa", SCRIPTS[num])
    t0 = time.time()
    print(f"[{num}] {SCRIPTS[num]} starting", flush=True)
    r = subprocess.run([sys.executable, script], env=env, cwd=REPO)
    dt = time.time() - t0
    print(f"[{num}] exit {r.returncode} in {dt / 60:.1f} min", flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)


def collect():
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "collect_quality.py"), HELA])


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
