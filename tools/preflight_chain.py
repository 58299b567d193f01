"""Preflight the FULL ISIC CLI chain on a tiny CPU dataset.

Runs every numbered ISIC script the quality run (tools/run_quality_proxy.py)
will reach — including the EvalNet arm (10/12/13/14) that only gets
tiny-shape unit coverage elsewhere — against a 32x32 synthetic binary
dataset with every scale knob floored, so a crash in a late stage surfaces
here in minutes instead of hours into the production run.

Usage:
    python tools/preflight_chain.py [stage ...]   # default: full chain
Exit code is the first failing stage's; each stage is a fresh subprocess
(CPU-forced) like the production runner.
"""

import configparser
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("IM_PREFLIGHT_BASE", "/tmp/im_preflight")
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
    "11": "11_ISIC_2018_IM+.py",
    "12": "12_ISIC_2018_IM++.py",
    "13": "13_ISIC_2018_aug_IM+.py",
    "14": "14_ISIC_2018_aug_IM++.py",
}
# the production priority order from tools/run_quality_proxy.py
ORDER = ["02", "03", "04", "09", "11", "12", "10", "14", "13", "08",
         "06", "07", "05"]


def build():
    sys.path.insert(0, REPO)
    from inconsistencymasks_tpu.data.synthetic import make_binary_dataset

    if not os.path.isdir(os.path.join(ISIC, "train_labeled", "images")):
        make_binary_dataset(ISIC, h=32, w=32, n_labeled=6, n_val=4,
                            n_test=4, n_unlabeled=6)
    for sub in ("images", "masks"):
        full = os.path.join(ISIC, "train_full", sub)
        os.makedirs(full, exist_ok=True)
        for split in ("train_labeled", "train_unlabeled"):
            src_dir = os.path.join(ISIC, split, sub)
            if not os.path.isdir(src_dir):
                continue
            for n in os.listdir(src_dir):
                dst = os.path.join(full, n)
                if not os.path.exists(dst):
                    os.link(os.path.join(src_dir, n), dst)
    cp = configparser.ConfigParser()
    cp.read(os.path.join(REPO, "config.ini"))
    cp["DEFAULT"]["NUM_EPOCHS_EVALNET"] = "1"
    cp["DEFAULT"]["NUM_EPOCHS_CS"] = "1"
    cp["DEFAULT"]["NUM_LOOPS_TRAIN"] = "2"
    cp["DEFAULT"]["NUM_LOOPS_VAL"] = "1"
    cp["ISIC_2018"]["BASE_DIR"] = ISIC
    cp["ISIC_2018"]["IMAGE_HEIGHT"] = "32"
    cp["ISIC_2018"]["IMAGE_WIDTH"] = "32"
    cp["ISIC_2018"]["ALPHA"] = "0.25"
    if "ALPHA_EVALNET" in cp["ISIC_2018"]:
        cp["ISIC_2018"]["ALPHA_EVALNET"] = "0.25"
    with open(CFG, "w") as f:
        cp.write(f)
    print(f"[build] preflight dataset + config at {BASE}", flush=True)


def run_stage(num: str) -> int:
    env = dict(os.environ, IM_CONFIG=CFG, IM_RUNIDS="1", IM_GENS="0",
               IM_N_VALUES="2", IM_POPULATION_FIRST="3",
               IM_POPULATION_GEN="2", IM_EPOCHS="1",
               IM_PRED_SPLITS="unlabeled", JAX_PLATFORMS="cpu")
    script = os.path.join(REPO, "ISIC_2018", SCRIPTS[num])
    # force CPU despite sitecustomize (env alone is not enough here)
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "import runpy, sys; sys.argv=['x'];"
            f"runpy.run_path({script!r}, run_name='__main__')")
    t0 = time.time()
    print(f"[{num}] {SCRIPTS[num]} starting", flush=True)
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True)
    dt = time.time() - t0
    print(f"[{num}] exit {r.returncode} in {dt / 60:.1f} min", flush=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + "\n" + r.stderr[-6000:] + "\n")
    return r.returncode


def main():
    stages = sys.argv[1:] or ORDER
    build()
    for s in stages:
        rc = run_stage(s)
        if rc != 0:
            print(f"PREFLIGHT FAILED at stage {s}", flush=True)
            sys.exit(rc)
    print("PREFLIGHT OK: all stages", flush=True)


if __name__ == "__main__":
    main()
