"""Calibrate the SUIM-like multiclass proxy: train an LDT-style population
on its labeled split and report val mIoU.

Target (BASELINE.md): real-SUIM LDT ~0.333 test mIoU — the proxy should
land near that so mIoU-arm strategy separations are resolvable (the same
calibration protocol as tools/calibrate_proxy.py for the binary proxy).

Usage:  python tools/calibrate_proxy_mc.py [pop] [epochs] [difficulty]
Reads the dataset at $IM_QUALITY_MC_BASE/SUIM (builds it if missing).
Runs on the real TPU.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("IM_QUALITY_MC_BASE", os.path.join(REPO, ".quality_mc"))
SUIM = os.path.join(BASE, "SUIM") + os.sep


def main():
    pop = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    difficulty = sys.argv[3] if len(sys.argv) > 3 else "hard"

    from inconsistencymasks_tpu.data.synthetic import make_suim_like_dataset
    if not os.path.isdir(os.path.join(SUIM, "train_labeled", "images")):
        t0 = time.time()
        make_suim_like_dataset(SUIM, difficulty=difficulty)
        print(f"[build] SUIM-like proxy ({difficulty}) in "
              f"{time.time() - t0:.0f}s", flush=True)

    from inconsistencymasks_tpu.config import load_config
    from inconsistencymasks_tpu.data.loader import load_image_mask_dataset
    from inconsistencymasks_tpu.evaluate.benchmark import (
        benchmark_multiclass_population)
    from inconsistencymasks_tpu.train.population import init_population
    from inconsistencymasks_tpu.train.trainer import (Monitor,
                                                      PopulationTrainer)
    from inconsistencymasks_tpu.workflows import make_unet

    cfg = load_config().suim
    module = make_unet(cfg)
    train = load_image_mask_dataset(
        os.path.join(SUIM, "train_labeled", "images"), binary=False)
    val = load_image_mask_dataset(os.path.join(SUIM, "val", "images"),
                                  binary=False)
    print(f"[data] labeled {len(train)}, val {len(val)}, "
          f"classes {cfg.num_classes}", flush=True)

    stacked = init_population(module, cfg.image_height, cfg.image_width,
                              cfg.image_channels, pop, base_seed=0)
    tr = PopulationTrainer(module, stacked, loss="cce",
                           monitor=Monitor.multiclass(),
                           num_classes=cfg.num_classes,
                           learning_rate=cfg.defaults.lr,
                           weight_decay=cfg.defaults.wd)
    t0 = time.time()
    tr.fit(train, val, epochs=epochs, batch_size=cfg.defaults.batch_size,
           seed=cfg.defaults.seed, log=lambda m: print(f"[fit] {m}",
                                                       flush=True))
    print(f"[fit] {time.time() - t0:.0f}s total", flush=True)

    res = benchmark_multiclass_population(
        module, tr.best_variables(), val, num_classes=cfg.num_classes,
        class_to_color={})
    mious = sorted((miou for _, miou in res), reverse=True)
    for i, (mpa, miou) in enumerate(res):
        print(f"[bench] candidate {i}: val mIoU {miou:.4f} mPA {mpa:.4f}",
              flush=True)
    print(f"RESULT best={mious[0]:.4f} top4_mean="
          f"{sum(mious[:4]) / min(4, len(mious)):.4f} all={mious}",
          flush=True)


if __name__ == "__main__":
    main()
