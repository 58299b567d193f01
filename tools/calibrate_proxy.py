"""Calibrate the hard quality proxy: train an LDT-style population on the
proxy's real labeled split (259 images, 50 epochs) and report val mIoU.

Target (VERDICT r2 weak #5 / next-round #9): LDT near ~0.7 IoU (real-ISIC
LDT is ~0.655) so strategy separations exceed run noise, instead of the
round-2 proxy's saturated 0.94.

Usage:  python tools/calibrate_proxy.py [pop] [epochs]
Reads the dataset at $IM_QUALITY_BASE/ISIC_2018 (builds it with
difficulty='hard' if missing).  Runs on the real TPU.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("IM_QUALITY_BASE", "/tmp/im_quality_r3")
ISIC = os.path.join(BASE, "ISIC_2018") + os.sep


def main():
    pop = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from inconsistencymasks_tpu.data.synthetic import make_isic_like_dataset
    if not os.path.isdir(os.path.join(ISIC, "train_labeled", "images")):
        t0 = time.time()
        make_isic_like_dataset(ISIC, difficulty="hard")
        print(f"[build] hard proxy in {time.time() - t0:.0f}s", flush=True)

    from inconsistencymasks_tpu.config import load_config
    from inconsistencymasks_tpu.data.loader import load_image_mask_dataset
    from inconsistencymasks_tpu.evaluate.benchmark import benchmark_binary
    from inconsistencymasks_tpu.train.population import init_population
    from inconsistencymasks_tpu.train.trainer import (Monitor,
                                                      PopulationTrainer)
    from inconsistencymasks_tpu.workflows import make_unet

    cfg = load_config().isic_2018
    module = make_unet(cfg)
    train = load_image_mask_dataset(os.path.join(ISIC, "train_labeled",
                                                 "images"))
    val = load_image_mask_dataset(os.path.join(ISIC, "val", "images"))
    print(f"[data] labeled {len(train)}, val {len(val)}", flush=True)

    stacked = init_population(module, cfg.image_height, cfg.image_width,
                              cfg.image_channels, pop, base_seed=0)
    tr = PopulationTrainer(module, stacked, loss="mse",
                           monitor=Monitor.isic(),
                           learning_rate=cfg.defaults.lr,
                           weight_decay=cfg.defaults.wd)
    t0 = time.time()
    tr.fit(train, val, epochs=epochs, batch_size=cfg.defaults.batch_size,
           seed=cfg.defaults.seed, log=lambda m: print(f"[fit] {m}",
                                                       flush=True))
    print(f"[fit] {time.time() - t0:.0f}s total", flush=True)

    mious = []
    for i, variables in enumerate(tr.best_variables()):
        miou, dice = benchmark_binary(module, variables, val,
                                      pred_dir=None, create_images=False)
        mious.append(miou)
        print(f"[bench] candidate {i}: val mIoU {miou:.4f} dice {dice:.4f}",
              flush=True)
    mious.sort(reverse=True)
    print(f"RESULT best={mious[0]:.4f} top4_mean="
          f"{sum(mious[:4]) / min(4, len(mious)):.4f} all={mious}",
          flush=True)


if __name__ == "__main__":
    main()
