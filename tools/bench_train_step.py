"""Train-step microbenchmark: packed vs unrolled population training.

Usage: python tools/bench_train_step.py [forward:width ...]
Defaults to sweeping unrolled + packed at several crossover widths.

Timing follows CLAUDE.md: steps form a data-dependent chain (state feeds
state), fenced by one scalar fetch; per-step time is the slope between a
short and a long chain so fixed dispatch/fence cost cancels.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population
from inconsistencymasks_tpu.train.trainer import Monitor, PopulationTrainer

import os
POP = int(os.environ.get("POP", 5))
BATCH, HW = 32, 256


def run(forward, width, steps=(4, 16)):
    m = UNet(num_classes=1, alpha=0.5)
    stacked = init_population(m, HW, HW, 3, POP, base_seed=3)
    tr = PopulationTrainer(m, stacked, loss="mse", monitor=Monitor.isic(),
                           learning_rate=3e-3, weight_decay=1e-4,
                           forward=forward, max_packed_width=width)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (BATCH, HW, HW, 3),
                                     dtype=np.uint8))
    targets = jnp.asarray((rng.rand(BATCH, HW, HW, 1) > 0.5)
                          .astype(np.float32))
    t0 = time.time()
    for _ in range(2):           # compile + warmup
        tr.state, loss = tr._train_step(tr.state, images, targets)
    float(jnp.sum(loss))
    compile_s = time.time() - t0

    times = {}
    for n in steps:
        t0 = time.time()
        for _ in range(n):
            tr.state, loss = tr._train_step(tr.state, images, targets)
        float(jnp.sum(loss))
        times[n] = time.time() - t0
    n1, n2 = steps
    per = (times[n2] - times[n1]) / (n2 - n1)
    print(f"{forward:9s} width={width:4d}: {per * 1000:7.1f} ms/step "
          f"({POP * BATCH / per:6.0f} model-img/s) "
          f"[compile {compile_s:.0f}s]", flush=True)
    return per


def main():
    print(f"devices: {jax.devices()}", flush=True)
    configs = sys.argv[1:] or ["unrolled:0", "packed:128", "packed:160",
                               "packed:256"]
    for c in configs:
        fwd, w = c.split(":")
        run(fwd, int(w))


if __name__ == "__main__":
    main()
