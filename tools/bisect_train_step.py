"""Bisect where the population train step's time goes on the real TPU.

Measures, at pop 5 / batch 32 / 256^2 / alpha 0.5 (data-dependent chains
fenced by a scalar fetch, slope between short/long chains):

  fwd_eval    packed forward, inference BN
  fwd_train   packed forward, train-mode BN (batch stats)
  grad        value_and_grad of summed loss (no optimizer)
  full        the production train step (grad + AdamW + BN update)

Optionally writes a profiler trace with --trace.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from inconsistencymasks_tpu.models.packed_unet import packed_unet_apply
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population
from inconsistencymasks_tpu.train.trainer import Monitor, PopulationTrainer

POP = int(os.environ.get("POP", 5))
BATCH, HW = 32, 256
WIDTH = int(os.environ.get("WIDTH", 128))


def chain_time(fn, state, images, n1=4, n2=16):
    s = state
    for _ in range(2):
        s = fn(s, images)
    float(jnp.sum(jax.tree.leaves(s)[0]))
    out = {}
    for n in (n1, n2):
        t0 = time.time()
        for _ in range(n):
            s = fn(s, images)
        float(jnp.sum(jax.tree.leaves(s)[0]))
        out[n] = time.time() - t0
    return (out[n2] - out[n1]) / (n2 - n1)


def main():
    m = UNet(num_classes=1, alpha=0.5)
    stacked = init_population(m, HW, HW, 3, POP, base_seed=3)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (BATCH, HW, HW, 3),
                                     dtype=np.uint8))
    targets = jnp.asarray((rng.rand(BATCH, HW, HW, 1) > 0.5)
                          .astype(np.float32))

    kw = dict(num_classes=1, activation="relu", out_activation="sigmoid",
              max_packed_width=WIDTH, compute_dtype=jnp.bfloat16)

    # 1. forward, inference BN — chain through params? probs feed nothing;
    # chain by adding mean(probs) to a dummy param leaf
    @jax.jit
    def fwd_eval(carry, images):
        probs = packed_unet_apply(carry["v"], images, train=False, **kw)
        carry = dict(carry, t=carry["t"] + jnp.mean(probs))
        return carry

    @jax.jit
    def fwd_train(carry, images):
        probs, new_bs = packed_unet_apply(
            dict(carry["v"], batch_stats=carry["v"]["batch_stats"]),
            images, train=True, **kw)
        v = dict(carry["v"], batch_stats=new_bs)
        return dict(v=v, t=carry["t"] + jnp.mean(probs))

    @jax.jit
    def grad_only(carry, images):
        def loss_fn(params):
            probs, new_bs = packed_unet_apply(
                {"params": params,
                 "batch_stats": carry["v"]["batch_stats"]},
                images, train=True, **kw)
            return jnp.mean(jnp.square(probs - targets[None])), new_bs

        (l, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            carry["v"]["params"])
        # chain: nudge params by a tiny multiple of grads
        params = jax.tree.map(lambda p, g: p - 1e-9 * g,
                              carry["v"]["params"], grads)
        return dict(v=dict(params=params, batch_stats=new_bs),
                    t=carry["t"] + l)

    carry0 = {"v": stacked, "t": jnp.zeros(())}
    for name, fn in (("fwd_eval", fwd_eval), ("fwd_train", fwd_train),
                     ("grad", grad_only)):
        per = chain_time(fn, dict(carry0), images)
        print(f"{name:10s}: {per * 1000:7.1f} ms", flush=True)

    tr = PopulationTrainer(m, jax.tree.map(jnp.array, stacked), loss="mse",
                           monitor=Monitor.isic(), learning_rate=3e-3,
                           weight_decay=1e-4, forward="packed",
                           max_packed_width=WIDTH)

    def full(state, images):
        state, _ = tr._train_step(state, images, targets)
        return state

    s = tr.state
    for _ in range(2):
        s = full(s, images)
    float(jnp.sum(s["best_metric"]) + jnp.mean(s["params"]["out"]["bias"]))
    times = {}
    for n in (4, 16):
        t0 = time.time()
        for _ in range(n):
            s = full(s, images)
        float(jnp.sum(jnp.mean(s["params"]["out"]["bias"])))
        times[n] = time.time() - t0
    print(f"{'full':10s}: {(times[16] - times[4]) / 12 * 1000:7.1f} ms",
          flush=True)

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/jaxtrace"):
            for _ in range(3):
                s = full(s, images)
            float(jnp.sum(jnp.mean(s["params"]["out"]["bias"])))
        print("trace written to /tmp/jaxtrace", flush=True)


if __name__ == "__main__":
    main()
