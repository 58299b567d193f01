"""Bound the BN-fold inference win (ROADMAP item 3, VERDICT r3 weak #6).

The architecture's conv -> activation -> BN ordering blocks exact folding
of the BN affine into a conv: the preceding conv is separated by the
nonlinearity, and the FOLLOWING conv is either 3x3 SAME-padded (folding
a shift across zero-padding changes border pixels) or consumes the sum of
two differently-scaled BN outputs (decoder add-skips) — so the only
XLA-legal "fold" is precomputing the eval affine, which XLA already fuses
into the surrounding elementwise chain.

This measures the UPPER BOUND of any fold win directly: the K=2, b=128
generation-shape eval forward with BN sites present vs REMOVED entirely
(UNet(bn_mode='skip') — trained variables still apply, flax ignores the
unused BN params/stats).  If removal is ~free, no fold can win anything.

Usage: python tools/bench_bnfold.py    (real TPU, ~2 compiles)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.ops.unroll import unrolled_map
from inconsistencymasks_tpu.train.population import init_population

HW, K, B = 256, 2, 128


def measure(fn, carry, images, n1=4, n2=16):
    for _ in range(2):
        carry = fn(carry, images)
    float(carry["t"])
    ts = {}
    for n in (n1, n2):
        t0 = time.time()
        for _ in range(n):
            carry = fn(carry, images)
        float(carry["t"])
        ts[n] = time.time() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    rng = np.random.RandomState(0)
    stacked = init_population(UNet(num_classes=1, alpha=0.5), HW, HW, 3, K,
                              base_seed=3)
    images = jnp.asarray(rng.randint(0, 256, (B, HW, HW, 3),
                                     dtype=np.uint8))
    for mode in ("bn", "skip"):
        m = UNet(num_classes=1, alpha=0.5, bn_mode=mode)

        @jax.jit
        def fwd(carry, images, m=m):
            probs = unrolled_map(
                lambda v: m.apply(v, images, train=False), carry["v"])
            return dict(carry, t=carry["t"] + jnp.mean(probs))

        dt = measure(fwd, {"v": stacked, "t": jnp.zeros(())}, images)
        print(f"bn_mode={mode:5s}: {dt * 1e3:7.2f} ms/batch "
              f"({B / dt:8.1f} img/s, K={K})", flush=True)


if __name__ == "__main__":
    main()
