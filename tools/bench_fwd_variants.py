"""Forward-pass comparison: packed vs unrolled at several (P, B)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from inconsistencymasks_tpu.models.packed_unet import packed_unet_apply
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.ops.unroll import unrolled_map
from inconsistencymasks_tpu.train.population import init_population

HW = 256


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
    m = UNet(num_classes=1, alpha=0.5)
    rng = np.random.RandomState(0)
    for (p, b) in ((5, 32), (2, 128)):
        stacked = init_population(m, HW, HW, 3, p, base_seed=3)
        images = jnp.asarray(rng.randint(0, 256, (b, HW, HW, 3),
                                         dtype=np.uint8))
        carry0 = {"v": stacked, "t": jnp.zeros(())}

        @jax.jit
        def fwd_unrolled(carry, images):
            probs = unrolled_map(
                lambda v: m.apply(v, images, train=False), carry["v"])
            return dict(carry, t=carry["t"] + jnp.mean(probs))

        def mk_packed(width):
            @jax.jit
            def fwd_packed(carry, images):
                probs = packed_unet_apply(
                    carry["v"], images, train=False, num_classes=1,
                    max_packed_width=width)
                return dict(carry, t=carry["t"] + jnp.mean(probs))
            return fwd_packed

        t_u = measure(fwd_unrolled, dict(carry0), images)
        print(f"P={p} B={b} unrolled fwd : {t_u * 1000:7.2f} ms "
              f"({p * b / t_u:7.0f} model-img/s)", flush=True)
        for w in (128, 160):
            t_p = measure(mk_packed(w), dict(carry0), images)
            print(f"P={p} B={b} packed w={w} : {t_p * 1000:7.2f} ms "
                  f"({p * b / t_p:7.0f} model-img/s)", flush=True)


if __name__ == "__main__":
    main()
