"""Sweep the conv/pool layout-experiment knobs on the real TPU
(models/packed_unet.py, ROADMAP round-3 #1: the ~75 ms/step backward
layout-transpose tax at pop 15).

Per variant: mutate the packed_unet module knobs, build a FRESH jitted
grad step (the knobs are read at trace time, so a new jit is required),
chain-time it like tools/bisect_train_step.py (data-dependent call chain
fenced by one scalar fetch; slope between a 4- and a 16-chain removes the
fence cost).  Each variant is a distinct program — expect one multi-minute
remote compile each, cached per process.

Usage:
    python tools/bench_layout_variants.py [variant ...]
Default sweep order is cheapest-risk first; POP/WIDTH env as in
bisect_train_step.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from inconsistencymasks_tpu.models import packed_unet as pu
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population

POP = int(os.environ.get("POP", 15))
BATCH, HW = 32, 256
WIDTH = int(os.environ.get("WIDTH", 128))

VARIANTS = {
    "baseline": {},
    "dot1x1": {"_CONV_IMPL": "dot1x1"},
    "wgraddot": {"_WGRAD_DOT": True},
    "dot1x1+wgraddot": {"_CONV_IMPL": "dot1x1", "_WGRAD_DOT": True},
    "convdotbwd": {"_CONV_IMPL": "convdotbwd"},
    "dot": {"_CONV_IMPL": "dot"},
    "pool_slice": {"_POOL_SLICE": True},
    "dot1x1+pool_slice": {"_CONV_IMPL": "dot1x1", "_POOL_SLICE": True},
    "pallas": {"_CONV_IMPL": "pallas"},
    "pallasfused": {"_CONV_IMPL": "pallasfused"},
    "packedhead": {"_PACKED_HEAD": True},
    "dot1x1+packedhead": {"_CONV_IMPL": "dot1x1", "_PACKED_HEAD": True},
    "dot1x1+denseinput": {"_CONV_IMPL": "dot1x1", "_DENSE_INPUT": True},
    "dot1x1+packedhead+denseinput": {"_CONV_IMPL": "dot1x1",
                                     "_PACKED_HEAD": True,
                                     "_DENSE_INPUT": True},
    # remat: recompute the forward inside the backward (jax.checkpoint).
    # Costs ~+1 forward (~44 ms at pop 15) but lets the backward consume
    # freshly materialized activations in the layouts the conv
    # dgrad/wgrad instructions demand — if the ~75 ms layout-copy tax is
    # mostly saved-activation relayouts, this trades it away.
    "remat": {"__remat__": True},
    "dot1x1+remat": {"_CONV_IMPL": "dot1x1", "__remat__": True},
    "dot1x1+packedhead+denseinput+remat": {"_CONV_IMPL": "dot1x1",
                                           "_PACKED_HEAD": True,
                                           "_DENSE_INPUT": True,
                                           "__remat__": True},
    # round-4 follow-ups: native grouped conv re-test (ROADMAP #2 says
    # re-test on newer XLA) and pool-impl x remat cross terms (remat
    # changes which saved activations the backward relayouts).
    "groupconv": {"_CONV_IMPL": "groupconv"},
    "groupconv+remat": {"_CONV_IMPL": "groupconv", "__remat__": True},
    "dot1x1+remat+pool_slice": {"_CONV_IMPL": "dot1x1", "__remat__": True,
                                "_POOL_SLICE": True},
    "dot1x1+remat+packedhead": {"_CONV_IMPL": "dot1x1", "__remat__": True,
                                "_PACKED_HEAD": True},
}
DEFAULTS = {"_CONV_IMPL": "conv", "_WGRAD_DOT": False, "_POOL_SLICE": False,
            "_POOL_RESHAPE": False, "_POOL_EQMASK": False,
            "_PACKED_HEAD": False, "_DENSE_INPUT": False}


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
    names = sys.argv[1:] or list(VARIANTS)
    # Already-running conductors pass a frozen argv list; variants added
    # after their launch can still ride the same sweep (one process = one
    # shared baseline) via this file, one name per line, run AFTER the
    # argv names so a step timeout cuts the extras, not the core knobs.
    extras = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".sweep_extra_variants")
    if os.path.exists(extras):
        with open(extras) as f:
            for line in f:
                name = line.split("#", 1)[0].strip()
                if name and name in VARIANTS and name not in names:
                    names.append(name)
    m = UNet(num_classes=1, alpha=0.5)
    stacked = init_population(m, HW, HW, 3, POP, base_seed=3)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (BATCH, HW, HW, 3),
                                     dtype=np.uint8))
    targets = jnp.asarray((rng.rand(POP, BATCH, HW, HW, 1) > 0.5)
                          .astype(np.float32))
    kw = dict(num_classes=1, activation="relu", out_activation="sigmoid",
              max_packed_width=WIDTH, compute_dtype=jnp.bfloat16)

    results = {}
    for name in names:
        knobs = {**DEFAULTS, **VARIANTS[name]}
        remat = knobs.pop("__remat__", False)
        for k, v in knobs.items():
            setattr(pu, k, v)

        @jax.jit
        def grad_step(carry, images):
            def fwd(params, batch_stats, images):
                return pu.packed_unet_apply(
                    {"params": params, "batch_stats": batch_stats},
                    images, train=True, **kw)

            if remat:
                fwd = jax.checkpoint(fwd)

            def loss_fn(params):
                probs, new_bs = fwd(params,
                                    carry["v"]["batch_stats"], images)
                return jnp.mean(jnp.square(probs - targets)), new_bs

            (l, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(carry["v"]["params"])
            params = jax.tree.map(lambda p, g: p - 1e-9 * g,
                                  carry["v"]["params"], grads)
            return dict(v=dict(params=params, batch_stats=new_bs),
                        t=carry["t"] + l)

        carry0 = {"v": jax.tree.map(jnp.array, stacked),
                  "t": jnp.zeros(())}
        t0 = time.time()
        per = chain_time(grad_step, carry0, images)
        results[name] = per
        print(f"{name:20s}: {per * 1000:7.1f} ms/step   "
              f"(incl. compile wall {time.time() - t0:.0f}s)", flush=True)

    for k, v in DEFAULTS.items():
        setattr(pu, k, v)
    best = min(results, key=results.get)
    print(f"\nbest: {best} at {results[best] * 1000:.1f} ms "
          f"(baseline {results.get('baseline', float('nan')) * 1000:.1f})")


if __name__ == "__main__":
    main()
