"""XLA layout-pin experiment on the pop-15 packed train step (ROADMAP:
the last named lever under the 182.6 ms/step plateau; VERDICT r4 next-#10).

The profiled tax is ~36 ms/step of layout-transpose copies: XLA flip-flops
activations between C-minor {3,0,2,1} and W-minor {2,3,1,0} around
pooling/BN boundaries (tools/bisect_train_step.py --trace).  The entry
layouts of the threaded carry (params + batch_stats) are row-major by
default; this experiment lets XLA CHOOSE them instead
(jax.experimental.layout, Format(Layout.AUTO) on in/out), uploads the
carry in the compiled input formats, and chain-times the step:

  * default   — plain jit, row-major entries (re-anchors the baseline)
  * auto      — AUTO in/out formats, carry device_put into the compiled
                input formats
  * fixpoint  — if AUTO chose different formats for the carry's input vs
                output (the carry threads step-to-step, so a mismatch
                costs one relayout per step), recompile with the input
                PINNED to the output formats

Chain-timed like tools/bisect_train_step.py (data-dependent chain fenced
by one scalar fetch; slope between a 4- and a 16-chain removes the fence).
POP/WIDTH env as in bisect_train_step.  Run on the REAL chip (no
JAX_PLATFORMS override) with the host otherwise idle.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

if os.environ.get("IM_FORCE_CPU"):
    # sitecustomize pins JAX_PLATFORMS=axon; the env var alone cannot
    # override it — only this config call can (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental.layout import Format, Layout

from inconsistencymasks_tpu.models import packed_unet as pu
from inconsistencymasks_tpu.models.unet import UNet
from inconsistencymasks_tpu.train.population import init_population

POP = int(os.environ.get("POP", 15))
BATCH = int(os.environ.get("BATCH", 32))
HW = int(os.environ.get("HW", 256))
WIDTH = int(os.environ.get("WIDTH", 128))
KW = dict(num_classes=1, activation="relu", out_activation="sigmoid",
          max_packed_width=WIDTH, compute_dtype=jnp.bfloat16)


def make_step(targets):
    def grad_step(carry, images):
        def loss_fn(params):
            probs, new_bs = pu.packed_unet_apply(
                {"params": params, "batch_stats": carry["v"]["batch_stats"]},
                images, train=True, **KW)
            return jnp.mean(jnp.square(probs - targets)), new_bs

        (l, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(carry["v"]["params"])
        params = jax.tree.map(lambda p, g: p - 1e-9 * g,
                              carry["v"]["params"], grads)
        return dict(v=dict(params=params, batch_stats=new_bs),
                    t=carry["t"] + l)

    return grad_step


def chain_time(fn, carry, images, n1=4, n2=16):
    s = carry
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
    targets = jnp.asarray((rng.rand(POP, BATCH, HW, HW, 1) > 0.5)
                          .astype(np.float32))
    step = make_step(targets)
    carry0 = {"v": jax.tree.map(jnp.array, stacked), "t": jnp.zeros(())}

    results = {}

    t0 = time.time()
    f_default = jax.jit(step)
    results["default"] = chain_time(f_default, carry0, images)
    print(f"default : {results['default'] * 1000:7.1f} ms/step  "
          f"(wall {time.time() - t0:.0f}s)", flush=True)

    # --- AUTO entry/exit layouts -----------------------------------------
    t0 = time.time()
    auto = Format(Layout.AUTO)
    f_auto = jax.jit(step, in_shardings=auto, out_shardings=auto)
    lowered = f_auto.lower(carry0, images)
    compiled = lowered.compile()
    try:
        in_fmt, out_fmt = compiled.input_formats, compiled.output_formats
    except AttributeError:   # older spelling
        in_fmt, out_fmt = compiled.input_layouts, compiled.output_layouts
    # input_formats = ((carry_fmt, images_fmt), {}); output_formats is the
    # bare carry pytree (the step returns just the carry dict)
    carry_in_fmt = in_fmt[0][0]
    carry_out_fmt = out_fmt
    leaves_in = jax.tree.leaves(carry_in_fmt)
    leaves_out = jax.tree.leaves(carry_out_fmt)
    n_diff = sum(1 for a, b in zip(leaves_in, leaves_out)
                 if getattr(a, "layout", a) != getattr(b, "layout", b))
    nondefault = sum(
        1 for a in leaves_in
        if getattr(a, "layout", None) is not None
        and tuple(a.layout.major_to_minor)
        != tuple(range(len(a.layout.major_to_minor))))
    print(f"auto    : {nondefault}/{len(leaves_in)} non-row-major entry "
          f"layouts chosen; {n_diff} carry leaves with in!=out layout",
          flush=True)
    carry_auto = jax.tree.map(jax.device_put, carry0, carry_in_fmt)
    images_auto = jax.device_put(images, in_fmt[0][1])
    results["auto"] = chain_time(compiled, carry_auto, images_auto)
    print(f"auto    : {results['auto'] * 1000:7.1f} ms/step  "
          f"(wall {time.time() - t0:.0f}s)", flush=True)

    # --- fixpoint: pin input layouts to the AUTO output layouts ----------
    if n_diff:
        t0 = time.time()
        f_fix = jax.jit(step, in_shardings=(carry_out_fmt, in_fmt[0][1]),
                        out_shardings=carry_out_fmt)
        carry_fix = jax.tree.map(jax.device_put, carry0, carry_out_fmt)
        results["fixpoint"] = chain_time(f_fix, carry_fix, images_auto)
        print(f"fixpoint: {results['fixpoint'] * 1000:7.1f} ms/step  "
              f"(wall {time.time() - t0:.0f}s)", flush=True)

    best = min(results, key=results.get)
    print(f"\nbest: {best} at {results[best] * 1000:.1f} ms/step "
          f"(default {results['default'] * 1000:.1f})", flush=True)


if __name__ == "__main__":
    main()
