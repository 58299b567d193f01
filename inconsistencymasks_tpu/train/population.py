"""Population initialisation: K independently-seeded candidates as one
stacked pytree (the leading "model" axis every batched program uses)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_population(module, height: int, width: int, channels: int,
                    population: int, base_seed: int = 0):
    """Init ``population`` candidates with independent PRNG streams.
    Returns a variables pytree whose leaves have a leading (population,)
    axis."""
    dummy = jnp.zeros((1, height, width, channels), jnp.uint8)
    keys = jax.random.split(jax.random.PRNGKey(base_seed), population)
    return jax.jit(jax.vmap(lambda k: module.init(k, dummy, train=False))
                   )(keys)


def init_population_evalnet(module, height: int, width: int,
                            channels_a: int, channels_b: int,
                            population: int, base_seed: int = 0,
                            identical: bool = False):
    """EvalNet population init.  ``identical=True`` replicates ONE init
    across the population — the reference trains its 5 EvalNet candidates
    from identical initial weights (reference functions.py:4623-4630
    ``set_weights(initial_weights)``)."""
    img = jnp.zeros((1, height, width, channels_a), jnp.uint8)
    msk = jnp.zeros((1, height, width, channels_b), jnp.uint8)
    if identical:
        v = jax.jit(lambda k: module.init(k, img, msk, train=False))(
            jax.random.PRNGKey(base_seed))
        return jax.tree.map(lambda a: jnp.stack([a] * population), v)
    keys = jax.random.split(jax.random.PRNGKey(base_seed), population)
    return jax.jit(jax.vmap(
        lambda k: module.init(k, img, msk, train=False)))(keys)
