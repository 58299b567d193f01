"""Static population unrolling.

Measured on TPU v5e: ``jax.vmap`` over a stacked-parameters axis lowers
convolutions to grouped/batched conv kernels ~20-25 % slower than the same
P convolutions written out separately in one XLA program (full IM pipeline
K=2/B=128/256^2: vmap 9.26 ms vs unrolled 7.36 ms; population train step
pop5/b32: 135 ms vs 113 ms).  So every population hot path unrolls
statically instead of vmapping; population sizes are small (2-10) and
static, so compile cost is modest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def population_size(tree) -> int:
    """Leading-axis length of a stacked pytree (local size under
    shard_map)."""
    return jax.tree.leaves(tree)[0].shape[0]


def tree_index(tree, i: int):
    return jax.tree.map(lambda a: a[i], tree)


def unrolled_map(fn, *trees):
    """vmap-over-leading-axis replacement with static unrolling.

    ``fn`` is applied to each index slice of the input pytrees; outputs are
    stacked on a new leading axis (matching ``jax.vmap(fn)(*trees)`` for
    in_axes=0/out_axes=0 semantics, including multi-output tuples).
    """
    n = population_size(trees[0])
    outs = [fn(*(tree_index(t, i) for t in trees)) for i in range(n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
