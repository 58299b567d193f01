"""Batched K-model inference engine.

The reference predicts with each ensemble member separately per image
(reference functions.py:3155-3158: ``for model in models:
model.predict([prepared_image])``).  Here the K members' parameters are
STACKED on a leading axis and one vmapped, jitted program evaluates all K
over a whole batch — K identical convs become one K-times-larger batched
conv on the MXU, and downstream IM math fuses into the same XLA program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..train.checkpoint import stack_variables


class StackedEnsemble:
    """K same-architecture models with a stacked-parameters layout."""

    def __init__(self, module, variables: Sequence | object):
        self.module = module
        if isinstance(variables, (list, tuple)):
            self.size = len(variables)
            self.stacked = stack_variables(list(variables))
        else:
            self.stacked = variables
            self.size = jax.tree.leaves(variables)[0].shape[0]
        self._predict = jax.jit(self._predict_impl)

    def _predict_impl(self, stacked, images):
        return jax.vmap(
            lambda v: self.module.apply(v, images, train=False),
            in_axes=0)(stacked)

    def predict_probs(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) uint8 -> (K, B, H, W, Cout) float32 probabilities."""
        return self._predict(self.stacked, images)

    def member(self, i: int):
        """Single member's variables (unstacked view)."""
        return jax.tree.map(lambda a: a[i], self.stacked)
