"""Batched K-model inference engine.

The reference predicts with each ensemble member separately per image
(reference functions.py:3155-3158: ``for model in models:
model.predict([prepared_image])``).  Here the K members' parameters are
STACKED on a leading axis and one vmapped, jitted program evaluates all K
over a whole batch — K identical convs become one K-times-larger batched
conv on the MXU, and downstream IM math fuses into the same XLA program.

Multi-chip: pass a ``jax.sharding.Mesh`` with a ``data`` axis and the image
batch is sharded across it (parameters replicated — the models are tiny);
XLA partitions the whole fused program data-parallel over ICI with no code
changes downstream.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.unroll import unrolled_map
from ..parallel import resolve_mesh
from ..train.checkpoint import stack_variables


class StackedEnsemble:
    """K same-architecture models with a stacked-parameters layout.

    ``mesh=None`` resolves to the process default mesh (parallel.py) — the
    production pipeline registers one in ``make_adapter``, so every
    generation/scoring path is data-sharded automatically on multi-chip."""

    def __init__(self, module, variables: Sequence | object,
                 mesh: Optional[Mesh] = None, forward: str = "auto"):
        mesh = resolve_mesh(mesh)
        self.module = module
        if isinstance(variables, (list, tuple)):
            self.size = len(variables)
            self.stacked = stack_variables(list(variables))
        else:
            self.stacked = variables
            self.size = jax.tree.leaves(variables)[0].shape[0]
        self.mesh = mesh
        if mesh is not None and "data" in mesh.axis_names:
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self.stacked = jax.device_put(self.stacked,
                                          NamedSharding(mesh, P()))
        else:
            self._batch_sharding = None
        # OPT-IN channel-packed K-model forward (models/packed_unet.py).
        # Measured on v5e-1 at the production shape (K=2, batch 128,
        # 256^2, alpha 0.5): packed 9.98 ms/batch vs UNROLLED 7.4 ms —
        # at K=2-4 the block-diagonal packing fills too few lanes to beat
        # the unrolled form's fusion, so 'auto' stays unrolled for
        # inference (training is different: pop 15 packs to full lanes,
        # PopulationTrainer defaults packed).
        from ..models.unet import UNet as _UNet
        packable = (isinstance(module, _UNet)
                    and module.dropout_rate_encoder == 0
                    and module.dropout_rate_decoder == 0
                    and module.dropout_rate_bottleneck == 0)
        if forward == "packed" and not packable:
            raise ValueError("forward='packed' requires a dropout-free UNet")
        self.packed = forward == "packed" and packable and self.size > 1
        self._predict = jax.jit(self._predict_impl)

    def _predict_impl(self, stacked, images):
        if self.packed:
            from ..models.packed_unet import packed_unet_apply
            m = self.module
            return packed_unet_apply(
                stacked, images, train=False, num_classes=m.num_classes,
                activation=m.activation, out_activation=m.out_activation,
                compute_dtype=m.compute_dtype)
        # static unroll over the K members (see ops/unroll.py: ~2.4x faster
        # than vmap's grouped-conv lowering on TPU)
        return unrolled_map(
            lambda v: self.module.apply(v, images, train=False), stacked)

    def _put(self, images: jnp.ndarray) -> jnp.ndarray:
        images = jnp.asarray(images)
        if self._batch_sharding is not None:
            n = dict(zip(self.mesh.axis_names,
                         self.mesh.devices.shape))["data"]
            sh = (self._batch_sharding if images.shape[0] % n == 0
                  else NamedSharding(self.mesh, P()))
            images = jax.device_put(images, sh)
        return images

    def predict_probs(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) uint8 -> (K, B, H, W, Cout) float32 probabilities,
        data-parallel over the mesh's 'data' axis when one is attached."""
        return self._predict(self.stacked, self._put(images))

    def member(self, i: int):
        """Single member's variables (unstacked view)."""
        return jax.tree.map(lambda a: a[i], self.stacked)
