"""Consistency-loss training (reference functions.py:367-828).

Per epoch: (1) a labeled supervised pass; (2) validation with manual
best-model keeping (min val_loss); (3) an unlabeled pass where each batch is
randomly flipped/rotated once, then TWO independent photometric
augmentations are predicted and pulled together with
MSE(pred1, pred2) (functions.py:430-452); (4) validation + keep again.
Candidates warm-start from the SAME pretrained model (the scripts load
``subset_{runid}_topK_1`` for every candidate, reference
ISIC_2018/05_ISIC_2018_consistency_loss.py:72-75) — population diversity
comes from independent augmentation randomness per candidate.

TPU design: both passes are single fused programs over the population; the
two augmented views and the consistency gradient are computed on device.
Like PopulationTrainer, the population runs CHANNEL-PACKED
(models/packed_unet.py) whenever the module is a dropout-free UNet: the
per-candidate photometric views become a (P, B, H, W, C) batch and both
forward+backward passes fill the MXU lanes that per-model channel counts
would waste.  Set forward='unrolled' to force the per-model path.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loader import Dataset, eval_batches, stream_batches
from ..ops import augment, losses
from ..ops.unroll import unrolled_map
from .optim import adamw_decoupled


class ConsistencyTrainer:
    def __init__(self, module, stacked_variables, *, loss: str,
                 learning_rate: float, weight_decay: float,
                 num_classes: int = 1,
                 aug_params: Optional[augment.AugmentParams] = None,
                 forward: str = "auto"):
        self.module = module
        self.num_classes = num_classes
        self.loss_name = loss
        self.aug_params = aug_params or augment.AugmentParams()
        self.tx = adamw_decoupled(learning_rate, weight_decay)
        self.population = jax.tree.leaves(stacked_variables)[0].shape[0]
        params = stacked_variables["params"]
        batch_stats = stacked_variables.get("batch_stats", {})
        self.state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": jax.vmap(self.tx.init)(params),
            "best_params": jax.tree.map(jnp.copy, params),
            "best_batch_stats": jax.tree.map(jnp.copy, batch_stats),
            "best_metric": jnp.full((self.population,), jnp.inf),
        }
        from ..models.unet import UNet as _UNet
        packable = (isinstance(module, _UNet)
                    and module.dropout_rate_encoder == 0
                    and module.dropout_rate_decoder == 0
                    and module.dropout_rate_bottleneck == 0)
        if forward == "packed" and not packable:
            raise ValueError("forward='packed' requires a dropout-free UNet")
        self.packed = (forward != "unrolled" and packable
                       and self.population > 1)
        if self.packed:
            sup_impl = self._sup_step_packed_impl
            cons_impl = self._cons_step_packed_impl
            self._val_step = jax.jit(self._val_step_packed_impl)
        else:
            sup_impl = self._sup_step_impl
            cons_impl = self._cons_step_impl
            self._val_step = jax.jit(self._val_step_impl)
        self._sup_step = jax.jit(sup_impl, donate_argnums=0)
        self._cons_step = jax.jit(cons_impl, donate_argnums=0)
        # device-cache gather variants: the whole split lives in HBM and
        # each step ships only (B,) int32 indices — the relay client leaks
        # every bulk host->device payload (see trainer.py fit), so the
        # 100-epoch consistency loops must not re-upload batches per step
        self._sup_step_gather = jax.jit(
            lambda state, ia, ta, idx: sup_impl(
                state, jnp.take(ia, idx, axis=0),
                jnp.take(ta, idx, axis=0)), donate_argnums=0)
        self._cons_step_gather = jax.jit(
            lambda state, ia, idx, rng: cons_impl(
                state, jnp.take(ia, idx, axis=0), rng), donate_argnums=0)
        self._select = jax.jit(self._select_impl, donate_argnums=0)

    def _packed_fwd(self, params, batch_stats, images, train=True):
        from ..models.packed_unet import packed_unet_apply
        m = self.module
        return packed_unet_apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=train, num_classes=m.num_classes,
            activation=m.activation, out_activation=m.out_activation,
            compute_dtype=m.compute_dtype)

    def _loss(self, probs, targets):
        if self.loss_name == "mse":
            return losses.mse(targets, probs)
        onehot = jax.nn.one_hot(targets, self.num_classes,
                                dtype=jnp.float32)
        return losses.categorical_crossentropy(onehot, probs)

    def _sup_step_impl(self, state, images, targets):
        def per_model(params, batch_stats, opt_state):
            def loss_fn(p):
                probs, mut = self.module.apply(
                    {"params": p, "batch_stats": batch_stats}, images,
                    train=True, mutable=["batch_stats"])
                return self._loss(probs, targets), mut["batch_stats"]

            (l, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), bs, opt_state, l

        p, bs, o, l = unrolled_map(per_model, state["params"],
                                   state["batch_stats"],
                                   state["opt_state"])
        return dict(state, params=p, batch_stats=bs, opt_state=o), l

    def _sup_step_packed_impl(self, state, images, targets):
        """Supervised pass on the channel-packed layout: the candidates are
        independent, so grad(sum of per-model losses) = per-model grads."""
        def loss_fn(params):
            probs, new_bs = self._packed_fwd(params, state["batch_stats"],
                                             images)
            per = jnp.stack([self._loss(probs[i], targets)
                             for i in range(self.population)])
            return jnp.sum(per), (new_bs, per)

        (_, (new_bs, l)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])

        def upd(g, o, p):
            updates, new_o = self.tx.update(g, o, p)
            return optax.apply_updates(p, updates), new_o

        params, opt_state = unrolled_map(upd, grads, state["opt_state"],
                                         state["params"])
        return dict(state, params=params, batch_stats=new_bs,
                    opt_state=opt_state), l

    def _cons_step_packed_impl(self, state, images, rng):
        """Consistency pass, packed: the two photometric views per
        candidate become (P, B, H, W, C) per-candidate batches; both
        applies (the second on the first's advanced running stats, as the
        reference's sequential predict-under-GradientTape,
        functions.py:430-452) run as one packed program each."""
        k_geo, k_views = jax.random.split(rng)
        flipped = augment.random_flip_and_rotation(k_geo, images)
        cand_keys = jax.vmap(jax.random.split)(
            jax.random.split(k_views, self.population))      # (P, 2, key)
        view = lambda ks: jax.vmap(lambda k: augment.photometric(
            k, flipped, self.aug_params, brightness_first=False))(ks)
        v1 = view(cand_keys[:, 0])
        v2 = view(cand_keys[:, 1])

        def loss_fn(params):
            p1, bs1 = self._packed_fwd(params, state["batch_stats"], v1)
            p2, bs2 = self._packed_fwd(params, bs1, v2)
            per = jnp.stack([losses.consistency_mse(p1[i], p2[i])
                             for i in range(self.population)])
            return jnp.sum(per), (bs2, per)

        (_, (new_bs, l)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])

        def upd(g, o, p):
            updates, new_o = self.tx.update(g, o, p)
            return optax.apply_updates(p, updates), new_o

        params, opt_state = unrolled_map(upd, grads, state["opt_state"],
                                         state["params"])
        return dict(state, params=params, batch_stats=new_bs,
                    opt_state=opt_state), l

    def _val_step_packed_impl(self, params, batch_stats, images, targets,
                              acc):
        probs = self._packed_fwd(params, batch_stats, images, train=False)
        vals = jnp.stack([self._loss(probs[i], targets)
                          for i in range(self.population)])
        b = images.shape[0]
        return {"sum": acc["sum"] + vals * b, "count": acc["count"] + b}

    def _cons_step_impl(self, state, images, rng):
        # one shared flip/rot of the batch, then two independent
        # photometric views PER CANDIDATE
        k_geo, k_views = jax.random.split(rng)
        flipped = augment.random_flip_and_rotation(k_geo, images)
        cand_keys = jax.random.split(k_views, self.population)

        def per_model(params, batch_stats, opt_state, key):
            k1, k2 = jax.random.split(key)
            v1 = augment.photometric(k1, flipped, self.aug_params,
                                     brightness_first=False)
            v2 = augment.photometric(k2, flipped, self.aug_params,
                                     brightness_first=False)

            def loss_fn(p):
                p1, mut = self.module.apply(
                    {"params": p, "batch_stats": batch_stats}, v1,
                    train=True, mutable=["batch_stats"])
                p2, mut2 = self.module.apply(
                    {"params": p, "batch_stats": mut["batch_stats"]}, v2,
                    train=True, mutable=["batch_stats"])
                return losses.consistency_mse(p1, p2), mut2["batch_stats"]

            (l, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), bs, opt_state, l

        p, bs, o, l = unrolled_map(per_model, state["params"],
                                   state["batch_stats"],
                                   state["opt_state"], cand_keys)
        return dict(state, params=p, batch_stats=bs, opt_state=o), l

    def _val_step_impl(self, params, batch_stats, images, targets, acc):
        def per_model(params, batch_stats):
            probs = self.module.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False)
            return self._loss(probs, targets)

        vals = unrolled_map(per_model, params, batch_stats)
        b = images.shape[0]
        return {"sum": acc["sum"] + vals * b, "count": acc["count"] + b}

    def _select_impl(self, state, metric):
        better = metric < state["best_metric"]

        def sel(new, old):
            b = better.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(b, new, old)

        return dict(
            state,
            best_params=jax.tree.map(sel, state["params"],
                                     state["best_params"]),
            best_batch_stats=jax.tree.map(sel, state["batch_stats"],
                                          state["best_batch_stats"]),
            best_metric=jnp.where(better, metric, state["best_metric"]))

    def _validate_and_keep(self, val_ds, batch_size):
        """Validation on the HBM-cached split (device_eval_batches): the
        per-phase val pass uploads nothing after the first call."""
        from ..data.loader import device_eval_batches
        acc = {"sum": jnp.zeros((self.population,)), "count": jnp.zeros(())}
        for images, targets in device_eval_batches(val_ds, batch_size):
            acc = self._val_step(self.state["params"],
                                 self.state["batch_stats"],
                                 images, targets, acc)
        metric = acc["sum"] / jnp.maximum(acc["count"], 1)
        self.state = self._select(self.state, metric)
        return np.asarray(metric)

    def fit(self, labeled_ds: Dataset, unlabeled_ds: Dataset,
            val_ds: Dataset, *, epochs: int, batch_size: int,
            validation_frequency: int = 1, seed: int = 42,
            log=print) -> np.ndarray:
        import os

        lab_steps = max(len(labeled_ds) // batch_size, 1)
        unl_steps = max(len(unlabeled_ds) // batch_size, 1)
        cache_bytes = (labeled_ds.images.nbytes + unlabeled_ds.images.nbytes
                       + (labeled_ds.targets.nbytes
                          if labeled_ds.targets is not None else 0))
        cache_max = float(os.environ.get("IM_DEVICE_CACHE_MAX_GB",
                                         "5")) * 1024 ** 3
        use_cache = cache_bytes < cache_max
        if use_cache:
            lab_i = jnp.asarray(labeled_ds.images)
            lab_t = jnp.asarray(labeled_ds.targets)
            unl_i = jnp.asarray(unlabeled_ds.images)
            rngs = {"lab": np.random.RandomState(seed),
                    "unl": np.random.RandomState(seed + 1)}
            bufs = {"lab": [], "unl": []}
            sizes = {"lab": len(labeled_ds), "unl": len(unlabeled_ds)}

            def next_idx(which):
                buf = bufs[which]
                while len(buf) < batch_size:
                    buf.extend(rngs[which].permutation(sizes[which]).tolist())
                out = np.asarray(buf[:batch_size], np.int32)
                del buf[:batch_size]
                return out
        else:
            if log:
                log(f"WARNING: consistency sets ({cache_bytes / 1e9:.1f} GB)"
                    f" exceed IM_DEVICE_CACHE_MAX_GB — per-step host "
                    f"uploads LEAK on this relay")
            lab_stream = stream_batches(labeled_ds, batch_size, seed)
            unl_stream = stream_batches(unlabeled_ds, batch_size, seed + 1)
        key = jax.random.PRNGKey(seed)
        history = []
        for epoch in range(epochs):
            t0 = time.time()
            for _ in range(lab_steps):
                if use_cache:
                    self.state, _ = self._sup_step_gather(
                        self.state, lab_i, lab_t, jnp.asarray(next_idx("lab")))
                else:
                    images, targets = next(lab_stream)
                    self.state, _ = self._sup_step(self.state,
                                                   jnp.asarray(images),
                                                   jnp.asarray(targets))
            if epoch % validation_frequency == 0:
                self._validate_and_keep(val_ds, batch_size)
            for _ in range(unl_steps):
                key, k = jax.random.split(key)
                if use_cache:
                    self.state, _ = self._cons_step_gather(
                        self.state, unl_i, jnp.asarray(next_idx("unl")), k)
                else:
                    images, _ = next(unl_stream)
                    self.state, _ = self._cons_step(self.state,
                                                    jnp.asarray(images), k)
            if epoch % validation_frequency == 0:
                metric = self._validate_and_keep(val_ds, batch_size)
                history.append(metric)
                if log:
                    log(f"cs epoch {epoch + 1}/{epochs} val_loss "
                        f"{np.array2string(metric, precision=4)} "
                        f"({time.time() - t0:.1f}s)")
        if not use_cache:
            lab_stream.close()
            unl_stream.close()
        return np.stack(history) if history else np.zeros((0,
                                                           self.population))

    def best_variables(self) -> list:
        bp = jax.device_get(self.state["best_params"])
        bb = jax.device_get(self.state["best_batch_stats"])
        return [{"params": jax.tree.map(lambda a: a[i], bp),
                 "batch_stats": jax.tree.map(lambda a: a[i], bb)}
                for i in range(self.population)]
