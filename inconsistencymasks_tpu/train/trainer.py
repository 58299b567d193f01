"""Population trainer — K candidate models trained simultaneously.

The reference trains 5-10 candidate U-Nets one-by-one per runid with
``clear_session()`` between (reference ISIC_2018/03_ISIC_2018_subset.py:48-79)
and selects the top-K by validation metric via Keras
``ModelCheckpoint(save_best_only=True)`` + post-hoc sort (functions.py:217,
03:82-93).  This is the reference's real parallelism axis (SURVEY.md 2.3:
model-population parallelism), so the TPU rebuild makes it a *vmapped
leading axis*: one XLA program trains the whole population, every conv
becoming a K-times-larger batched conv on the MXU.  All candidates consume
the SAME batch stream (parity: the reference seeds tf.data identically per
candidate, functions.py:208); diversity comes from per-candidate init seeds.

Multi-chip layout: pass a ``jax.sharding.Mesh``.
- axes ('model', 'data'): the training step runs under ``jax.shard_map`` —
  the candidate population is sharded across 'model' (embarrassingly
  parallel, zero communication) and the batch across 'data' (gradients
  pmean'd and BatchNorm statistics psum'd over 'data', so global-batch
  semantics match the reference's single-device batch 32 exactly).
  GSPMD cannot partition the vmapped grouped convolutions over the
  population axis, hence the explicit shard_map.
- axis ('data',) only: plain GSPMD jit with the batch sharded and the
  population replicated.

Keras-semantics parity:
- per-epoch validation with best-weights keeping per candidate
  (``save_best_only`` on the monitored metric, strict improvement);
- monitors: ``binary_iou`` (BinaryIoU target class 1, max — ISIC,
  functions.py:217), ``loss`` (val_loss, min — HeLa, functions.py:257),
  ``soft_mean_iou`` (custom streaming soft MeanIoU, max — multiclass,
  functions.py:305);
- AdamW with tfa decoupled decay (optim.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.loader import Dataset, eval_batches, stream_batches
from ..ops import losses
from ..ops.unroll import unrolled_map
from ..parallel import resolve_mesh
from .optim import adamw_decoupled


@dataclass(frozen=True)
class Monitor:
    kind: str          # 'binary_iou' | 'loss' | 'soft_mean_iou'
    mode: str          # 'max' | 'min'

    @classmethod
    def isic(cls):
        return cls("binary_iou", "max")

    @classmethod
    def hela(cls):
        return cls("loss", "min")

    @classmethod
    def multiclass(cls):
        return cls("soft_mean_iou", "max")


def _resolve_loss(name: str, num_classes: int) -> Callable:
    """Whole-batch scalar loss."""
    if name == "mse":
        return lambda probs, tgt: losses.mse(tgt, probs)
    if name == "cce":
        def cce(probs, tgt):
            onehot = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
            return losses.categorical_crossentropy(onehot, probs)
        return cce
    raise ValueError(f"unknown loss {name!r} (use 'mse' or 'cce')")


def _per_sample_loss(name: str, num_classes: int) -> Callable:
    """(B,)-shaped per-sample loss, for masked validation accumulation."""
    if name == "mse":
        def mse_ps(probs, tgt):
            d = jnp.square(probs.astype(jnp.float32)
                           - tgt.astype(jnp.float32))
            return jnp.mean(d, axis=tuple(range(1, d.ndim)))
        return mse_ps

    def cce_ps(probs, tgt):
        onehot = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
        p = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        per_px = -jnp.sum(onehot * jnp.log(p), axis=-1)
        return jnp.mean(per_px, axis=tuple(range(1, per_px.ndim)))
    return cce_ps


class PopulationTrainer:
    """Trains a population of identical-architecture models on one stream."""

    def __init__(self, module, stacked_variables, *, loss: str,
                 monitor: Monitor, learning_rate: float, weight_decay: float,
                 num_classes: int = 1, mesh: Optional[Mesh] = None,
                 forward: str = "auto", max_packed_width: int = 128):
        """``forward``: 'packed' | 'unrolled' | 'auto'.

        'packed' runs the population train step on the channel-packed
        block-diagonal layout (models/packed_unet.py) — one MXU pass
        computes all P candidates, recovering the lanes the tiny per-model
        channel counts would waste (ROADMAP.md #1).  'auto' picks packed
        whenever the module is a dropout-free UNet and P > 1."""
        self.module = module
        self.monitor = monitor
        self.num_classes = num_classes
        self.loss_fn = _resolve_loss(loss, num_classes)
        self.loss_ps_fn = _per_sample_loss(loss, num_classes)
        self.tx = adamw_decoupled(learning_rate, weight_decay)
        mesh = resolve_mesh(mesh)
        self.mesh = mesh
        self.max_packed_width = max_packed_width

        self.population = jax.tree.leaves(stacked_variables)[0].shape[0]
        params = stacked_variables["params"]
        batch_stats = stacked_variables.get("batch_stats", {})
        opt_state = jax.vmap(self.tx.init)(params)
        init_metric = jnp.full((self.population,),
                               -jnp.inf if monitor.mode == "max" else jnp.inf)
        # best_* must be distinct buffers: the train step donates its input
        # state, and aliased leaves would be donated twice.
        self.state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
            "best_params": jax.tree.map(jnp.copy, params),
            "best_batch_stats": jax.tree.map(jnp.copy, batch_stats),
            "best_metric": init_metric,
        }

        self._model_axis = None
        self._data_axis = None
        self._batch_sharding = None
        if mesh is not None:
            if "model" in mesh.axis_names:
                self._model_axis = "model"
                n_model = dict(zip(mesh.axis_names,
                                   mesh.devices.shape))["model"]
                if self.population % n_model != 0:
                    # shard_map needs an even candidate split; fall back to
                    # data-parallel only (population replicated)
                    self._model_axis = None
            if "data" in mesh.axis_names:
                self._data_axis = "data"
            self._batch_sharding = NamedSharding(mesh, P(self._data_axis))
            self._replicated = NamedSharding(mesh, P())
            if self._model_axis:
                pop_sharding = NamedSharding(mesh, P("model"))
                self.state = jax.device_put(self.state, pop_sharding)
            else:
                self.state = jax.device_put(self.state, self._replicated)

        # the module used inside the (possibly sharded) train step: with a
        # sharded batch under shard_map, BN statistics sync over 'data'
        self._bn_axis = ("data" if self._model_axis and self._data_axis
                         else None)
        if self._bn_axis and hasattr(module, "bn_sync_axis"):
            import dataclasses
            self.train_module = dataclasses.replace(module,
                                                    bn_sync_axis="data")
        else:
            self.train_module = module

        from ..models.unet import UNet as _UNet
        packable = (isinstance(module, _UNet)
                    and module.dropout_rate_encoder == 0
                    and module.dropout_rate_decoder == 0
                    and module.dropout_rate_bottleneck == 0)
        if forward == "packed" and not packable:
            raise ValueError("forward='packed' requires a dropout-free UNet")
        if forward not in ("auto", "packed", "unrolled"):
            raise ValueError(f"unknown forward mode {forward!r}")
        self.packed = (forward != "unrolled" and packable
                       and self.population > 1)
        # remat for big fused populations: at 256^2/b32, pop<=15 fits HBM
        # with saved activations; beyond that recompute the forward
        self.remat = self.packed and self.population > int(
            os.environ.get("IM_REMAT_ABOVE", "15"))
        self._step_impl = (self._train_step_packed_impl if self.packed
                           else self._train_step_impl)

        self._train_step_gather = jax.jit(self._train_step_gather_impl,
                                          donate_argnums=0)

        if self._model_axis:
            state_spec = jax.tree.map(lambda _: P("model"), self.state)
            batch_spec = P(self._data_axis)
            self._train_step = jax.jit(jax.shard_map(
                self._step_impl, mesh=mesh,
                in_specs=(state_spec, batch_spec, batch_spec),
                out_specs=(state_spec, P("model")), check_vma=False),
                donate_argnums=0)
            self._eval_step = jax.jit(jax.shard_map(
                self._eval_step_impl, mesh=mesh,
                in_specs=(state_spec["params"], state_spec["batch_stats"],
                          batch_spec, batch_spec, batch_spec,
                          jax.tree.map(lambda _: P("model"),
                                       self._zero_acc())),
                out_specs=jax.tree.map(lambda _: P("model"),
                                       self._zero_acc()),
                check_vma=False))
        else:
            self._train_step = jax.jit(self._step_impl,
                                       donate_argnums=0)
            self._eval_step = jax.jit(self._eval_step_impl)
        self._select_best = jax.jit(self._select_best_impl, donate_argnums=0)

    # ------------------------------------------------------------------ steps

    def _train_step_impl(self, state, images, targets):
        def per_model(params, batch_stats, opt_state):
            def loss_fn(p):
                probs, mutated = self.train_module.apply(
                    {"params": p, "batch_stats": batch_stats},
                    images, train=True, mutable=["batch_stats"])
                return self.loss_fn(probs, targets), mutated["batch_stats"]

            (loss_val, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if self._model_axis and self._data_axis:
                grads = jax.lax.pmean(grads, self._data_axis)
                loss_val = jax.lax.pmean(loss_val, self._data_axis)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, new_opt, loss_val

        params, batch_stats, opt_state, loss_val = unrolled_map(
            per_model, state["params"], state["batch_stats"],
            state["opt_state"])
        state = dict(state, params=params, batch_stats=batch_stats,
                     opt_state=opt_state)
        return state, loss_val

    def _train_step_packed_impl(self, state, images, targets):
        """Train step on the channel-packed population layout.

        The P candidates are independent, so the gradient of the SUMMED
        per-model losses w.r.t. the stacked params equals the per-model
        gradients — one value_and_grad over the whole packed program.
        Optimizer update stays per-model (elementwise, unrolled)."""
        from ..models.packed_unet import packed_unet_apply
        m = self.module

        def fwd(params, batch_stats, images):
            return packed_unet_apply(
                {"params": params, "batch_stats": batch_stats},
                images, train=True, num_classes=m.num_classes,
                activation=m.activation, out_activation=m.out_activation,
                max_packed_width=self.max_packed_width,
                compute_dtype=m.compute_dtype, bn_sync_axis=self._bn_axis)

        if self.remat:
            # large fused populations exceed HBM if every packed
            # activation is saved for backward; recompute the forward
            # instead (fwd is ~25 % of the step, OOM is fatal)
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            probs, new_bs = fwd(params, state["batch_stats"], images)
            # per-candidate images (P,B,H,W,C) come with per-candidate
            # targets (P,B,...); the shared-batch path shares both
            per_tgt = images.ndim == 5
            per_model = jnp.stack([
                self.loss_fn(probs[i], targets[i] if per_tgt else targets)
                for i in range(probs.shape[0])])
            return jnp.sum(per_model), (new_bs, per_model)

        (_, (new_bs, loss_val)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        if self._bn_axis:
            grads = jax.lax.pmean(grads, self._data_axis)
            loss_val = jax.lax.pmean(loss_val, self._data_axis)

        def upd(g, o, p):
            updates, new_o = self.tx.update(g, o, p)
            return optax.apply_updates(p, updates), new_o

        params, opt_state = unrolled_map(upd, grads, state["opt_state"],
                                         state["params"])
        return dict(state, params=params, batch_stats=new_bs,
                    opt_state=opt_state), loss_val

    def _train_step_gather_impl(self, state, images_all, targets_all, idx):
        """Device-cache path: the whole training set lives in HBM and each
        step gathers its batch by indices — the host ships only (B,) int32
        per step instead of megabytes of pixels."""
        images = jnp.take(images_all, idx, axis=0)
        targets = jnp.take(targets_all, idx, axis=0)
        return self._step_impl(state, images, targets)

    def _train_step_multi_impl(self, state, images_all, targets_all, idx,
                               mask, *, sharded: bool = False):
        """Fused multi-CELL step: images_all (C, Nmax, H, W, ch) holds C
        different training sets in HBM; candidate i belongs to cell
        i // (P // C) and gathers its own batch via idx (C, B).  ``mask``
        (P,) bool gates the whole update so cells keep their OWN
        steps_per_epoch in lockstep (reference trains each cell
        len(ds)//batch steps per epoch, functions.py:207-218).

        ``sharded=True`` runs inside shard_map over 'model': the LOCAL
        candidate slice maps to its cells via the shard offset
        (axis_index * local population), so cell boundaries need not align
        with shard boundaries; the datasets/idx stay replicated."""
        p_loc = jax.tree.leaves(state["params"])[0].shape[0]
        n_cells = idx.shape[0]
        cands = self.population // n_cells
        cand0 = (jax.lax.axis_index("model") * p_loc if sharded
                 else jnp.int32(0))
        cell_ids = (cand0 + jnp.arange(p_loc)) // cands         # (P_loc,)
        nmax = images_all.shape[1]
        rows = jnp.take(idx, cell_ids, axis=0)                  # (P_loc, B)
        gidx = (cell_ids[:, None] * nmax + rows).reshape(-1)
        flat_i = images_all.reshape((-1,) + images_all.shape[2:])
        flat_t = targets_all.reshape((-1,) + targets_all.shape[2:])
        imgs = jnp.take(flat_i, gidx, axis=0).reshape(
            (p_loc, -1) + images_all.shape[2:])
        tgts = jnp.take(flat_t, gidx, axis=0).reshape(
            (p_loc, -1) + targets_all.shape[2:])
        new_state, loss = self._train_step_packed_impl(state, imgs, tgts)

        def sel(new, old):
            m = mask.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        merged = {k: jax.tree.map(sel, new_state[k], state[k])
                  for k in ("params", "batch_stats", "opt_state")}
        return dict(new_state, **merged), loss * mask

    def _forward_eval(self, params, batch_stats, images):
        return self.module.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False)

    def _eval_step_impl(self, params, batch_stats, images, targets, mask,
                        acc):
        """Accumulate the monitored metric over one val batch; ``mask`` (B,)
        marks valid (non-padded) samples."""
        probs = unrolled_map(
            lambda p, bs: self._forward_eval(p, bs, images),
            params, batch_stats)                  # (P, B, H, W, C)
        m = mask.astype(jnp.float32)

        kind = self.monitor.kind
        if kind == "binary_iou":
            valid = m[:, None, None, None] > 0
            t = jnp.logical_and(targets.astype(jnp.float32) > 0.5, valid)
            p = jnp.logical_and(probs > 0.5, valid[None])
            inter = jnp.sum(jnp.logical_and(t[None], p), axis=(1, 2, 3, 4))
            union = jnp.sum(jnp.logical_or(t[None], p), axis=(1, 2, 3, 4))
            inter = inter.astype(jnp.float32)
            union = union.astype(jnp.float32)
            if self._model_axis and self._data_axis:
                inter = jax.lax.psum(inter, self._data_axis)
                union = jax.lax.psum(union, self._data_axis)
            return {"intersection": acc["intersection"] + inter,
                    "union": acc["union"] + union}
        if kind == "loss":
            per = jax.vmap(lambda pr: jnp.sum(
                self.loss_ps_fn(pr, targets) * m))(probs)
            cnt = jnp.sum(m)
            if self._model_axis and self._data_axis:
                per = jax.lax.psum(per, self._data_axis)
                cnt = jax.lax.psum(cnt, self._data_axis)
            return {"loss_sum": acc["loss_sum"] + per,
                    "count": acc["count"] + cnt}
        if kind == "soft_mean_iou":
            onehot = jax.nn.one_hot(targets, self.num_classes,
                                    dtype=jnp.float32)
            onehot = onehot * m[:, None, None, None]
            probs_m = probs * m[None, :, None, None, None]
            inter = jnp.sum(onehot[None] * probs_m, axis=(1, 2, 3))  # (P,C)
            t_sum = jnp.sum(onehot, axis=(0, 1, 2))[None]
            p_sum = jnp.sum(probs_m, axis=(1, 2, 3))
            if self._model_axis and self._data_axis:
                inter = jax.lax.psum(inter, self._data_axis)
                t_sum = jax.lax.psum(t_sum, self._data_axis)
                p_sum = jax.lax.psum(p_sum, self._data_axis)
            union = t_sum + p_sum - inter
            iou = jnp.mean(inter / union, axis=-1)                   # (P,)
            return {"total_iou": acc["total_iou"] + iou,
                    "count": acc["count"] + 1.0}
        raise ValueError(kind)

    def _metric_result(self, acc):
        kind = self.monitor.kind
        if kind == "binary_iou":
            return acc["intersection"] / jnp.maximum(acc["union"], 1e-9)
        if kind == "loss":
            return acc["loss_sum"] / acc["count"]
        return acc["total_iou"] / acc["count"]

    def _zero_acc(self):
        z = lambda: jnp.zeros((self.population,), jnp.float32)
        if self.monitor.kind == "binary_iou":
            return {"intersection": z(), "union": z()}
        if self.monitor.kind == "loss":
            return {"loss_sum": z(), "count": z()}
        return {"total_iou": z(), "count": z()}

    def _select_best_impl(self, state, metric):
        if self.monitor.mode == "max":
            better = metric > state["best_metric"]
        else:
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
            best_metric=jnp.where(better, metric, state["best_metric"]),
        )

    # ------------------------------------------------------------------- API

    def _pad_to_mesh(self, images, targets):
        """Pad batch (with a validity mask) to a multiple of the data axis."""
        b = images.shape[0]
        mask = np.ones((b,), np.float32)
        if self.mesh is not None and self._data_axis:
            n = dict(zip(self.mesh.axis_names,
                         self.mesh.devices.shape))["data"]
            pad = (-b) % n
            if pad:
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:],
                                      images.dtype)])
                if targets is not None:
                    targets = np.concatenate(
                        [targets, np.zeros((pad,) + targets.shape[1:],
                                           targets.dtype)])
                mask = np.concatenate([mask, np.zeros((pad,), np.float32)])
        return images, targets, mask

    def _put_batch(self, images, targets):
        images = jnp.asarray(images)
        targets = None if targets is None else jnp.asarray(targets)
        if self._batch_sharding is not None:
            n = dict(zip(self.mesh.axis_names,
                         self.mesh.devices.shape)).get("data", 1)
            sh = (self._batch_sharding if images.shape[0] % n == 0
                  else self._replicated)
            images = jax.device_put(images, sh)
            if targets is not None:
                targets = jax.device_put(targets, sh)
        return images, targets

    def evaluate(self, val_ds: Dataset, batch_size: int = 32) -> np.ndarray:
        """Monitored metric per candidate over the validation set.

        Single-chip: the split is cached in HBM (device_eval_batches) so
        the per-epoch validation pass uploads NOTHING — this environment's
        relay client leaks every host->device payload (~1.2 bytes RSS per
        byte sent, measured), so repeated bulk uploads eventually OOM the
        HOST.  Overlapped final batches are masked out instead of dropped
        (the metric accumulates in-program)."""
        from ..data.loader import device_eval_batches
        acc = self._zero_acc()
        if self.mesh is None:
            for images, targets, skip in device_eval_batches(
                    val_ds, batch_size, pad_final=True):
                mask = np.ones((images.shape[0],), np.float32)
                mask[:skip] = 0.0
                acc = self._eval_step(self.state["params"],
                                      self.state["batch_stats"],
                                      images, targets, jnp.asarray(mask),
                                      acc)
            return np.asarray(self._metric_result(acc))
        for images, targets in eval_batches(val_ds, batch_size):
            images, targets, mask = self._pad_to_mesh(images, targets)
            images, targets = self._put_batch(images, targets)
            acc = self._eval_step(self.state["params"],
                                  self.state["batch_stats"],
                                  images, targets, jnp.asarray(mask), acc)
        return np.asarray(self._metric_result(acc))

    def fit(self, train_ds: Dataset, val_ds: Dataset, *, epochs: int,
            batch_size: int, steps_per_epoch: Optional[int] = None,
            seed: int = 42, log: Optional[Callable[[str], None]] = print):
        """Keras ``fit``-equivalent: epochs x steps_per_epoch over an
        infinite reshuffling stream, per-epoch validation, best-weights
        keeping.  Returns the per-epoch metric history (epochs, P)."""
        if steps_per_epoch is None:
            steps_per_epoch = max(len(train_ds) // batch_size, 1)

        # Device-resident dataset cache (single-chip path): keep the whole
        # training set in HBM and gather batches by index on device — the
        # per-step host->device transfer drops from the full batch to (B,)
        # int32.  The sharded-mesh path keeps the host stream (batches must
        # arrive sharded over the data axis).
        #
        # The ceiling matters on this environment: the relay client LEAKS
        # every host->device payload (~1.2 bytes host RSS per byte sent,
        # measured), so the streamed path's per-step uploads grow the host
        # process by gigabytes per epoch on big sets — the kernel
        # OOM-killed round 4's AIM++ stage three times at ~130 GB before
        # the ceiling was raised from 2 to 5 GiB.  If the cache + working
        # set exceed HBM instead, the grid-cell runners catch the device
        # OOM and halve the candidate chunk (workflows.py), which shrinks
        # the working set while keeping the cache.
        cache_bytes = train_ds.images.nbytes + (
            train_ds.targets.nbytes if train_ds.targets is not None else 0)
        cache_max = float(os.environ.get("IM_DEVICE_CACHE_MAX_GB",
                                         "5")) * 1024 ** 3
        use_cache = self.mesh is None and cache_bytes < cache_max
        if self.mesh is None and not use_cache and log:
            log(f"WARNING: training set ({cache_bytes / 1e9:.1f} GB) "
                f"exceeds IM_DEVICE_CACHE_MAX_GB — falling back to "
                f"per-step host uploads, which LEAK on this relay")
        if use_cache:
            images_all = jnp.asarray(train_ds.images)
            targets_all = jnp.asarray(train_ds.targets)
            idx_rng = np.random.RandomState(seed)
            idx_buf: list = []

            def next_idx():
                while len(idx_buf) < batch_size:
                    idx_buf.extend(idx_rng.permutation(len(train_ds)
                                                       ).tolist())
                out = np.asarray(idx_buf[:batch_size], np.int32)
                del idx_buf[:batch_size]
                return out
        else:
            stream = stream_batches(train_ds, batch_size, seed)
        history = []
        for epoch in range(epochs):
            t0 = time.time()
            # accumulate the loss ON DEVICE — a per-step host fetch would
            # serialize dispatch (and costs a full round trip per step on
            # remote backends); one fetch per epoch instead
            loss_vals = []
            for _ in range(steps_per_epoch):
                if use_cache:
                    self.state, loss_val = self._train_step_gather(
                        self.state, images_all, targets_all,
                        jnp.asarray(next_idx()))
                else:
                    images, targets = next(stream)
                    images, targets = self._put_batch(images, targets)
                    self.state, loss_val = self._train_step(self.state,
                                                            images, targets)
                loss_vals.append(jnp.mean(loss_val))
            metric = self.evaluate(val_ds, batch_size)
            self.state = self._select_best(self.state, jnp.asarray(metric))
            history.append(metric)
            if log:
                running = float(jnp.mean(jnp.stack(loss_vals)))
                log(f"epoch {epoch + 1}/{epochs} "
                    f"loss {running:.4f} "
                    f"val_{self.monitor.kind} "
                    f"{np.array2string(metric, precision=4)} "
                    f"({time.time() - t0:.1f}s)")
        if not use_cache:
            stream.close()          # stop the prefetch producer thread
        return np.stack(history)

    def fit_multi(self, train_datasets, val_ds: Dataset, *, epochs: int,
                  batch_size: int, steps_per_epoch=None, seed: int = 42,
                  log: Optional[Callable[[str], None]] = print):
        """Train a population whose candidates belong to DIFFERENT cells:
        ``train_datasets`` has C entries; candidate i trains on dataset
        i // (population // C).  Each cell keeps its own reference
        steps_per_epoch (len//batch, or the ``steps_per_epoch`` list) via
        per-step update masking, so a fused run reproduces each solo
        cell's trajectory.  Requires the packed path; runs single-chip or
        sharded over a 'model' mesh axis (the cell datasets are replicated
        in each device's HBM and every shard gathers its own candidates'
        batches — SURVEY.md 2.3 model-population parallelism).  A
        data-sharded (>1) mesh is not supported."""
        if not self.packed:
            raise ValueError("fit_multi requires the packed train path")
        if self.mesh is not None and self._data_axis:
            n_data = dict(zip(self.mesh.axis_names,
                              self.mesh.devices.shape))["data"]
            if n_data > 1:
                raise ValueError("fit_multi does not support a "
                                 "data-sharded mesh yet")
        n_cells = len(train_datasets)
        if self.population % n_cells:
            raise ValueError(f"population {self.population} not divisible "
                             f"by {n_cells} cells")
        cands = self.population // n_cells
        if steps_per_epoch is None:
            steps = [max(len(ds) // batch_size, 1) for ds in train_datasets]
        else:
            steps = list(steps_per_epoch)
        max_steps = max(steps)

        n_max = max(len(ds) for ds in train_datasets)

        def pad(a):
            if a.shape[0] == n_max:
                return a
            padding = np.zeros((n_max - a.shape[0],) + a.shape[1:], a.dtype)
            return np.concatenate([a, padding])

        images_all = jnp.asarray(np.stack(
            [pad(ds.images) for ds in train_datasets]))
        targets_all = jnp.asarray(np.stack(
            [pad(ds.targets) for ds in train_datasets]))

        rngs = [np.random.RandomState(seed) for _ in train_datasets]
        bufs: list = [[] for _ in train_datasets]

        def next_idx(c):
            while len(bufs[c]) < batch_size:
                bufs[c].extend(
                    rngs[c].permutation(len(train_datasets[c])).tolist())
            out = np.asarray(bufs[c][:batch_size], np.int32)
            del bufs[c][:batch_size]
            return out

        if self._model_axis:
            from functools import partial
            state_spec = jax.tree.map(lambda _: P("model"), self.state)
            step_fn = jax.jit(jax.shard_map(
                partial(self._train_step_multi_impl, sharded=True),
                mesh=self.mesh,
                in_specs=(state_spec, P(), P(), P(), P("model")),
                out_specs=(state_spec, P("model")), check_vma=False),
                donate_argnums=0)
        else:
            step_fn = jax.jit(self._train_step_multi_impl, donate_argnums=0)
        # per-step masks: cell c active while t < steps[c]
        masks = [np.repeat(np.asarray([t < s for s in steps]), cands)
                 for t in range(max_steps)]

        history = []
        for epoch in range(epochs):
            t0 = time.time()
            loss_vals = []
            for t in range(max_steps):
                idx = np.stack([next_idx(c) if steps[c] > t else
                                np.zeros(batch_size, np.int32)
                                for c in range(n_cells)])
                self.state, loss_val = step_fn(
                    self.state, images_all, targets_all, jnp.asarray(idx),
                    jnp.asarray(masks[t]))
                loss_vals.append(jnp.sum(loss_val) / max(sum(
                    1 for s in steps if s > t), 1) / cands)
            metric = self.evaluate(val_ds, batch_size)
            self.state = self._select_best(self.state, jnp.asarray(metric))
            history.append(metric)
            if log:
                running = float(jnp.mean(jnp.stack(loss_vals)))
                log(f"epoch {epoch + 1}/{epochs} "
                    f"loss {running:.4f} "
                    f"val_{self.monitor.kind} "
                    f"{np.array2string(metric, precision=4)} "
                    f"({time.time() - t0:.1f}s)")
        return np.stack(history)

    def best_variables(self) -> list:
        """Per-candidate best-epoch variables (Keras reload-best parity)."""
        best_p = jax.device_get(self.state["best_params"])
        best_bs = jax.device_get(self.state["best_batch_stats"])
        out = []
        for i in range(self.population):
            out.append({
                "params": jax.tree.map(lambda a: a[i], best_p),
                "batch_stats": jax.tree.map(lambda a: a[i], best_bs),
            })
        return out

    def best_metrics(self) -> np.ndarray:
        return np.asarray(self.state["best_metric"])
