"""EvalNet population trainer.

The reference trains 5 EvalNet candidates serially FROM IDENTICAL INITIAL
WEIGHTS (reference functions.py:4623-4630 ``set_weights(initial_weights)``)
— diversity comes only from data-order/augmentation randomness — selecting
top-4 by val MAE (single-head, functions.py:4495) or val total loss
(two-head, functions.py:4647).  Here the candidates train simultaneously as
a vmapped population; each candidate gets an INDEPENDENT shuffle stream
(matching the reference's per-candidate generator reshuffling).

Losses: single-head = MSE(pred_iou, iou); two-head = MSE(iou head) +
BCE(detection head) (reference functions.py:4706, 4758).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import losses
from ..ops.unroll import unrolled_map
from ..train.optim import adamw_decoupled
from .dataset import EvalNetDataset


class EvalNetTrainer:
    """Population trainer for two-input (image, mask) EvalNets.

    Candidates train in HBM-bounded CHUNKS (one unrolled program per
    chunk): the SUIM two-head EvalNet-mIoU (alpha 2, 9 mask channels,
    256^2, batch 32) measured 21.73 GB of HBM for the 5-candidate train
    program against the chip's 15.75 — surfacing as an opaque
    ``remote_compile HTTP 500`` from the relay's compile helper, so the
    grid runners' catch-and-halve cannot recognize it and the chunk is
    sized DETERMINISTICALLY up front: ~4.35 GB/candidate measured at the
    (two-tower, alpha 2, 256^2, b32) anchor, scaled by alpha, H*W and
    batch, against an ``IM_EVALNET_HBM_GB`` budget (default 12, leaving
    ~2 GB for the device-cached split + weights).  ISIC's alpha-1
    EvalNet stays a single pop-5 program (as round 4 ran it);
    ``IM_EVALNET_CHUNK`` overrides."""

    # measured: two-tower EvalNet-mIoU, alpha 2, 256x256, batch 32
    _HBM_ANCHOR_BYTES = 4.35e9

    def __init__(self, module, stacked_variables, *, two_head: bool,
                 learning_rate: float, weight_decay: float,
                 chunk: int = 0, batch_size_hint: int = 32,
                 image_hw: tuple = (256, 256)):
        import os as _os

        self.module = module
        self.two_head = two_head
        self.tx = adamw_decoupled(learning_rate, weight_decay)
        self.population = jax.tree.leaves(stacked_variables)[0].shape[0]
        chunk = chunk or int(_os.environ.get("IM_EVALNET_CHUNK", "0"))
        if not chunk:
            alpha = float(getattr(module, "alpha", 1.0))
            hw = float(image_hw[0]) * float(image_hw[1])
            est = (self._HBM_ANCHOR_BYTES * (alpha / 2.0)
                   * (hw / (256.0 * 256.0)) * (batch_size_hint / 32.0))
            budget = float(_os.environ.get("IM_EVALNET_HBM_GB",
                                           "12")) * 1e9
            chunk = max(1, int(budget // max(est, 1.0)))
        # equalized ceil-division (a distinct chunk shape is a separate
        # multi-minute remote compile, so keep sizes as uniform as we can)
        n_chunks = -(-self.population // min(chunk, self.population))
        chunk = -(-self.population // n_chunks)
        self.bounds = [(s, min(s + chunk, self.population))
                       for s in range(0, self.population, chunk)]

        params = stacked_variables["params"]
        batch_stats = stacked_variables.get("batch_stats", {})

        def make_state(s, e):
            p = jax.tree.map(lambda a: a[s:e], params)
            bs = jax.tree.map(lambda a: a[s:e], batch_stats)
            return {
                "params": p,
                "batch_stats": bs,
                "opt_state": jax.vmap(self.tx.init)(p),
                "best_params": jax.tree.map(jnp.copy, p),
                "best_batch_stats": jax.tree.map(jnp.copy, bs),
                "best_metric": jnp.full((e - s,), jnp.inf),
            }

        self.states = [make_state(s, e) for s, e in self.bounds]
        self._select = jax.jit(self._select_impl, donate_argnums=0)
        self._train_gather = jax.jit(self._train_gather_impl,
                                     donate_argnums=0)
        self._eval_gather = jax.jit(self._eval_gather_impl)

    # ------------------------------------------------------------- internals

    def _loss(self, params, batch_stats, images, masks, iou_t, det_t):
        out, mutated = self.module.apply(
            {"params": params, "batch_stats": batch_stats},
            images, masks, train=True, mutable=["batch_stats"])
        if self.two_head:
            iou_p, det_p = out
            loss = (losses.mse(iou_t, iou_p)
                    + losses.binary_crossentropy(det_t, det_p))
        else:
            loss = losses.mse(iou_t.reshape(out.shape), out)
        return loss, mutated["batch_stats"]

    def _train_step_impl(self, state, images, masks, iou_t, det_t):
        def per_model(params, batch_stats, opt_state, images, masks,
                      iou_t, det_t):
            (l, new_bs), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, batch_stats, images, masks, iou_t, det_t)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs, opt_state,
                    l)

        params, bs, opt, l = unrolled_map(
            per_model, state["params"], state["batch_stats"],
            state["opt_state"], images, masks, iou_t, det_t)
        return dict(state, params=params, batch_stats=bs, opt_state=opt), l

    def _eval_step_impl(self, params, batch_stats, images, masks, iou_t,
                        det_t, acc):
        """Accumulate ALL reported val metrics per candidate.

        Reference reporting (preserved in the results CSV):
        - single-head: (mse, mae), checkpoint monitored on val MAE
          (reference functions.py:4493-4495);
        - two-head: (total_loss, iou_loss, detection_loss, iou_mae,
          detection_acc), monitored on val total loss (reference
          functions.py:4758-4774)."""
        def per_model(params, batch_stats):
            out = self.module.apply(
                {"params": params, "batch_stats": batch_stats},
                images, masks, train=False)
            if self.two_head:
                iou_p, det_p = out
                iou_loss = losses.mse(iou_t, iou_p)
                det_loss = losses.binary_crossentropy(det_t, det_p)
                iou_mae = losses.mae(iou_t, iou_p)
                det_acc = jnp.mean(
                    ((det_p > 0.5).astype(jnp.float32) == det_t)
                    .astype(jnp.float32))
                return jnp.stack([iou_loss + det_loss, iou_loss, det_loss,
                                  iou_mae, det_acc])
            t = iou_t.reshape(out.shape)
            return jnp.stack([losses.mse(t, out), losses.mae(t, out)])

        vals = unrolled_map(per_model, params, batch_stats)  # (P, ncols)
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

    def _train_gather_impl(self, state, idx, images, masks, iou, det):
        """One train step on device-resident data: ``idx`` is (P, B)
        int32 into the uploaded split.  The per-batch host->device
        uploads of the original path cost ~40 MB/step on this relay
        (~25 MB/s host->device, CLAUDE.md) — 2600-image EvalNet epochs
        measured 300-800 s; device gather makes them compute-bound."""
        return self._train_step_impl(state, images[idx], masks[idx],
                                     iou[idx], det[idx])

    def _eval_gather_impl(self, params, batch_stats, idx, images, masks,
                          iou, det, acc):
        return self._eval_step_impl(params, batch_stats, images[idx],
                                    masks[idx], iou[idx], det[idx], acc)

    def _dev_arrays(self, ds: EvalNetDataset):
        """Upload the split ONCE (cache keyed on the host array identity,
        like data.loader.device_eval_batches); detection defaults to a
        zero column so the gathered pytree keeps one structure."""
        if getattr(ds, "_evt_dev_key", None) is not ds.images:
            det = (ds.detection if ds.detection is not None
                   else np.zeros((len(ds), 1), np.float32))
            ds._evt_dev = (jnp.asarray(ds.images), jnp.asarray(ds.masks),
                           jnp.asarray(ds.labels, jnp.float32),
                           jnp.asarray(det, jnp.float32))
            ds._evt_dev_key = ds.images
        return ds._evt_dev

    # ------------------------------------------------------------------- API

    @property
    def metric_names(self) -> list:
        """Column names of :meth:`evaluate` / :attr:`best_rows` (reference
        CSV headers, ISIC_2018/12:138 and functions.py:4661)."""
        if self.two_head:
            return ["total_loss", "iou_loss", "detection_loss", "iou_mae",
                    "detection_acc"]
        return ["mse", "mae"]

    # monitored column: val MAE (single-head, functions.py:4495) /
    # val total loss (two-head, functions.py:4760)
    _MONITOR_COL = {False: 1, True: 0}

    def evaluate(self, val_ds: EvalNetDataset, batch_size: int = 32
                 ) -> np.ndarray:
        """Per-candidate val metrics, shape (P, ncols)."""
        ncols = len(self.metric_names)
        n = len(val_ds)
        if n < batch_size:
            batch_size = n
        dev = self._dev_arrays(val_ds)
        rows = []
        for state, (s, e) in zip(self.states, self.bounds):
            acc = {"sum": jnp.zeros((e - s, ncols)),
                   "count": jnp.zeros(())}
            for start in range(0, n - batch_size + 1, batch_size):
                idx = jnp.asarray(np.arange(start, start + batch_size,
                                            dtype=np.int32))
                acc = self._eval_gather(state["params"],
                                        state["batch_stats"],
                                        idx, *dev, acc)
            rows.append(np.asarray(acc["sum"]
                                   / jnp.maximum(acc["count"], 1)))
        return np.concatenate(rows, axis=0)

    def fit(self, train_ds: EvalNetDataset, val_ds: EvalNetDataset, *,
            epochs: int, batch_size: int, seed: int = 42,
            log=print) -> np.ndarray:
        # a split smaller than the batch still trains at ONE fixed shape:
        # clamp so the wrap-around reshuffle always has a full slice left
        batch_size = min(batch_size, len(train_ds))
        steps = max(len(train_ds) // batch_size, 1)
        rngs = [np.random.RandomState(seed + 1000 * p)
                for p in range(self.population)]
        orders = [r.permutation(len(train_ds)) for r in rngs]
        cursors = [0] * self.population
        ncols = len(self.metric_names)
        self.best_rows = np.full((self.population, ncols), np.inf)
        history = []
        dev = self._dev_arrays(train_ds)
        for epoch in range(epochs):
            t0 = time.time()
            for _ in range(steps):
                pidx = np.empty((self.population, batch_size), np.int32)
                for p in range(self.population):
                    if cursors[p] + batch_size > len(train_ds):
                        orders[p] = rngs[p].permutation(len(train_ds))
                        cursors[p] = 0
                    pidx[p] = orders[p][cursors[p]:cursors[p] + batch_size]
                    cursors[p] += batch_size
                for ci, (s, e) in enumerate(self.bounds):
                    self.states[ci], _ = self._train_gather(
                        self.states[ci], jnp.asarray(pidx[s:e]), *dev)
            rows = self.evaluate(val_ds, batch_size)
            metric = rows[:, self._MONITOR_COL[self.two_head]]
            best_now = np.concatenate(
                [np.asarray(st["best_metric"]) for st in self.states])
            improved = metric < best_now
            self.best_rows[improved] = rows[improved]
            for ci, (s, e) in enumerate(self.bounds):
                self.states[ci] = self._select(
                    self.states[ci], jnp.asarray(metric[s:e]))
            history.append(metric)
            if log:
                log(f"evalnet epoch {epoch + 1}/{epochs} val "
                    f"{np.array2string(metric, precision=4)} "
                    f"({time.time() - t0:.1f}s)")
        return np.stack(history)

    def best_variables(self) -> list:
        out = []
        for state, (s, e) in zip(self.states, self.bounds):
            best_p = jax.device_get(state["best_params"])
            best_bs = jax.device_get(state["best_batch_stats"])
            out.extend({"params": jax.tree.map(lambda a: a[i], best_p),
                        "batch_stats": jax.tree.map(lambda a: a[i],
                                                    best_bs)}
                       for i in range(e - s))
        return out

    def best_metrics(self) -> np.ndarray:
        return np.concatenate([np.asarray(st["best_metric"])
                               for st in self.states])
