"""EvalNet filtering ("segnet data" creation, reference
functions.py:4991-5677): for every unlabeled image, gather the K candidate
masks produced by previous models, score every (image, mask) pair with an
EvalNet ensemble, keep the argmax candidate if its (mean) score clears the
threshold.

Reference structure preserved: optional copy of the last generation's
accepted set first (functions.py:5020-5023); the last-gen accepted mask (if
present) joins the candidate list (5041-5045); acceptance is ``>=
threshold`` (5147); mIoU variants average per-class IoU only over classes
whose mean detection confidence >= 0.5, scoring 0 when none pass
(5421-5434).

TPU design: the candidate axis K is FOLDED INTO THE BATCH — a batch of B
images with K candidates each becomes one (B*K) pair batch scored by all E
EvalNets in a single vmapped program (the reference scores one image's K
pairs per predict call, functions.py:5126-5145).  Images with/without a
last-gen candidate have different K, so batches are grouped by K (at most
two compiled shapes).
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import list_pngs
from ..postproc.hela import get_min_dist, get_pos_contours
from ..ops.unroll import unrolled_map
from ..pseudo.engine import StackedEnsemble
from ..utils.io_pool import flushes_writes, imwrite_async

_SCORE_CACHE: dict = {}


def _scorer(module, two_head: bool):
    """Jitted ensemble-MEAN scorer — the E-model unroll and the mean over
    models fuse into one program (an eager per-batch mean costs a ~1 s
    dispatch on this backend)."""
    key = (module, two_head)
    fn = _SCORE_CACHE.get(key)
    if fn is None:
        def score(stacked_vars, images, masks):
            def per_model(v):
                return module.apply(v, images, masks, train=False)
            out = unrolled_map(per_model, stacked_vars)
            return jax.tree.map(lambda t: jnp.mean(t, axis=0), out)
        fn = jax.jit(score)
        _SCORE_CACHE[key] = fn
    return fn


def _gather_scorer_mc(module, num_classes: int):
    """Device-cached two-head scorer for the multiclass filter.

    The original per-batch path uploaded (B*K) image copies plus HOST-side
    one-hot masks every batch — ~63 MB/batch, and the relay client leaks
    ~1.2 bytes of host RSS per byte sent (CLAUDE.md): the SUIM gen-0
    filter measured 70 GB uploaded / 83 GB RSS before the host limit.
    This variant gathers a (B,) index batch from the ONCE-uploaded images
    and candidate CLASS MAPS and builds the one-hot ON DEVICE, so the
    per-batch host->device transfer is a (B,) int32 vector."""
    key = (module, "gather", num_classes)
    fn = _SCORE_CACHE.get(key)
    if fn is None:
        def score(stacked_vars, images_all, cands_all, idx):
            imgs = images_all[idx]                       # (B,H,W,3)
            cands = cands_all[idx]                       # (B,K,H,W)
            b, k = cands.shape[0], cands.shape[1]
            flat_imgs = jnp.repeat(imgs, k, axis=0)
            oh = jax.nn.one_hot(
                jnp.clip(cands, 0, num_classes - 1), num_classes,
                dtype=jnp.uint8, axis=-1)                # (B,K,H,W,C) 0/1
            flat_masks = oh.reshape((b * k,) + oh.shape[2:])

            def per_model(v):
                return module.apply(v, flat_imgs, flat_masks, train=False)

            out = unrolled_map(per_model, stacked_vars)
            return jax.tree.map(lambda t: jnp.mean(t, axis=0), out)

        fn = jax.jit(score)
        _SCORE_CACHE[key] = fn
    return fn


def _load_candidates(imagename, mask_paths, accepted_masks_dir):
    """Candidate masks for one image: one per prediction dir + optionally
    the already-accepted (last-gen) mask."""
    masks = []
    for mp in mask_paths:
        m = cv2.imread(os.path.join(mp, imagename), 0)
        if m is None:
            return None  # reference assumes presence; skip defensively
        masks.append(m)
    acc = os.path.join(accepted_masks_dir, imagename)
    if os.path.isfile(acc):
        masks.append(cv2.imread(acc, 0))
    return masks


@flushes_writes
def create_training_data_for_segnet_binary(
        evalnet_module, evalnets: Sequence, images_path: str,
        mask_paths: Sequence[str], main_output_path: str, threshold: float,
        *, last_gen_main_path: str = "", channels: int = 3,
        batch_size: int = 16) -> int:
    """Binary filtering (reference functions.py:4991-5152; the single-model
    variant is the E=1 case).  Returns the number of accepted images."""
    ens = StackedEnsemble(evalnet_module, evalnets)
    score = _scorer(evalnet_module, two_head=False)

    images_out = os.path.join(main_output_path, "images")
    masks_out = os.path.join(main_output_path, "masks")
    os.makedirs(images_out, exist_ok=True)
    os.makedirs(masks_out, exist_ok=True)

    if last_gen_main_path:
        for n in list_pngs(os.path.join(last_gen_main_path, "images")):
            shutil.copy(os.path.join(last_gen_main_path, "images", n),
                        os.path.join(images_out, n))
            shutil.copy(os.path.join(last_gen_main_path, "masks", n),
                        os.path.join(masks_out, n))

    names = list_pngs(images_path)
    # group images by candidate count K for shape-static batches
    groups: dict = {}
    for n in names:
        cands = _load_candidates(n, mask_paths, masks_out)
        if cands is None:
            continue
        img = cv2.imread(os.path.join(images_path, n))
        if channels == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        else:
            img = cv2.imread(os.path.join(images_path, n), 0)[..., None]
        groups.setdefault(len(cands), []).append((n, img, cands))

    accepted = 0
    for k, items in groups.items():
        for start in range(0, len(items), batch_size):
            chunk = items[start:start + batch_size]
            b = len(chunk)
            # pad the final chunk so every batch compiles the same program
            # shape (each distinct shape is a multi-minute remote compile);
            # padded rows are scored and dropped
            chunk_p = chunk + [chunk[-1]] * (batch_size - b)
            imgs = np.stack([c[1] for c in chunk_p])                # (B,...)
            masks = np.stack([np.stack(c[2]) for c in chunk_p])     # (B,K,H,W)
            flat_imgs = np.repeat(imgs, k, axis=0)
            flat_masks = masks.reshape(batch_size * k, *masks.shape[2:])[..., None]
            scores = score(ens.stacked, jnp.asarray(flat_imgs),
                           jnp.asarray(flat_masks))        # (B*K,1) mean
            mean = np.asarray(scores).reshape(batch_size, k)
            best_idx = mean.argmax(axis=1)
            for i, (n, img, cands) in enumerate(chunk):
                if mean[i, best_idx[i]] >= threshold:
                    shutil.copy(os.path.join(images_path, n),
                                os.path.join(images_out, n))
                    imwrite_async(os.path.join(masks_out, n),
                                cands[best_idx[i]])
                    accepted += 1
    return accepted


@flushes_writes
def create_training_data_for_segnet_miou_multiclass(
        evalnet_module, evalnets: Sequence, images_path: str,
        mask_paths: Sequence[str], main_output_path: str, threshold: float,
        *, num_classes: int, last_gen_main_path: str = "",
        channels: int = 3, batch_size: int = 8) -> int:
    """Two-head filtering with detection-masked mIoU (reference
    functions.py:5468-5577)."""
    ens = StackedEnsemble(evalnet_module, evalnets)
    score = _gather_scorer_mc(evalnet_module, num_classes)

    images_out = os.path.join(main_output_path, "images")
    masks_out = os.path.join(main_output_path, "masks")
    os.makedirs(images_out, exist_ok=True)
    os.makedirs(masks_out, exist_ok=True)

    if last_gen_main_path:
        for n in list_pngs(os.path.join(last_gen_main_path, "images")):
            shutil.copy(os.path.join(last_gen_main_path, "images", n),
                        os.path.join(images_out, n))
            shutil.copy(os.path.join(last_gen_main_path, "masks", n),
                        os.path.join(masks_out, n))

    names = list_pngs(images_path)
    groups: dict = {}
    for n in names:
        cands = _load_candidates(n, mask_paths, masks_out)
        if cands is None:
            continue
        img = cv2.cvtColor(cv2.imread(os.path.join(images_path, n)),
                           cv2.COLOR_BGR2RGB)
        groups.setdefault(len(cands), []).append((n, img, cands))

    accepted = 0
    for k, items in groups.items():
        # this K-group's images + candidate class maps upload ONCE; every
        # batch then gathers by (B,) int32 on device (see _gather_scorer_mc)
        dev_imgs = jnp.asarray(np.stack([c[1] for c in items]))
        dev_cands = jnp.asarray(
            np.stack([np.stack(c[2]) for c in items]))       # (N,K,H,W)
        n_items = len(items)
        for start in range(0, n_items, batch_size):
            sel = np.arange(start, min(start + batch_size, n_items))
            b = len(sel)
            # pad the final batch so every batch compiles the same program
            # shape (each distinct shape is a multi-minute remote compile);
            # padded rows are scored and dropped
            sel_p = np.concatenate(
                [sel, np.full(batch_size - b, sel[-1])]).astype(np.int32)
            iou_p, det_p = score(ens.stacked, dev_imgs, dev_cands,
                                 jnp.asarray(sel_p))         # (B*K,C) means
            mean_iou = np.asarray(iou_p).reshape(batch_size, k, num_classes)
            mean_det = np.asarray(det_p).reshape(batch_size, k, num_classes)
            valid = mean_det >= 0.5
            num_valid = valid.sum(-1)
            miou = np.where(
                num_valid > 0,
                (mean_iou * valid).sum(-1) / np.maximum(num_valid, 1), 0.0)
            best_idx = miou.argmax(axis=1)
            for i in range(b):
                n, _img, cand_list = items[start + i]
                if miou[i, best_idx[i]] >= threshold:
                    shutil.copy(os.path.join(images_path, n),
                                os.path.join(images_out, n))
                    imwrite_async(os.path.join(masks_out, n),
                                  cand_list[best_idx[i]])
                    accepted += 1
        del dev_imgs, dev_cands
    return accepted


@flushes_writes
def create_training_data_for_segnet_miou_hela(
        evalnet_module, evalnets: Sequence, bf_images_path: str,
        mask_main_paths: Sequence[str], main_output_path: str,
        threshold: float, *, last_gen_main_path: str = "",
        max_pos_circle_size: int = 8, min_pos_circle_size: int = 3,
        batch_size: int = 8) -> int:
    """HeLa filtering (reference functions.py:5323-5465): candidates are
    per-channel mask TRIPLES from each source dir; masks are fed to the
    EvalNet as a stacked {0,1} 3-channel tensor; the accepted position
    channel is redrawn as clamped circles."""
    ens = StackedEnsemble(evalnet_module, evalnets)
    score = _scorer(evalnet_module, two_head=True)

    out_dirs = {c: os.path.join(main_output_path, c)
                for c in ("brightfield", "alive", "dead", "mod_position")}
    for d in out_dirs.values():
        os.makedirs(d, exist_ok=True)

    if last_gen_main_path:
        for c in out_dirs:
            src = os.path.join(last_gen_main_path, c)
            if os.path.isdir(src):
                for n in list_pngs(src):
                    shutil.copy(os.path.join(src, n),
                                os.path.join(out_dirs[c], n))

    names = list_pngs(bf_images_path)
    groups: dict = {}
    for n in names:
        stacks = []
        for mp in mask_main_paths:
            chans = []
            ok = True
            for c in ("alive", "dead", "mod_position"):
                m = cv2.imread(os.path.join(mp, c, n), 0)
                if m is None:
                    ok = False
                    break
                chans.append((m > 127).astype(np.uint8))
            if ok:
                stacks.append(np.stack(chans, axis=-1))
        # last-gen accepted triple
        if all(os.path.isfile(os.path.join(out_dirs[c], n))
               for c in ("alive", "dead", "mod_position")):
            chans = [(cv2.imread(os.path.join(out_dirs[c], n), 0) > 127
                      ).astype(np.uint8)
                     for c in ("alive", "dead", "mod_position")]
            stacks.append(np.stack(chans, axis=-1))
        if not stacks:
            continue
        bf = cv2.imread(os.path.join(bf_images_path, n), 0)[..., None]
        groups.setdefault(len(stacks), []).append((n, bf, stacks))

    accepted = 0
    for k, items in groups.items():
        for start in range(0, len(items), batch_size):
            chunk = items[start:start + batch_size]
            b = len(chunk)
            # pad the final chunk so every batch compiles the same program
            # shape (each distinct shape is a multi-minute remote compile);
            # padded rows are scored and dropped
            chunk_p = chunk + [chunk[-1]] * (batch_size - b)
            imgs = np.stack([c[1] for c in chunk_p])
            masks = np.stack([np.stack(c[2]) for c in chunk_p])  # (B,K,H,W,3)
            flat_imgs = np.repeat(imgs, k, axis=0)
            flat_masks = masks.reshape(batch_size * k, *masks.shape[2:])
            iou_p, det_p = score(ens.stacked, jnp.asarray(flat_imgs),
                                 jnp.asarray(flat_masks))
            mean_iou = np.asarray(iou_p).reshape(batch_size, k, 3)
            mean_det = np.asarray(det_p).reshape(batch_size, k, 3)
            valid = mean_det >= 0.5
            nv = valid.sum(-1)
            miou = np.where(nv > 0,
                            (mean_iou * valid).sum(-1) / np.maximum(nv, 1),
                            0.0)
            best_idx = miou.argmax(axis=1)
            h, w = imgs.shape[1:3]
            for i, (n, bf, stacks) in enumerate(chunk):
                if miou[i, best_idx[i]] < threshold:
                    continue
                best = stacks[best_idx[i]]
                pos_temp = best[:, :, 2] * 255
                positions = get_pos_contours(pos_temp)
                pos_mask = np.zeros((h, w, 3), np.uint8)
                for p in positions:
                    md = (get_min_dist(p, positions)
                          if len(positions) > 1 else 99)
                    size = max(min(int(md // 4), max_pos_circle_size),
                               min_pos_circle_size)
                    cv2.circle(pos_mask, (p[0], p[1]), size,
                               (255, 255, 255), -1)
                shutil.copy(os.path.join(bf_images_path, n),
                            os.path.join(out_dirs["brightfield"], n))
                imwrite_async(os.path.join(out_dirs["alive"], n),
                            best[:, :, 0] * 255)
                imwrite_async(os.path.join(out_dirs["dead"], n),
                            best[:, :, 1] * 255)
                imwrite_async(os.path.join(out_dirs["mod_position"], n),
                            pos_mask)
                accepted += 1
    return accepted
