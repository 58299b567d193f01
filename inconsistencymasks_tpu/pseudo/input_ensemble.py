"""Input-ensemble (test-time-augmentation) pseudo-labelers.

Reference semantics:
- binary/ISIC (functions.py:1992-2176): n random D4 transforms + photometric
  aug per image (or all 13), predict each view, invert the geometric
  transform, unanimous vote (sum == n_views -> 255); writer erodes the vote
  5x5 and skips empty results (functions.py:2029-2036).
- multiclass soft (functions.py:2365-2403): n+1 CUMULATIVELY augmented
  photometric views (the reference re-augments the same image in a loop, so
  noise compounds — reproduced), mean softmax -> argmax.
- HeLa soft/hard (functions.py:2221-2360): same cumulative views; soft
  averages probabilities, hard requires unanimity; position circles redrawn
  from contours.

TPU design: per-image random transform indices are drawn on host (cheap),
but ALL geometric transforms, photometric augs, the n-view inference and the
vote run as fused device programs.  Per-image view selection uses a gather
from the full 13-view stack so shapes stay static under jit.
"""

from __future__ import annotations

import os
from functools import partial

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import eval_batches, load_images
from ..ops import augment, bitpack, d4
from ..postproc.hela import get_min_dist, get_pos_contours
from ..utils.io_pool import flushes_writes, imwrite_async

_JIT_CACHE: dict = {}


def _forward(module):
    fn = _JIT_CACHE.get(module)
    if fn is None:
        fn = jax.jit(lambda v, x: module.apply(v, x, train=False))
        _JIT_CACHE[module] = fn
    return fn


@partial(jax.jit, static_argnames=("n_views", "max_blur", "max_noise",
                                   "alpha_range", "beta_range"))
def _tta_views_binary(images, view_idx, rng, n_views, max_blur, max_noise,
                      alpha_range, beta_range):
    """images (B,H,W,C); view_idx (n_views, B) int32 -> augmented views
    (n_views, B, H, W, C) uint8 (geometric + photometric)."""
    all_views = d4.generate_all_transformations(images)   # (13,B,H,W,C)
    b = images.shape[0]
    gathered = all_views[view_idx, jnp.arange(b)[None, :]]  # (n,B,H,W,C)
    p = augment.AugmentParams(max_blur=max_blur, max_noise=max_noise,
                              brightness_alpha=alpha_range,
                              brightness_beta=beta_range)
    keys = jax.random.split(rng, n_views)
    return jax.vmap(lambda k, v: augment.photometric(k, v, p,
                                                     brightness_first=False)
                    )(keys, gathered)


@jax.jit
def _tta_invert_vote_binary(masks_u8, view_idx, threshold_count):
    """masks_u8 (n,B,H,W) {0,1} predicted on transformed views -> restore
    each view's geometry and unanimously vote."""
    n, b = masks_u8.shape[0], masks_u8.shape[1]
    # all 13 inverses of each view, then gather the right one per (view, b)
    inv = jnp.stack([d4.invert_transform(masks_u8.reshape(n * b,
                                                          *masks_u8.shape[2:]),
                                         i)
                     for i in range(d4.NUM_TRANSFORMS)])      # (13,n*B,H,W)
    inv = inv.reshape(d4.NUM_TRANSFORMS, n, b, *masks_u8.shape[2:])
    restored = inv[view_idx, jnp.arange(n)[:, None],
                   jnp.arange(b)[None, :]]                    # (n,B,H,W)
    votes = restored.astype(jnp.int32).sum(axis=0)
    return ((votes >= threshold_count) * 255).astype(jnp.uint8)


_pack_vote = jax.jit(bitpack.packbits2d)


@partial(jax.jit, static_argnames=("soft", "n_views"))
def _hela_vote_pack(probs, threshold, soft, n_views):
    """(n,B,H,W,3) view probs -> bit-packed (B,3,H,W//8) voted masks."""
    if soft:
        m = (jnp.mean(probs, axis=0) > threshold)
    else:
        votes = (probs > threshold).astype(jnp.int32).sum(axis=0)
        m = votes >= n_views
    return bitpack.packbits2d(jnp.moveaxis(m, -1, 1))


@flushes_writes
def create_pseudo_labels_input_ensemble_binary(
        module, variables, images_dir: str, main_output_path: str, *,
        channels: int = 3, n: int = 2, use_n_rnd_transformations: bool = True,
        threshold: float = 0.5, max_blur: int = 3, max_noise: int = 25,
        brightness_range_alpha=(0.5, 1.5), brightness_range_beta=(-25, 25),
        batch_size: int = 64, seed: int = 0) -> None:
    """ISIC input ensemble (reference functions.py:1992-2036)."""
    forward = _forward(module)
    ds = load_images(images_dir, channels)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)

    host_rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        b = images.shape[0]
        valid = min(batch_size, n_total - cursor)
        if use_n_rnd_transformations:
            # reference samples from the 12 non-identity transforms
            # (generate_random_transformations enumerates rot in 1..3 only,
            # functions.py:1698-1716) with replacement, n per image
            view_idx = host_rng.randint(1, d4.NUM_TRANSFORMS, size=(n, b))
            n_views = n
            aug_args = (max_blur, max_noise)
        else:
            view_idx = np.repeat(np.arange(d4.NUM_TRANSFORMS)[:, None], b,
                                 axis=1)
            n_views = d4.NUM_TRANSFORMS
            aug_args = (0, 0)  # all-transform mode has no photometric aug
        key, sub_key = jax.random.split(key)
        views = _tta_views_binary(
            jnp.asarray(images), jnp.asarray(view_idx), sub_key, n_views,
            aug_args[0], aug_args[1], tuple(brightness_range_alpha),
            tuple(brightness_range_beta))
        flat = views.reshape(n_views * b, *views.shape[2:])
        probs = forward(variables, flat)                    # (n*B,H,W,1)
        masks = (probs[..., 0] >= threshold).astype(jnp.uint8)
        masks = masks.reshape(n_views, b, *masks.shape[1:])
        # bit-packed across the slow device->host link (8 px/byte)
        vote = bitpack.unpackbits2d(np.asarray(_pack_vote(
            _tta_invert_vote_binary(masks, jnp.asarray(view_idx),
                                    n_views))),
            images.shape[2]) * np.uint8(255)
        for i in range(valid):
            name = ds.names[cursor + i]
            eroded = cv2.erode(vote[i], np.ones((5, 5), "uint8"),
                               iterations=1)
            if np.sum(eroded) > 0:
                bgr = (cv2.cvtColor(images[i], cv2.COLOR_RGB2BGR)
                       if channels == 3 else images[i])
                imwrite_async(os.path.join(main_output_path, "images", name),
                            bgr)
                imwrite_async(os.path.join(main_output_path, "masks", name),
                            vote[i])
        cursor += valid


@partial(jax.jit, static_argnames=("n_views", "max_blur", "max_noise",
                                   "alpha_range", "beta_range"))
def _cumulative_photometric_views(images, rng, n_views, max_blur, max_noise,
                                  alpha_range, beta_range):
    """The reference's cumulative augmentation: view i = aug applied (i+1)
    times to the same image (functions.py:2385-2388)."""
    p = augment.AugmentParams(max_blur=max_blur, max_noise=max_noise,
                              brightness_alpha=alpha_range,
                              brightness_beta=beta_range)
    keys = jax.random.split(rng, n_views)

    def step(carry, k):
        nxt = augment.photometric(k, carry, p, brightness_first=False)
        return nxt, nxt

    _, views = jax.lax.scan(step, images, keys)
    return views  # (n_views, B, H, W, C)


@flushes_writes
def create_pseudo_labels_input_ensemble_multiclass(
        module, variables, images_dir: str, main_output_path: str, *,
        channels: int = 3, n: int = 2, max_blur: int = 1, max_noise: int = 15,
        brightness_range_alpha=(0.7, 1.3), brightness_range_beta=(-15, 15),
        batch_size: int = 64, seed: int = 0) -> None:
    """Soft-voted multiclass TTA (reference functions.py:2365-2403)."""
    forward = _forward(module)
    ds = load_images(images_dir, channels)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    key = jax.random.PRNGKey(seed)
    n_views = n + 1
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        b = images.shape[0]
        valid = min(batch_size, n_total - cursor)
        key, sub_key = jax.random.split(key)
        views = _cumulative_photometric_views(
            jnp.asarray(images), sub_key, n_views, max_blur, max_noise,
            tuple(brightness_range_alpha), tuple(brightness_range_beta))
        flat = views.reshape(n_views * b, *views.shape[2:])
        probs = forward(variables, flat)
        probs = probs.reshape(n_views, b, *probs.shape[1:])
        pred = np.asarray(jnp.argmax(jnp.mean(probs, axis=0),
                                     axis=-1).astype(jnp.uint8))
        for i in range(valid):
            name = ds.names[cursor + i]
            bgr = (cv2.cvtColor(images[i], cv2.COLOR_RGB2BGR)
                   if channels == 3 else images[i])
            imwrite_async(os.path.join(main_output_path, "images", name), bgr)
            imwrite_async(os.path.join(main_output_path, "masks", name),
                        pred[i])
        cursor += valid


@flushes_writes
def create_pseudo_labels_input_ensemble_hela(
        module, variables, bf_images_dir: str, main_output_path: str, *,
        n: int = 2, use_soft_voting: bool = False, threshold: float = 0.5,
        max_blur: int = 1, max_noise: int = 15,
        brightness_range_alpha=(0.7, 1.3), brightness_range_beta=(-15, 15),
        max_pos_circle_size: int = 8, min_pos_circle_size: int = 3,
        batch_size: int = 64, seed: int = 0) -> None:
    """HeLa TTA, soft or hard voting (reference functions.py:2221-2360)."""
    forward = _forward(module)
    ds = load_images(bf_images_dir, 1)
    for sub in ("brightfield", "alive", "dead", "mod_position"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)
    key = jax.random.PRNGKey(seed)
    n_views = n + 1
    cursor = 0
    n_total = len(ds)
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        b = images.shape[0]
        valid = min(batch_size, n_total - cursor)
        key, sub_key = jax.random.split(key)
        views = _cumulative_photometric_views(
            jnp.asarray(images), sub_key, n_views, max_blur, max_noise,
            tuple(brightness_range_alpha), tuple(brightness_range_beta))
        flat = views.reshape(n_views * b, *views.shape[2:])
        probs = forward(variables, flat).reshape(n_views, b, *images.shape[1:3], 3)
        packed = _hela_vote_pack(probs, threshold, use_soft_voting,
                                 n_views)
        masks = np.moveaxis(bitpack.unpackbits2d(
            np.asarray(packed), images.shape[2]), 1, -1) * np.uint8(255)
        h, w = masks.shape[1:3]
        for i in range(valid):
            name = ds.names[cursor + i]
            positions = get_pos_contours(masks[i, :, :, 2])
            pos_mask = np.zeros((h, w, 3), np.uint8)
            for p in positions:
                md = get_min_dist(p, positions) if len(positions) > 1 else 99
                size = max(min(int(md // 4), max_pos_circle_size),
                           min_pos_circle_size)
                cv2.circle(pos_mask, (p[0], p[1]), size,
                           (255, 255, 255), -1)
            imwrite_async(os.path.join(main_output_path, "brightfield", name),
                        images[i, ..., 0])
            imwrite_async(os.path.join(main_output_path, "alive", name),
                        masks[i, :, :, 0])
            imwrite_async(os.path.join(main_output_path, "dead", name),
                        masks[i, :, :, 1])
            imwrite_async(os.path.join(main_output_path, "mod_position", name),
                        pos_mask)
        cursor += valid
