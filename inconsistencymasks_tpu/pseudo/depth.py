"""Depth-map regression family (reference functions.py:320-364
``train_depth_map``, 713-828 consistency variant, 1051-1073 parser,
1345-1384 benchmark, 6155-6177 ``get_im_prediction_depth_map``).

The reference defines this family but no shipped script calls it; it is
implemented here for full capability parity.  Depth maps are single-channel
PNGs in [0, 255] scaled to [0, 1]; the IM analog thresholds the per-pixel
ensemble standard deviation at ``threshold_multiplier x mean(std)``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import Dataset, eval_batches, list_pngs
from .engine import StackedEnsemble
from ..utils.io_pool import flushes_writes, imwrite_async


def load_depth_dataset(images_dir: str, depth_dir: Optional[str] = None,
                       channels: int = 3) -> Dataset:
    """Images + depth maps; depth path derived by the reference's
    ``images -> depth_maps`` replacement (functions.py:1068), values
    scaled /255 to float32."""
    if depth_dir is None:
        depth_dir = images_dir.replace("images", "depth_maps")
    names = list_pngs(images_dir)
    imgs, depths = [], []
    for n in names:
        img = cv2.imread(os.path.join(images_dir, n))
        imgs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        d = cv2.imread(os.path.join(depth_dir, n), cv2.IMREAD_GRAYSCALE)
        depths.append((d.astype(np.float32) / 255.0)[..., None])
    return Dataset(images=np.stack(imgs), targets=np.stack(depths),
                   names=names)


@jax.jit
def depth_im(pred_maps: jnp.ndarray, threshold_multiplier: float = 2.0
             ) -> jnp.ndarray:
    """(K, B, H, W, 1) predictions -> (B, H, W) {0,1} inconsistency mask:
    per-pixel std-dev over models thresholded at multiplier x batch-mean std
    (reference functions.py:6155-6177)."""
    std = jnp.std(pred_maps, axis=0)[..., 0]       # (B, H, W)
    thr = threshold_multiplier * jnp.mean(std)
    return (std > thr).astype(jnp.int32)


@flushes_writes
def benchmark_depth(module, variables, ds: Dataset, *,
                    pred_dir: Optional[str] = None,
                    batch_size: int = 32) -> tuple:
    """Returns (rmse, mse); writes predictions scaled back to [0,255] PNGs
    (reference functions.py:1345-1384)."""
    @jax.jit
    def forward(v, x, d):
        preds = module.apply(v, x, train=False)
        se = jnp.sum(jnp.square(preds - d), axis=(1, 2, 3))  # per image
        out = jnp.clip(preds * 255.0, 0, 255).astype(jnp.uint8)
        return out, se

    if pred_dir:
        os.makedirs(pred_dir, exist_ok=True)
    se_sum, count = 0.0, 0
    cursor = 0
    # pad_final keeps every batch the same program shape (each distinct
    # shape is a separate multi-minute remote compile); per-image SEs are
    # summed host-side over the valid rows only
    for images, depths in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, len(ds) - cursor)
        out, se = forward(variables, jnp.asarray(images),
                          jnp.asarray(depths))
        se_sum += float(np.asarray(se)[:valid].sum())
        count += valid * int(np.prod(depths.shape[1:]))
        if pred_dir:
            out_np = np.asarray(out)
            for i in range(valid):
                imwrite_async(os.path.join(pred_dir,
                                         ds.names[cursor + i]),
                            out_np[i, ..., 0])
        cursor += valid
    mse = se_sum / count
    return float(np.sqrt(mse)), mse


@flushes_writes
def create_pseudo_labels_im_depth(module, models: Sequence,
                                  images_dir: str, main_output_path: str, *,
                                  channels: int = 3,
                                  threshold_multiplier: float = 2.0,
                                  batch_size: int = 32) -> None:
    """Depth pseudo-labels with std-dev IM blockout: mean ensemble depth,
    IM pixels zeroed in image and depth map."""
    from ..data.loader import load_images
    ens = StackedEnsemble(module, models)
    ds = load_images(images_dir, channels)
    for sub in ("images", "depth_maps", "im"):
        os.makedirs(os.path.join(main_output_path, sub), exist_ok=True)

    from ..ops.unroll import unrolled_map

    @jax.jit
    def fused(stacked, images):
        preds = unrolled_map(
            lambda v: module.apply(v, images, train=False), stacked)
        im = depth_im(preds, threshold_multiplier)
        mean_depth = jnp.mean(preds, axis=0)[..., 0]
        hole = im > 0
        img_b = jnp.where(hole[..., None], jnp.uint8(0), images)
        depth_u8 = jnp.clip(mean_depth * 255.0, 0, 255).astype(jnp.uint8)
        depth_b = jnp.where(hole, jnp.uint8(0), depth_u8)
        return img_b, depth_b, (im * 255).astype(jnp.uint8)

    cursor = 0
    for images, _ in eval_batches(ds, batch_size, pad_final=True):
        valid = min(batch_size, len(ds) - cursor)
        img_b, depth_b, im = fused(ens.stacked, jnp.asarray(images))
        img_b, depth_b, im = map(np.asarray, (img_b, depth_b, im))
        for i in range(valid):
            name = ds.names[cursor + i]
            imwrite_async(os.path.join(main_output_path, "images", name),
                        cv2.cvtColor(img_b[i], cv2.COLOR_RGB2BGR)
                        if channels == 3 else img_b[i])
            imwrite_async(os.path.join(main_output_path, "depth_maps", name),
                        depth_b[i])
            imwrite_async(os.path.join(main_output_path, "im", name), im[i])
        cursor += valid
