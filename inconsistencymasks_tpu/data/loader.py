"""Host-side image loading and batch streaming.

Replaces the reference's tf.data pipeline (reference functions.py:955-1073,
207-213): PNGs are decoded once into RAM-resident NHWC uint8 arrays (the
datasets are small: <=2.6k images at 256^2), then an infinite seeded-shuffle
stream feeds the device.  The mask path is derived from the image path by the
same string-replace contract (``images`` -> ``masks``,
reference functions.py:972; HeLa channel substitution,
reference functions.py:998-1011).

Parity notes:
- ISIC/binary masks are divided by 255 to {0,1} uint8 (functions.py:975).
- HeLa stacks alive/dead/mod_position as 3 channels with the position plane
  scaled by ``position_weight=3`` (functions.py:980-1018) — note the
  reference casts (pos/255)*3 to uint8, i.e. the pos channel holds value 3.
- multiclass masks stay integer class ids; one-hot happens on device in the
  train step (cheaper than shipping one-hot over PCIe).
- The train stream repeats forever with reshuffling each pass
  (tf.data ``.repeat()`` + ``list_files(seed)``, functions.py:208-209);
  ``steps_per_epoch = n // batch_size`` slices epochs out of it.
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from dataclasses import dataclass, field
from typing import Iterator, Optional, Sequence

import cv2
import numpy as np


def list_pngs(directory: str) -> list[str]:
    """Sorted PNG basenames of a directory."""
    return sorted(f for f in os.listdir(directory)
                  if f.lower().endswith(".png"))


def _imread(path: str, channels: int) -> np.ndarray:
    if channels == 1:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img[..., None]
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


@dataclass
class Dataset:
    """RAM-resident dataset: images (N,H,W,C) uint8 + targets + names."""
    images: np.ndarray
    targets: Optional[np.ndarray]
    names: list[str] = field(default_factory=list)

    def __len__(self) -> int:
        return self.images.shape[0]


def load_images(images_dir: str, channels: int = 3,
                names: Optional[Sequence[str]] = None) -> Dataset:
    """Images only (unlabeled sets)."""
    names = list(names) if names is not None else list_pngs(images_dir)
    imgs = np.stack([_imread(os.path.join(images_dir, n), channels)
                     for n in names])
    return Dataset(images=imgs, targets=None, names=names)


def load_image_mask_dataset(images_dir: str, channels: int = 3,
                            masks_dir: Optional[str] = None,
                            binary: bool = True,
                            names: Optional[Sequence[str]] = None) -> Dataset:
    """Image + mask pairs.  If ``masks_dir`` is None it is derived by the
    reference's ``images -> masks`` replacement (functions.py:972).

    binary=True divides the mask by 255 into {0,1} (functions.py:975);
    binary=False keeps integer class ids.
    """
    if masks_dir is None:
        masks_dir = images_dir.replace("images", "masks")
    names = list(names) if names is not None else list_pngs(images_dir)
    imgs, masks = [], []
    for n in names:
        imgs.append(_imread(os.path.join(images_dir, n), channels))
        m = cv2.imread(os.path.join(masks_dir, n), cv2.IMREAD_GRAYSCALE)
        if m is None:
            raise FileNotFoundError(os.path.join(masks_dir, n))
        masks.append(m)
    masks = np.stack(masks)
    if binary:
        masks = (masks // 255).astype(np.uint8)[..., None]   # (N,H,W,1)
    else:
        masks = masks.astype(np.int32)                        # (N,H,W)
    return Dataset(images=np.stack(imgs), targets=masks, names=names)


def load_hela_dataset(main_dir: str, position_weight: int = 3,
                      names: Optional[Sequence[str]] = None) -> Dataset:
    """Brightfield (N,H,W,1) + stacked (alive, dead, pos*weight) targets
    (reference functions.py:980-1018)."""
    bf_dir = os.path.join(main_dir, "brightfield")
    names = list(names) if names is not None else list_pngs(bf_dir)
    imgs, targets = [], []
    for n in names:
        imgs.append(_imread(os.path.join(bf_dir, n), 1))
        chans = []
        for chan, weight in (("alive", 1), ("dead", 1),
                             ("mod_position", position_weight)):
            m = cv2.imread(os.path.join(main_dir, chan, n),
                           cv2.IMREAD_GRAYSCALE)
            if m is None:
                raise FileNotFoundError(os.path.join(main_dir, chan, n))
            chans.append(((m // 255) * weight).astype(np.uint8))
        targets.append(np.stack(chans, axis=-1))
    return Dataset(images=np.stack(imgs), targets=np.stack(targets),
                   names=names)


def stream_batches(ds: Dataset, batch_size: int, seed: int,
                   prefetch: int = 2) -> Iterator[tuple]:
    """Infinite reshuffled (image, target) batch stream with a background
    prefetch thread (replaces tf.data's shuffle/repeat/prefetch chain)."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        rng = np.random.RandomState(seed)
        n = len(ds)
        buf: list = []
        while not stop.is_set():
            # tf.data `.repeat()` semantics: batches may span epoch
            # boundaries, so datasets smaller than the batch size still
            # yield full batches (with repeats across passes)
            while len(buf) < batch_size:
                buf.extend(rng.permutation(n).tolist())
            idx = np.asarray(buf[:batch_size])
            del buf[:batch_size]
            batch = (ds.images[idx],
                     None if ds.targets is None else ds.targets[idx])
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.5)
                    break
                except queue_mod.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()


def eval_batches(ds: Dataset, batch_size: int,
                 pad_final: bool = False) -> Iterator[tuple]:
    """One ordered pass, final partial batch included (Keras validation
    semantics).

    ``pad_final=True`` repeats the last row so every batch has the SAME
    shape — on this backend each distinct batch shape costs a separate
    multi-minute remote XLA compile, so fixed shapes matter.  Callers
    compute the valid count as ``min(batch_size, len(ds) - cursor)`` and
    ignore the padded tail (all per-image outputs are independent)."""
    n = len(ds)

    def _pad(a):
        if a is None or a.shape[0] == batch_size:
            return a
        reps = batch_size - a.shape[0]
        return np.concatenate([a, np.repeat(a[-1:], reps, axis=0)])

    for start in range(0, n, batch_size):
        idx = slice(start, min(start + batch_size, n))
        images = ds.images[idx]
        targets = None if ds.targets is None else ds.targets[idx]
        if pad_final:
            images, targets = _pad(images), _pad(targets)
        yield images, targets


def release_device_cache(ds: Dataset) -> None:
    """Drop the HBM copies device_eval_batches pinned on ``ds``."""
    for attr in ("_device_images_cache", "_device_images_key",
                 "_device_targets_cache", "_device_targets_key"):
        if hasattr(ds, attr):
            delattr(ds, attr)


def device_eval_batches(ds: Dataset, batch_size: int,
                        device_targets: bool = True,
                        pad_final: bool = False) -> Iterator[tuple]:
    """``eval_batches`` with the split cached in HBM.

    The benchmark harness re-walks the same val/test/unlabeled split for
    every candidate of a cell (10-15 candidates); uploading the split ONCE
    per Dataset object and slicing on device cuts host->device traffic by
    the population size — decisive on this environment's slow relay.
    ``device_targets=False`` yields HOST target slices (for benchmarks
    whose metric math runs on host, e.g. HeLa)."""
    import jax.numpy as jnp

    # cache keyed on the identity of the HOST array, not just its length:
    # replacing ds.images with same-length different content must not
    # serve stale device data.  The device copy pins the split in HBM for
    # the Dataset's lifetime by design (that is the point); call
    # release_device_cache(ds) to free it early.
    dev = getattr(ds, "_device_images_cache", None)
    if dev is None or getattr(ds, "_device_images_key", None) is not ds.images:
        dev = jnp.asarray(ds.images)
        ds._device_images_cache = dev
        ds._device_images_key = ds.images
    tgt = None
    if device_targets and ds.targets is not None:
        tgt = getattr(ds, "_device_targets_cache", None)
        if (tgt is None
                or getattr(ds, "_device_targets_key", None) is not ds.targets):
            tgt = jnp.asarray(ds.targets)
            ds._device_targets_cache = tgt
            ds._device_targets_key = ds.targets
    n = len(ds)
    for start in range(0, n, batch_size):
        skip = 0
        if (pad_final and start + batch_size > n and n >= batch_size):
            # OVERLAP the tail into the previous batch instead of padding:
            # dev[n-bs:n] reuses the full-batch compiled program (each
            # distinct batch shape costs a separate multi-minute remote
            # compile on this backend) with zero extra device ops; the
            # first ``skip`` rows repeat already-processed images and the
            # caller drops them.
            skip = start - (n - batch_size)
            start = n - batch_size
        idx = slice(start, min(start + batch_size, n))
        images = dev[idx]
        if device_targets:
            targets = None if tgt is None else tgt[idx]
        else:
            targets = None if ds.targets is None else ds.targets[idx]
        if pad_final:
            yield images, targets, skip
        else:
            yield images, targets
