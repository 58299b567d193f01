"""Population (stacked) benchmarks must reproduce the per-candidate
benchmark results exactly — same metrics (reference rounding,
functions.py:1129-1147), same prediction PNG trees — while sharing one
forward pass across the cell's candidates (VERDICT r3 next-#6)."""

import os

import numpy as np
import pytest

from inconsistencymasks_tpu.data.loader import Dataset
from inconsistencymasks_tpu.evaluate import benchmark as bm
from inconsistencymasks_tpu.models.unet import UNet, create_unet
from inconsistencymasks_tpu.utils.io_pool import flush_writes


H = W = 32
K = 3
N = 5  # odd, < batch_size to exercise the short-batch path too


def _candidates(num_classes, out_act, seed0=0):
    module = UNet(num_classes=num_classes, alpha=0.25,
                  out_activation=out_act)
    cands = []
    for i in range(K):
        _, variables = create_unet(H, W, 3, num_classes, 0.25, "relu",
                                   out_act, seed=seed0 + i)
        cands.append(variables)
    return module, cands


def _dataset(rng, num_classes):
    images = rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8)
    if num_classes == 1:
        targets = (rng.random((N, H, W, 1)) > 0.5).astype(np.uint8)
    else:
        targets = rng.integers(0, num_classes, (N, H, W)).astype(np.int32)
    names = [f"img_{i}.png" for i in range(N)]
    return Dataset(images=images, targets=targets, names=names)


def _tree(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = open(p, "rb").read()
    return out


def test_binary_population_matches_percandidate(tmp_path):
    rng = np.random.default_rng(0)
    module, cands = _candidates(1, "sigmoid")
    ds = _dataset(rng, 1)

    ref = []
    for i, v in enumerate(cands):
        d = tmp_path / "ref" / str(i)
        ref.append(bm.benchmark_binary(module, v, ds, pred_dir=str(d),
                                       batch_size=4))
    pred_dirs = [str(tmp_path / "pop" / str(i)) for i in range(K)]
    pop = bm.benchmark_binary_population(module, cands, ds,
                                         pred_dirs=pred_dirs, batch_size=4)
    assert pop == ref
    flush_writes()
    assert _tree(tmp_path / "pop") == _tree(tmp_path / "ref")


def test_binary_population_partial_dump(tmp_path):
    rng = np.random.default_rng(1)
    module, cands = _candidates(1, "sigmoid")
    ds = _dataset(rng, 1)
    d1 = str(tmp_path / "only1")
    pop = bm.benchmark_binary_population(
        module, cands, ds, pred_dirs=[None, d1, None], batch_size=8)
    assert len(pop) == K
    flush_writes()
    assert sorted(os.listdir(d1)) == sorted(ds.names)
    assert not (tmp_path / "only0").exists()


def test_multiclass_population_matches_percandidate(tmp_path):
    rng = np.random.default_rng(2)
    module, cands = _candidates(5, "softmax")
    ds = _dataset(rng, 5)
    c2c = {i: (10 * i, 5 * i, i) for i in range(5)}

    ref = []
    for i, v in enumerate(cands):
        d = tmp_path / "ref" / str(i)
        ref.append(bm.benchmark_multiclass(
            module, v, ds, num_classes=5, class_to_color=c2c,
            pred_dir=str(d), batch_size=4))
    pred_dirs = [str(tmp_path / "pop" / str(i)) for i in range(K)]
    pop = bm.benchmark_multiclass_population(
        module, cands, ds, num_classes=5, class_to_color=c2c,
        pred_dirs=pred_dirs, batch_size=4)
    assert pop == ref
    flush_writes()
    assert _tree(tmp_path / "pop") == _tree(tmp_path / "ref")


def test_hela_population_matches_percandidate(tmp_path):
    rng = np.random.default_rng(3)
    module = UNet(num_classes=3, alpha=0.25, out_activation="sigmoid")
    cands = []
    for i in range(K):
        _, variables = create_unet(H, W, 1, 3, 0.25, "relu", "sigmoid",
                                   seed=10 + i)
        cands.append(variables)
    images = rng.integers(0, 256, (N, H, W, 1), dtype=np.uint8)
    targets = (rng.random((N, H, W, 3)) > 0.8).astype(np.uint8)
    ds = Dataset(images=images, targets=targets,
                 names=[f"img_{i}.png" for i in range(N)])

    ref = []
    for i, v in enumerate(cands):
        d = tmp_path / "ref" / str(i)
        ref.append(bm.benchmark_hela(module, v, ds, pred_dir=str(d),
                                     batch_size=4))
    pred_dirs = [str(tmp_path / "pop" / str(i)) for i in range(K)]
    pop = bm.benchmark_hela_population(module, cands, ds,
                                       pred_dirs=pred_dirs, batch_size=4)
    assert pop == ref
    flush_writes()
    assert _tree(tmp_path / "pop") == _tree(tmp_path / "ref")


def test_d2h_counter_counts_only_dumped():
    rng = np.random.default_rng(4)
    module, cands = _candidates(1, "sigmoid")
    ds = _dataset(rng, 1)
    before = bm.d2h_bytes()
    bm.benchmark_binary_population(module, cands, ds, batch_size=8)
    assert bm.d2h_bytes() == before  # no dumps -> no mask downloads
