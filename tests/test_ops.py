"""Morphology / D4 / augmentation / losses / metrics vs cv2 and NumPy."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inconsistencymasks_tpu.ops import augment, d4, losses, metrics, morphology


# ----------------------------------------------------------------- morphology

@pytest.mark.parametrize("kernel", [3, 5, 7])
def test_erode_dilate_cv2_parity(rng, kernel):
    m = (rng.rand(2, 33, 47) > 0.7).astype(np.uint8) * 255
    ones = np.ones((kernel, kernel), "uint8")
    er = np.asarray(morphology.erode(jnp.asarray(m), kernel))
    di = np.asarray(morphology.dilate(jnp.asarray(m), kernel))
    for i in range(m.shape[0]):
        assert np.array_equal(er[i], cv2.erode(m[i], ones, iterations=1))
        assert np.array_equal(di[i], cv2.dilate(m[i], ones, iterations=1))


def test_dilate_multiclass_matches_reference_oracle(rng):
    """Oracle = reference functions.py:3075-3100 dilate_mask."""
    mask = rng.randint(0, 5, (20, 20)).astype(np.uint8)
    kernel = np.ones((3, 3), np.uint8)
    expect = np.zeros_like(mask)
    for u in np.unique(mask):
        if u == 0:
            continue
        binary = (mask == u).astype(np.uint8)
        dil = cv2.dilate(binary, kernel, iterations=1)
        expect[dil == 1] = u
    got = np.asarray(morphology.dilate_multiclass(jnp.asarray(mask[None]),
                                                  num_classes=5, kernel=3))[0]
    assert np.array_equal(got, expect)


# ------------------------------------------------------------------------- d4

def test_d4_roundtrip(rng):
    img = rng.randint(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    for i in range(d4.NUM_TRANSFORMS):
        t = d4.apply_transform(jnp.asarray(img), i)
        r = d4.invert_transform(t, i)
        assert np.array_equal(np.asarray(r), img), f"transform {i}"


def test_d4_cv2_parity(rng):
    img = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
    rot_map = {1: cv2.ROTATE_90_CLOCKWISE, 2: cv2.ROTATE_180,
               3: cv2.ROTATE_90_COUNTERCLOCKWISE}
    for i, (fh, fv, r) in enumerate(d4.TRANSFORMS):
        x = img.copy()
        if fh:
            x = cv2.flip(x, 0)
        if fv:
            x = cv2.flip(x, 1)
        if r:
            x = cv2.rotate(x, rot_map[r])
        got = np.asarray(d4.apply_transform(jnp.asarray(img[None]), i))[0]
        assert np.array_equal(got, x), f"transform {i}"


def test_d4_enumeration_matches_reference_order():
    # identity first, then fh-major, fv, rot in (1,2,3) (functions.py:1610-1628)
    assert d4.TRANSFORMS[0] == (0, 0, 0)
    assert d4.TRANSFORMS[1] == (0, 0, 1)
    assert d4.TRANSFORMS[6] == (0, 1, 3)
    assert d4.TRANSFORMS[12] == (1, 1, 3)
    assert d4.NUM_TRANSFORMS == 13


# -------------------------------------------------------------------- augment

def test_blur_cv2_parity_within_1lsb(rng):
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    f = jnp.asarray(img).astype(jnp.float32)
    for ks in (3, 5, 7):
        ours = np.asarray(augment._round_saturate_u8(
            augment._gauss_blur2d(f, ks)))
        ref = cv2.GaussianBlur(img, (ks, ks), 0)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_brightness_convertscaleabs_parity(rng):
    img = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    alpha, beta = 1.3, -20.0
    ref = cv2.convertScaleAbs(img, alpha=alpha, beta=beta)
    got = np.asarray(augment._convert_scale_abs_u8(
        jnp.asarray(img).astype(jnp.float32) * alpha + beta))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_augment_shapes_and_determinism(rng):
    imgs = jnp.asarray(rng.randint(0, 255, (4, 16, 16, 3)).astype(np.uint8))
    msk = jnp.asarray(rng.randint(0, 2, (4, 16, 16)).astype(np.uint8))
    p = augment.AugmentParams()
    key = jax.random.PRNGKey(7)
    a1, m1 = augment.augment_image_and_masks(key, imgs, [msk], p)
    a2, m2 = augment.augment_image_and_masks(key, imgs, [msk], p)
    assert a1.shape == imgs.shape and m1[0].shape == msk.shape
    assert np.array_equal(np.asarray(a1), np.asarray(a2))  # same key -> same


def test_augment_no_free_rotation_keeps_rows(rng):
    """FREE_ROTATION=False: only left-right flips allowed."""
    imgs = jnp.asarray(rng.randint(0, 255, (8, 4, 6, 3)).astype(np.uint8))
    p = augment.AugmentParams(free_rotation=False, max_blur=0, max_noise=0,
                              brightness_alpha=(1.0, 1.0),
                              brightness_beta=(0.0, 0.0))
    out, _ = augment.augment_image_and_masks(jax.random.PRNGKey(3), imgs, [], p)
    out = np.asarray(out)
    for i in range(imgs.shape[0]):
        orig = np.asarray(imgs[i])
        assert (np.array_equal(out[i], orig)
                or np.array_equal(out[i], orig[:, ::-1]))


# --------------------------------------------------------------------- losses

def test_mse_dice(rng):
    t = rng.rand(2, 8, 8, 1).astype(np.float32)
    p = rng.rand(2, 8, 8, 1).astype(np.float32)
    assert np.isclose(float(losses.mse(t, p)), np.mean((t - p) ** 2))
    inter = (t * p).sum((1, 2, 3))
    union = t.sum((1, 2, 3)) + p.sum((1, 2, 3))
    dice = 1 - np.mean((2 * inter + 1) / (union + 1))
    assert np.isclose(float(losses.dice_loss(t, p)), dice, atol=1e-6)


def test_cce_and_ignore_im(rng):
    t = np.eye(4, dtype=np.float32)[rng.randint(0, 4, (2, 8, 8))]
    p = rng.rand(2, 8, 8, 4).astype(np.float32) + 0.01
    p /= p.sum(-1, keepdims=True)
    expect = -np.mean(np.sum(t * np.log(p), -1))
    assert np.isclose(float(losses.categorical_crossentropy(t, p)), expect,
                      atol=1e-5)
    per_px = -np.sum(t * np.log(p), -1)
    masked = np.mean(per_px * (1 - t[..., 0]))
    assert np.isclose(
        float(losses.ignore_im_categorical_crossentropy(t, p)), masked,
        atol=1e-5)


# -------------------------------------------------------------------- metrics

def test_binary_iou_streaming_matches_global(rng):
    t = (rng.rand(4, 16, 16, 1) > 0.5).astype(np.float32)
    p = rng.rand(4, 16, 16, 1).astype(np.float32)
    st = metrics.BinaryIoUState.zero()
    for i in range(4):
        st = metrics.binary_iou_update(st, t[i:i + 1], p[i:i + 1])
    tb, pb = t > 0.5, p > 0.5
    expect = (tb & pb).sum() / (tb | pb).sum()
    assert np.isclose(float(metrics.binary_iou_result(st)), expect)


def test_iou_multi_unique_matches_reference_oracle(rng):
    """Oracle = reference functions.py:1791-1816."""
    gt = rng.randint(0, 5, (16, 16))
    pred = rng.randint(0, 6, (16, 16))  # pred may contain classes gt lacks

    unique = np.unique(gt)
    iou_list = []
    for i in unique:
        tg, tp = (gt == i), (pred == i)
        iou_list.append((tg & tp).sum() / ((tg | tp).sum() + 1e-7))
    expect = sum(iou_list) / len(unique)

    got = float(metrics.iou_multi_unique(jnp.asarray(pred), jnp.asarray(gt),
                                         num_classes=8))
    assert np.isclose(got, expect, atol=1e-5)


def test_iou_binary_and_dice_oracle(rng):
    gt = (rng.rand(16, 16) > 0.5).astype(np.uint8) * 255
    pred = (rng.rand(16, 16) > 0.5).astype(np.uint8) * 255
    inter = ((gt > 0) & (pred > 0)).sum()
    union = ((gt > 0) | (pred > 0)).sum()
    assert np.isclose(float(metrics.iou_binary(gt, pred)),
                      inter / (union + 1e-7))
    g = (gt >= 128).astype(np.float32)
    p = (pred >= 128).astype(np.float32)
    expect = (2 * (g * p).sum() + 1) / (g.sum() + p.sum() + 1)
    assert np.isclose(float(metrics.dice_binary(gt, pred)), expect)
