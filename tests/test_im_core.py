"""IM math vs NumPy oracles lifted from reference functions.py:3104-3137."""

import numpy as np
import jax.numpy as jnp

from inconsistencymasks_tpu.ops import im_core


def _oracle_binary(pred_masks):
    """NumPy oracle: reference pred_masks_to_im_binary semantics."""
    s = pred_masks.sum(axis=0)
    k = pred_masks.shape[0]
    pred = (s == k).astype(np.uint8) * 255
    im = ((s != 0) & (s != k))
    return pred, im


def test_binary_im_matches_oracle(rng):
    for k in (2, 3, 4):
        masks = rng.randint(0, 2, (k, 4, 32, 32, 1)).astype(np.uint8)
        out = im_core.binary_im(jnp.asarray(masks))
        pred, im = _oracle_binary(masks)
        assert np.array_equal(np.asarray(out.pred_mask), pred)
        assert np.array_equal(np.asarray(out.im),
                              im.max(-1).astype(np.uint8) * 255)
        assert np.array_equal(np.asarray(out.im_size), im.sum((1, 2, 3)))
        assert np.array_equal(np.asarray(out.pred_size),
                              (masks.sum(0) == k).sum((1, 2, 3)))


def test_binary_im_hela_multichannel(rng):
    """C=3 (HeLa): im is the channel-max, im_size the channel-sum
    (reference functions.py:3199-3200)."""
    masks = rng.randint(0, 2, (2, 3, 16, 16, 3)).astype(np.uint8)
    out = im_core.binary_im(jnp.asarray(masks))
    _, im = _oracle_binary(masks)
    assert np.array_equal(np.asarray(out.im), im.max(-1).astype(np.uint8) * 255)
    assert np.array_equal(np.asarray(out.im_size), im.sum((1, 2, 3)))


def test_multiclass_im_matches_oracle(rng):
    for k in (2, 3, 4):
        cm = rng.randint(0, 9, (k, 4, 32, 32))
        out = im_core.multiclass_im(jnp.asarray(cm))
        agree = np.all(cm == cm[0], axis=0)
        pred = np.where(agree, cm[0], 0).astype(np.uint8)
        im = (~agree)
        assert np.array_equal(np.asarray(out.pred_mask), pred)
        assert np.array_equal(np.asarray(out.im), im.astype(np.uint8) * 255)
        assert np.array_equal(np.asarray(out.im_size), im.sum((1, 2)))


def test_blockout():
    img = np.full((1, 4, 4, 3), 200, np.uint8)
    mask = np.full((1, 4, 4, 1), 255, np.uint8)
    im = np.zeros((1, 4, 4), np.uint8)
    im[0, 1, 2] = 255
    bi, bm = im_core.blockout_binary(jnp.asarray(img), jnp.asarray(mask),
                                     jnp.asarray(im), True, True)
    bi, bm = np.asarray(bi), np.asarray(bm)
    assert (bi[0, 1, 2] == 0).all() and bi[0, 0, 0, 0] == 200
    assert bm[0, 1, 2, 0] == 0 and bm[0, 0, 0, 0] == 255


def test_threshold_strictness():
    """The IM path uses strict > (reference functions.py:3157)."""
    probs = jnp.asarray(np.array([[[[0.5], [0.51]]]], np.float32))
    probs = probs[None]  # (K=1, B=1, 1, 2, 1)
    m = np.asarray(im_core.probs_to_binary_masks(probs, 0.5))
    assert m[0, 0, 0, 0, 0] == 0 and m[0, 0, 0, 1, 0] == 1
