"""Pallas IM-postprocess kernel vs the XLA reference path (interpret mode
on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from inconsistencymasks_tpu.ops import im_core, morphology
from inconsistencymasks_tpu.ops.pallas import fused_im_postprocess_binary


@pytest.mark.parametrize("k,dilate", [(2, False), (3, True), (4, True)])
def test_pallas_matches_xla_path(rng, k, dilate):
    b, h, w, c = 2, 64, 128, 3
    probs = jnp.asarray(rng.rand(k, b, h, w, 1).astype(np.float32))
    images = jnp.asarray(rng.randint(0, 255, (b, h, w, c)).astype(np.uint8))

    img_p, mask_p, im_p, ims_p, ps_p = fused_im_postprocess_binary(
        probs, images, 0.5, dilate_3x3=dilate, interpret=True)

    masks = im_core.probs_to_binary_masks(probs, 0.5)
    out = im_core.binary_im(masks)
    im_ref = morphology.dilate(out.im, 3) if dilate else out.im
    img_ref, mask_ref = im_core.blockout_binary(images, out.pred_mask,
                                                im_ref, True, True)

    assert np.array_equal(np.asarray(img_p), np.asarray(img_ref))
    assert np.array_equal(np.asarray(mask_p),
                          np.asarray(mask_ref[..., 0]))
    assert np.array_equal(np.asarray(im_p), np.asarray(im_ref))
    assert np.array_equal(np.asarray(ims_p), np.asarray(out.im_size))
    assert np.array_equal(np.asarray(ps_p), np.asarray(out.pred_size))
