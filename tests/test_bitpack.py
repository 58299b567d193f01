"""Device bit-packing round-trip (the slow-relay transfer format)."""

import numpy as np
import jax.numpy as jnp

from inconsistencymasks_tpu.ops import bitpack


def test_packbits_roundtrip(rng):
    m = (rng.rand(3, 64, 128) > 0.5)
    packed = np.asarray(bitpack.packbits2d(jnp.asarray(m)))
    assert packed.shape == (3, 64, 16) and packed.dtype == np.uint8
    # numpy reference: same MSB-first convention
    np.testing.assert_array_equal(packed, np.packbits(m, axis=-1))
    un = bitpack.unpackbits2d(packed, 128)
    np.testing.assert_array_equal(un, m.astype(np.uint8))


def test_packbits_255_and_multi_axis(rng):
    m = (rng.rand(2, 4, 32, 256) > 0.3).astype(np.uint8) * 255
    packed = np.asarray(bitpack.packbits2d(jnp.asarray(m)))
    un = bitpack.unpackbits2d(packed, 256)
    np.testing.assert_array_equal(un, (m > 0).astype(np.uint8))


def test_packbits_non_multiple_of_8_width(rng):
    # W % 8 != 0: packs zero-padded like np.packbits; width arg truncates
    m = (rng.rand(2, 16, 21) > 0.5)
    packed = np.asarray(bitpack.packbits2d(jnp.asarray(m)))
    assert packed.shape == (2, 16, 3)
    np.testing.assert_array_equal(packed, np.packbits(m, axis=-1))
    un = bitpack.unpackbits2d(packed, 21)
    np.testing.assert_array_equal(un, m.astype(np.uint8))


def test_device_eval_batches_cache_invalidates_on_replace(rng):
    from inconsistencymasks_tpu.data.loader import (Dataset,
                                                    device_eval_batches,
                                                    release_device_cache)
    imgs = (rng.rand(4, 8, 8, 1) * 255).astype(np.uint8)
    ds = Dataset(images=imgs, targets=None, names=[str(i) for i in range(4)])
    first = np.concatenate([np.asarray(b[0])
                            for b in device_eval_batches(ds, 2)])
    np.testing.assert_array_equal(first, imgs)
    # same length, different content: must NOT serve stale device data
    ds.images = imgs[::-1].copy()
    second = np.concatenate([np.asarray(b[0])
                             for b in device_eval_batches(ds, 2)])
    np.testing.assert_array_equal(second, ds.images)
    release_device_cache(ds)
    assert not hasattr(ds, "_device_images_cache")


def test_nibble_pack_roundtrip(rng):
    m = rng.randint(0, 9, (2, 16, 33)).astype(np.uint8)
    packed = np.asarray(bitpack.packnibbles2d(jnp.asarray(m)))
    assert packed.shape == (2, 16, 17) and packed.dtype == np.uint8
    un = bitpack.unpacknibbles2d(packed, 33)
    np.testing.assert_array_equal(un, m)
