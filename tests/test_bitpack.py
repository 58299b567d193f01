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
