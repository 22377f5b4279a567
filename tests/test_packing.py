"""2-bit packed class-map wire format (infer/packing.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from deadtrees_tpu.infer.packing import pack2, unpack2


def test_pack_unpack_roundtrip(rng):
    for shape in [(2, 8, 12), (1, 5, 7), (3, 33), (4, 16, 16)]:
        m = rng.integers(0, 4, shape).astype(np.uint8)
        p = np.asarray(jax.jit(pack2)(jnp.asarray(m)))
        assert p.shape[-1] == -(-shape[-1] // 4)
        u = unpack2(p, shape[-1])
        np.testing.assert_array_equal(u, m)


def test_pack_is_4x_smaller(rng):
    m = rng.integers(0, 3, (2, 64, 64)).astype(np.uint8)
    p = np.asarray(pack2(jnp.asarray(m)))
    assert p.nbytes * 4 == m.nbytes
