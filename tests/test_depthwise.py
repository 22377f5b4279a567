"""Pallas depthwise-conv parity (interpret mode on CPU; real on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deadtrees_tpu.ops.depthwise import depthwise_conv2d


@pytest.mark.parametrize("shape,ks", [
    ((2, 32, 32, 16), 3),
    ((1, 64, 32, 8), 5),
    ((3, 16, 16, 24), 3),
])
def test_pallas_matches_xla(rng, shape, ks):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(ks, ks, 1, shape[-1])).astype(np.float32))
    ref = depthwise_conv2d(x, k, force="xla")
    got = depthwise_conv2d(x, k, force="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stride2_falls_back_to_xla(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 8)).astype(np.float32))
    out = depthwise_conv2d(x, k, strides=2, force="pallas", interpret=True)
    ref = depthwise_conv2d(x, k, strides=2, force="xla")
    assert out.shape == (2, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
