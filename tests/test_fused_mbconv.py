"""Fused inverted-residual kernel: numerical parity vs the flax block.

The kernel (ops/fused_mbconv.py) must reproduce
``blocks.InvertedResidual(train=False)`` bit-for-bit up to f32 rounding —
BN folding, depthwise halo handling, SCSE gating, and both skip variants
(identity and 1×1-projected).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.models.blocks import InvertedResidual
from deadtrees_tpu.ops.fused_mbconv import (
    fold_inverted_residual,
    fused_inverted_residual,
)


def _randomized_variables(module, x):
    """init, then randomize BN stats so folding is actually exercised."""
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.default_rng(1)

    def jiggle(path, leaf):
        name = jax.tree_util.keystr(path)
        if "mean" in name:
            return jnp.asarray(rng.uniform(-0.3, 0.3, leaf.shape), leaf.dtype)
        if "var" in name:
            return jnp.asarray(rng.uniform(0.7, 1.3, leaf.shape), leaf.dtype)
        if "scale" in name:
            return jnp.asarray(rng.uniform(0.8, 1.2, leaf.shape), leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(jiggle, variables)


@pytest.mark.parametrize("cin,cout,hw", [(16, 16, 32), (24, 16, 16), (16, 32, 8)])
def test_fused_matches_flax(cin, cout, hw):
    module = InvertedResidual(
        features=cout, expansion_ratio=1, squeeze_ratio=1, dtype=jnp.float32
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, hw, hw, cin)).astype(np.float32)
    )
    variables = _randomized_variables(module, x)

    ref = module.apply(variables, x, train=False)
    fp = fold_inverted_residual(
        variables["params"], variables["batch_stats"]
    )
    out = fused_inverted_residual(x, fp, interpret=True)

    assert out.shape == ref.shape
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 1e-3, f"max err {err}"


def test_fused_ragged_tile_heights():
    """H not divisible by the preferred tile: falls back to smaller tiles."""
    module = InvertedResidual(
        features=16, expansion_ratio=1, squeeze_ratio=1, dtype=jnp.float32
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 24, 24, 16)).astype(np.float32)
    )
    variables = _randomized_variables(module, x)
    ref = module.apply(variables, x, train=False)
    fp = fold_inverted_residual(variables["params"], variables["batch_stats"])
    out = fused_inverted_residual(x, fp, interpret=True)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-3


@pytest.mark.parametrize("cin,cout,hw", [(16, 16, 32), (24, 16, 16), (16, 32, 8)])
def test_fused_chw_matches_flax(cin, cout, hw):
    from deadtrees_tpu.ops.fused_mbconv import fused_inverted_residual_chw

    module = InvertedResidual(
        features=cout, expansion_ratio=1, squeeze_ratio=1, dtype=jnp.float32
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, hw, hw, cin)).astype(np.float32)
    )
    variables = _randomized_variables(module, x)
    ref = module.apply(variables, x, train=False)

    fp = fold_inverted_residual(variables["params"], variables["batch_stats"])
    x_chw = jnp.transpose(x, (0, 3, 1, 2))
    out = fused_inverted_residual_chw(x_chw, fp, interpret=True)
    out_nhwc = jnp.transpose(out, (0, 2, 3, 1))

    err = np.abs(np.asarray(out_nhwc) - np.asarray(ref)).max()
    assert err < 1e-3, f"max err {err}"
