"""Fat-cell fused inverted-residual (ops/fused_cell.py): numerical parity
vs the flax block — BN folding, Element-window halo, cSE pool
accumulation across the grid, both skip variants. Shapes mirror the
dense-grid decoder's hot row-3 cells (wide concat inputs, PERF.md r3) at
test scale.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.models.blocks import InvertedResidual
from deadtrees_tpu.ops.fused_cell import fused_ir_fat
from deadtrees_tpu.ops.fused_mbconv import fold_inverted_residual
from tests.test_fused_mbconv import _randomized_variables


@pytest.mark.parametrize(
    "cin,cout,hw",
    [
        (48, 16, 16),   # conv-skip (fat concat in → slim out, like x_0_3)
        (32, 32, 16),   # identity skip (IR2)
        (40, 16, 8),    # non-tile-multiple channel count
    ],
)
def test_fused_fat_matches_flax(cin, cout, hw):
    module = InvertedResidual(
        features=cout, expansion_ratio=1, squeeze_ratio=1, dtype=jnp.float32
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, hw, hw, cin)).astype(np.float32)
    )
    variables = _randomized_variables(module, x)
    ref = module.apply(variables, x, train=False)

    fp = fold_inverted_residual(variables["params"], variables["batch_stats"])
    out = fused_ir_fat(x, fp, interpret=True)

    assert out.shape == ref.shape
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 1e-3, f"max err {err}"


def test_fused_fat_multi_tile_pooling():
    """H spans several grid tiles: the cSE pool accumulator must sum over
    every (image, tile) step, and halo rows must not leak act(b1)."""
    module = InvertedResidual(
        features=32, expansion_ratio=1, squeeze_ratio=1, dtype=jnp.float32
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(3, 96, 8, 32)).astype(np.float32)
    )
    variables = _randomized_variables(module, x)
    ref = module.apply(variables, x, train=False)
    fp = fold_inverted_residual(variables["params"], variables["batch_stats"])
    out = fused_ir_fat(x, fp, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 1e-3, f"max err {err}"
