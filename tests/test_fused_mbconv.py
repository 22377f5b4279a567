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


@pytest.mark.parametrize("ksize,act,skip", [(5, "silu", "none"), (3, "silu", "identity"), (5, "hswish", "conv")])
def test_fused_chw_generalized_modes(ksize, act, skip):
    """Encoder-MBConv generalizations: k=5, SiLU, skip modes — verified
    against a plain-jax functional reference."""
    from deadtrees_tpu.ops.fused_mbconv import (
        FoldedBlockParams,
        fused_inverted_residual_chw,
    )

    rng = np.random.default_rng(0)
    cin, cmid, cout, hw = 16, 16, 16 if skip != "conv" else 24, 16
    fp = FoldedBlockParams(
        w1=jnp.asarray(rng.normal(0, 0.2, (cin, cmid)), jnp.float32),
        b1=jnp.asarray(rng.normal(0, 0.1, (cmid,)), jnp.float32),
        dw=jnp.asarray(rng.normal(0, 0.2, (ksize, ksize, cmid)), jnp.float32),
        b_dw=jnp.asarray(rng.normal(0, 0.1, (cmid,)), jnp.float32),
        cse_w1=jnp.asarray(rng.normal(0, 0.2, (cmid, 4)), jnp.float32),
        cse_b1=jnp.asarray(rng.normal(0, 0.1, (4,)), jnp.float32),
        cse_w2=jnp.asarray(rng.normal(0, 0.2, (4, cmid)), jnp.float32),
        cse_b2=jnp.asarray(rng.normal(0, 0.1, (cmid,)), jnp.float32),
        sse_w=jnp.asarray(rng.normal(0, 0.2, (cmid, 1)), jnp.float32),
        sse_b=jnp.asarray(rng.normal(0, 0.1, (1,)), jnp.float32),
        w2=jnp.asarray(rng.normal(0, 0.2, (cmid, cout)), jnp.float32),
        b2=jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32),
        wsk=(jnp.asarray(rng.normal(0, 0.2, (cin, cout)), jnp.float32)
             if skip == "conv" else None),
        bsk=(jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
             if skip == "conv" else None),
    )
    x = jnp.asarray(rng.normal(size=(2, cin, hw, hw)), jnp.float32)

    # plain-jax reference (NCHW convs)
    actf = {"hswish": jax.nn.hard_swish, "silu": jax.nn.silu}[act]
    dn = ("NCHW", "HWIO", "NCHW")
    y = actf(jax.lax.conv_general_dilated(
        x, fp.w1.reshape(1, 1, cin, cmid), (1, 1), "SAME",
        dimension_numbers=dn) + fp.b1[None, :, None, None])
    h = actf(jax.lax.conv_general_dilated(
        y, fp.dw[:, :, None, :], (1, 1), "SAME", feature_group_count=cmid,
        dimension_numbers=dn) + fp.b_dw[None, :, None, None])
    pooled = jnp.mean(h, axis=(2, 3))
    gate = jax.nn.sigmoid(
        jnp.maximum(pooled @ fp.cse_w1 + fp.cse_b1, 0.0) @ fp.cse_w2 + fp.cse_b2
    )
    s = jax.nn.sigmoid(jnp.einsum("bchw,c->bhw", h, fp.sse_w[:, 0]) + fp.sse_b[0])
    scse = h * gate[:, :, None, None] + h * s[:, None, :, :]
    ref = jax.lax.conv_general_dilated(
        scse, fp.w2.reshape(1, 1, cmid, cout), (1, 1), "SAME",
        dimension_numbers=dn) + fp.b2[None, :, None, None]
    if skip == "conv":
        ref = ref + jax.lax.conv_general_dilated(
            x, fp.wsk.reshape(1, 1, cin, cout), (1, 1), "SAME",
            dimension_numbers=dn) + fp.bsk[None, :, None, None]
    elif skip == "identity":
        ref = ref + x

    out = fused_inverted_residual_chw(
        x, fp, interpret=True, activation=act, ksize=ksize, skip=skip
    )
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 1e-3, f"max err {err}"
