"""Fused EfficientUnet++ decoder: the whole dense grid on Pallas kernels.

Inference-only fast path: every decoder InvertedResidual runs as the fused
CHW kernel (ops/fused_mbconv.py — measured 4.0× over the XLA block at the
hottest 512²/C16 shape on v5e), the dense-grid wiring
(models/decoders.py:_DenseGridDecoder ≙ reference
efficientunetplusplus/decoder.py:156-184) is reproduced functionally in
CHW (W in lanes — no lane-padding waste), and only the tiny segmentation
head runs in XLA. BatchNorms are folded into conv weights on host at load
time.

Usage:
    folded = fold_effunetpp_decoder(variables)       # once, on host
    logits = fused_forward(model, variables, folded, img)   # jittable
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from deadtrees_tpu.ops.fused_mbconv import (
    FoldedBlockParams,
    fold_inverted_residual,
    fused_inverted_residual_chw,
)


def fold_effunetpp_decoder(
    variables: Dict,
) -> Dict[str, Tuple[FoldedBlockParams, FoldedBlockParams]]:
    """Fold every decoder grid cell's two InvertedResiduals."""
    dparams = variables["params"]["decoder"]
    dstats = variables["batch_stats"]["decoder"]
    # tree: _DenseGridDecoder_0 / x_{d}_{l} / InvertedResidual_{0,1}
    grid_p = dparams[next(iter(dparams))]
    grid_s = dstats[next(iter(dstats))]
    folded = {}
    for cell, cp in grid_p.items():
        cs = grid_s[cell]
        folded[cell] = (
            fold_inverted_residual(
                cp["InvertedResidual_0"], cs["InvertedResidual_0"]
            ),
            fold_inverted_residual(
                cp["InvertedResidual_1"], cs["InvertedResidual_1"]
            ),
        )
    return folded


def _up2x_chw(x: jnp.ndarray) -> jnp.ndarray:
    b, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (b, c, h, 2, w, 2))
    return x.reshape(b, c, 2 * h, 2 * w)


def folded_block_xla(x: jnp.ndarray, fp: FoldedBlockParams) -> jnp.ndarray:
    """XLA fallback for one BN-folded InvertedResidual on CHW tensors —
    used for the deep/small decoder cells where the Pallas kernel can't
    lower (Mosaic requires f32 and W >= 128 lanes on this attachment)."""
    dn = ("NCHW", "HWIO", "NCHW")
    cin = x.shape[1]
    cmid = fp.w1.shape[1]
    fp = jax.tree_util.tree_map(lambda a: a.astype(x.dtype), fp)

    y = jax.lax.conv_general_dilated(
        x, fp.w1.reshape(1, 1, cin, cmid), (1, 1), "SAME",
        dimension_numbers=dn,
    ) + fp.b1[None, :, None, None]
    y = jax.nn.hard_swish(y)
    h = jax.lax.conv_general_dilated(
        y, fp.dw[:, :, None, :], (1, 1), "SAME",
        feature_group_count=cmid, dimension_numbers=dn,
    ) + fp.b_dw[None, :, None, None]
    h = jax.nn.hard_swish(h)

    pooled = jnp.mean(h, axis=(2, 3))  # (B, Cm)
    z = jnp.maximum(pooled @ fp.cse_w1 + fp.cse_b1, 0.0)
    gate = jax.nn.sigmoid(z @ fp.cse_w2 + fp.cse_b2)
    s = jax.nn.sigmoid(
        jnp.einsum("bchw,c->bhw", h, fp.sse_w[:, 0]) + fp.sse_b[0]
    )
    scse = h * gate[:, :, None, None] + h * s[:, None, :, :]

    out = jax.lax.conv_general_dilated(
        scse, fp.w2.reshape(1, 1, cmid, -1), (1, 1), "SAME",
        dimension_numbers=dn,
    ) + fp.b2[None, :, None, None]
    if fp.wsk is not None:
        out = out + jax.lax.conv_general_dilated(
            x, fp.wsk.reshape(1, 1, cin, -1), (1, 1), "SAME",
            dimension_numbers=dn,
        ) + fp.bsk[None, :, None, None]
    else:
        out = out + x
    return out


def _one_block(x, fp, interpret):
    # Mosaic constraints on this attachment: f32 inputs, W >= 128 lanes,
    # a VMEM-feasible tile. Fall back to XLA elsewhere — the small deep
    # cells are cheap anyway.
    from deadtrees_tpu.ops.fused_mbconv import pick_tile_chw

    w = x.shape[3]
    pad = 16 if x.dtype == jnp.bfloat16 else 8
    ok = (
        x.dtype in (jnp.float32, jnp.bfloat16)
        and (w >= 128 or interpret)
        and pick_tile_chw(x.shape[2], w, x.shape[1], fp.w1.shape[1], pad)
        is not None
    )
    if ok:
        return fused_inverted_residual_chw(x, fp, interpret=interpret)
    return folded_block_xla(x, fp)


def _cell(folded, name, x, skip, interpret):
    """One decoder grid cell: up2x → concat skip → fused block ×2 (CHW)."""
    x = _up2x_chw(x)
    if skip is not None:
        x = jnp.concatenate([x, skip], axis=1)
    fp0, fp1 = folded[name]
    x = _one_block(x, fp0, interpret)
    return _one_block(x, fp1, interpret)


def fused_decoder_chw(
    features_nhwc: Sequence[jnp.ndarray],
    folded: Dict[str, Tuple[FoldedBlockParams, FoldedBlockParams]],
    decoder_channels: Sequence[int],
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense-grid decoder forward on the smp feature pyramid; returns the
    full-resolution decoded map in NHWC (for the XLA head)."""
    feats = [jnp.transpose(f, (0, 3, 1, 2)) for f in features_nhwc[1:]][::-1]
    depth = len(decoder_channels) - 1

    dense: Dict[Tuple[int, int], jnp.ndarray] = {}
    for layer in range(depth):
        for d in range(depth - layer):
            li = d + layer
            if layer == 0:
                dense[(d, d)] = _cell(
                    folded, f"x_{d}_{d}", feats[d], feats[d + 1], interpret
                )
            else:
                cat = [dense[(idx, li)] for idx in range(d + 1, li + 1)]
                cat = jnp.concatenate(cat + [feats[li + 1]], axis=1)
                dense[(d, li)] = _cell(
                    folded, f"x_{d}_{li}", dense[(d, li - 1)], cat, interpret
                )
    out = _cell(folded, f"x_0_{depth}", dense[(0, depth - 1)], None, interpret)
    return jnp.transpose(out, (0, 2, 3, 1))


def folded_block_xla_nhwc(x: jnp.ndarray, fp: FoldedBlockParams) -> jnp.ndarray:
    """XLA fallback for one BN-folded InvertedResidual on NHWC tensors —
    for thin/deep cells where the fat-cell kernel doesn't pay.

    KEEP IN SYNC with act_quant.folded_block_int8 / folded_block_calibrate:
    they restate this math with quant/record hooks (drift guard:
    tests/test_act_quant.py::test_no_sites_block_matches_plain_nhwc_block).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    cin = x.shape[-1]
    cmid = fp.w1.shape[1]
    fp = jax.tree_util.tree_map(lambda a: a.astype(x.dtype), fp)

    y = jax.lax.conv_general_dilated(
        x, fp.w1.reshape(1, 1, cin, cmid), (1, 1), "SAME",
        dimension_numbers=dn,
    ) + fp.b1
    y = jax.nn.hard_swish(y)
    h = jax.lax.conv_general_dilated(
        y, fp.dw.reshape(*fp.dw.shape[:2], 1, cmid), (1, 1), "SAME",
        feature_group_count=cmid, dimension_numbers=dn,
    ) + fp.b_dw
    h = jax.nn.hard_swish(h)

    pooled = jnp.mean(h, axis=(1, 2))  # (B, Cm)
    z = jnp.maximum(pooled @ fp.cse_w1 + fp.cse_b1, 0.0)
    gate = jax.nn.sigmoid(z @ fp.cse_w2 + fp.cse_b2)
    s = jax.nn.sigmoid(h @ fp.sse_w + fp.sse_b)  # (B, H, W, 1)
    scse = h * gate[:, None, None, :] + h * s

    out = jax.lax.conv_general_dilated(
        scse, fp.w2.reshape(1, 1, cmid, -1), (1, 1), "SAME",
        dimension_numbers=dn,
    ) + fp.b2
    if fp.wsk is not None:
        out = out + jax.lax.conv_general_dilated(
            x, fp.wsk.reshape(1, 1, cin, -1), (1, 1), "SAME",
            dimension_numbers=dn,
        ) + fp.bsk
    else:
        out = out + x
    return out


def _one_block_nhwc(x, fp, interpret):
    """Fat cells (C ≥ 64, lanes-dense) run the fused NHWC kernel; thin
    cells stay in XLA (their lane padding makes Pallas tiles wasteful and
    they are cheap anyway — PERF.md r3)."""
    from deadtrees_tpu.ops.fused_cell import _pick_th, fused_ir_fat

    cin = x.shape[-1]
    cmid = fp.w1.shape[1]
    ok = (
        x.dtype in (jnp.float32, jnp.bfloat16)
        and cin >= 64
        and (x.shape[2] >= 128 or interpret)
        and _pick_th(x.shape[1], x.shape[2], cin, cmid, 1) is not None
    )
    if ok:
        return fused_ir_fat(x, fp, interpret=interpret)
    return folded_block_xla_nhwc(x, fp)


def _cell_nhwc(folded, name, x, skip, block_fn):
    from deadtrees_tpu.models.blocks import upsample2x_nearest

    x = upsample2x_nearest(x)
    if skip is not None:
        x = jnp.concatenate([x, skip], axis=-1)
    fp0, fp1 = folded[name]
    x = block_fn(x, fp0, f"{name}.0")
    return block_fn(x, fp1, f"{name}.1")


def fused_decoder_nhwc(
    features_nhwc: Sequence[jnp.ndarray],
    folded: Dict[str, Tuple[FoldedBlockParams, FoldedBlockParams]],
    decoder_channels: Sequence[int],
    *,
    interpret: bool = False,
    block_fn=None,
) -> jnp.ndarray:
    """Dense-grid decoder on BN-folded blocks, NHWC end to end (no layout
    transposes — encoder features and the segmentation head are NHWC).

    ``block_fn(x, fp, site) -> y`` runs one InvertedResidual; the default
    routes fat cells (C ≥ 64) through the two-pass Pallas kernel and thin
    cells through XLA. Alternative runners implement the int8-activation
    path and its calibration pass (infer/act_quant.py).
    """
    if block_fn is None:
        block_fn = lambda x, fp, site: _one_block_nhwc(x, fp, interpret)  # noqa: E731
    feats = list(features_nhwc[1:])[::-1]
    depth = len(decoder_channels) - 1

    dense: Dict[Tuple[int, int], jnp.ndarray] = {}
    for layer in range(depth):
        for d in range(depth - layer):
            li = d + layer
            if layer == 0:
                dense[(d, d)] = _cell_nhwc(
                    folded, f"x_{d}_{d}", feats[d], feats[d + 1], block_fn
                )
            else:
                cat = [dense[(idx, li)] for idx in range(d + 1, li + 1)]
                cat = jnp.concatenate(cat + [feats[li + 1]], axis=-1)
                dense[(d, li)] = _cell_nhwc(
                    folded, f"x_{d}_{li}", dense[(d, li - 1)], cat, block_fn
                )
    return _cell_nhwc(folded, f"x_0_{depth}", dense[(0, depth - 1)], None,
                      block_fn)


def encode_features(model, variables: Dict, img: jnp.ndarray):
    """Flax encoder forward → smp-style NHWC feature pyramid (jittable)."""
    from deadtrees_tpu.models.encoders import get_encoder

    encoder, _ = get_encoder(
        model.encoder_name,
        in_channels=model.in_channels,
        dtype=model.dtype,
        param_dtype=model.param_dtype,
        module_name="encoder",
    )
    return encoder.apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        img.astype(model.dtype),
        train=False,
    )


def apply_head(variables: Dict, decoded: jnp.ndarray) -> jnp.ndarray:
    """Segmentation head (3×3 conv, f32 logits) on the decoded map."""
    hp = variables["params"]["segmentation_head"]["Conv_0"]
    return jax.lax.conv_general_dilated(
        decoded.astype(jnp.float32),
        jnp.asarray(hp["kernel"], jnp.float32),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(hp["bias"], jnp.float32)


def fused_forward(
    model,
    variables: Dict,
    folded: Dict,
    img: jnp.ndarray,
    *,
    interpret: bool = False,
    layout: str = "chw",
    block_fn=None,
) -> jnp.ndarray:
    """Full flagship forward: flax encoder → fused decoder → XLA head.

    ``layout="chw"`` is the r1 small-batch path (W-in-lanes kernels);
    ``layout="nhwc"`` is the r3 path (optionally with a custom
    ``block_fn``, e.g. the int8-activation runner — infer/act_quant.py).
    Jittable; numerically equivalent to ``model.apply(..., train=False)``
    up to matmul rounding (verified in tests/test_fused_decoder.py).
    """
    feats = encode_features(model, variables, img)
    if layout == "nhwc":
        decoded = fused_decoder_nhwc(
            feats, folded, tuple(model.decoder_channels),
            interpret=interpret, block_fn=block_fn,
        )
    else:
        decoded = fused_decoder_chw(
            feats, folded, tuple(model.decoder_channels), interpret=interpret
        )
    return apply_head(variables, decoded)
