"""Calibrated int8 ACTIVATION storage for the BN-folded decoder (serving).

VERDICT r2 item 2 — weights-only int8 bought footprint, not speed. The
flagship's inference forward is dominated by memory passes over fat
decoder activations (PERF.md r3: row x_*_3 = 46% of 422 ms; its biggest
dw streams at ~99% of HBM bandwidth — the only remaining lever on those
ops is FEWER BYTES). This module stores the intra-block activation
tensors (y = post-expand, h = post-depthwise, s = post-SCSE) as int8 in
HBM with per-channel calibrated scales:

- the producer fusion's epilogue quantizes (round/clip/convert fuse into
  the conv fusion — XLA writes an int8 tensor, 4× fewer bytes than bf16);
- the consumer dequantizes in its prologue (elementwise, fuses likewise);
- per-channel scales commute with the depthwise conv and fold into the
  consumer GEMM prologues, so no extra passes appear anywhere.

Scales come from a one-batch CALIBRATION pass (reference analogue: ONNX
post-training quantization of create_onnx.py:31-45): run the folded
decoder once recording per-channel absmax at every site, then bake
``scale = absmax / 127``. Accuracy is measured, not assumed
(tests/test_act_quant.py: argmax agreement vs the bf16 path).

Pallas-kernel postscript (documented negative result): the two-pass fused
fat-cell kernel (ops/fused_cell.py) measured 0.71× vs XLA at bs=128
because Pallas pins channels to the minor (lane) dim — 88-channel tensors
pad to 128 lanes — while XLA freely picks batch-minor layouts with zero
padding. Int8 storage attacks the same bytes without fighting layouts.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from deadtrees_tpu.ops.fused_decoder import fused_decoder_nhwc
from deadtrees_tpu.ops.fused_mbconv import FoldedBlockParams


def _quant(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """f32 → int8 with per-channel scale (fuses into the producer)."""
    q = jnp.round(x / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _dequant(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def folded_block_int8(
    x: jnp.ndarray,
    fp: FoldedBlockParams,
    scales: Dict[str, jnp.ndarray],
    sites: frozenset = frozenset(("y", "h", "s")),
) -> jnp.ndarray:
    """One BN-folded InvertedResidual with int8 y/h/s activation storage.

    Compute stays in the incoming dtype (bf16 on TPU — f32 everywhere was
    measured to push the bs-128/512² program past HBM); only the tiny
    pooled-gate math runs f32.

    KEEP IN SYNC with fused_decoder.folded_block_xla_nhwc (the plain
    restatement of this math) and folded_block_calibrate below — drift
    guard: tests/test_act_quant.py::test_no_sites_block_matches_plain_nhwc_block.
    """
    dn = ("NHWC", "HWIO", "NHWC")
    cin = x.shape[-1]
    cmid = fp.w1.shape[1]
    dtype = x.dtype
    fpc = jax.tree_util.tree_map(lambda a: a.astype(dtype), fp)

    y = jax.lax.conv_general_dilated(
        x, fpc.w1.reshape(1, 1, cin, cmid), (1, 1), "SAME",
        dimension_numbers=dn,
    ) + fpc.b1
    y = jax.nn.hard_swish(y.astype(jnp.float32))
    if "y" in sites:
        y = _dequant(_quant(y, scales["y"]), scales["y"], dtype)
    else:
        y = y.astype(dtype)

    h = jax.lax.conv_general_dilated(
        y, fpc.dw.reshape(*fp.dw.shape[:2], 1, cmid), (1, 1), "SAME",
        feature_group_count=cmid, dimension_numbers=dn,
    ) + fpc.b_dw
    h = jax.nn.hard_swish(h.astype(jnp.float32))
    if "h" in sites:
        hf = _dequant(_quant(h, scales["h"]), scales["h"], dtype)
    else:
        hf = h.astype(dtype)
    pooled = jnp.mean(hf.astype(jnp.float32), axis=(1, 2))
    z = jnp.maximum(pooled @ fp.cse_w1 + fp.cse_b1, 0.0)
    gate = jax.nn.sigmoid(z @ fp.cse_w2 + fp.cse_b2)
    s = jax.nn.sigmoid(hf @ fpc.sse_w + fpc.sse_b)
    scse = hf * gate[:, None, None, :].astype(dtype) + hf * s
    if "s" in sites:
        scse = _dequant(
            _quant(scse.astype(jnp.float32), scales["s"]), scales["s"], dtype
        )

    out = jax.lax.conv_general_dilated(
        scse, fpc.w2.reshape(1, 1, cmid, -1), (1, 1), "SAME",
        dimension_numbers=dn,
    ) + fpc.b2
    if fp.wsk is not None:
        out = out + jax.lax.conv_general_dilated(
            x, fpc.wsk.reshape(1, 1, cin, -1), (1, 1), "SAME",
            dimension_numbers=dn,
        ) + fpc.bsk
    else:
        out = out + x
    return out.astype(dtype)


def folded_block_calibrate(
    x: jnp.ndarray, fp: FoldedBlockParams, record: Dict[str, jnp.ndarray],
    site: str,
) -> jnp.ndarray:
    """Same math (model dtype), recording per-channel absmax at each
    quant site (records reduce to f32)."""
    dn = ("NHWC", "HWIO", "NHWC")
    cin = x.shape[-1]
    cmid = fp.w1.shape[1]
    dtype = x.dtype
    fpc = jax.tree_util.tree_map(lambda a: a.astype(dtype), fp)

    def amax(t):
        return jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(0, 1, 2))

    y = jax.lax.conv_general_dilated(
        x, fpc.w1.reshape(1, 1, cin, cmid), (1, 1), "SAME",
        dimension_numbers=dn,
    ) + fpc.b1
    y = jax.nn.hard_swish(y.astype(jnp.float32)).astype(dtype)
    record[f"{site}.y"] = amax(y)

    h = jax.lax.conv_general_dilated(
        y, fpc.dw.reshape(*fp.dw.shape[:2], 1, cmid), (1, 1), "SAME",
        feature_group_count=cmid, dimension_numbers=dn,
    ) + fpc.b_dw
    h = jax.nn.hard_swish(h.astype(jnp.float32)).astype(dtype)
    record[f"{site}.h"] = amax(h)

    pooled = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
    z = jnp.maximum(pooled @ fp.cse_w1 + fp.cse_b1, 0.0)
    gate = jax.nn.sigmoid(z @ fp.cse_w2 + fp.cse_b2)
    s = jax.nn.sigmoid(h @ fpc.sse_w + fpc.sse_b)
    scse = h * gate[:, None, None, :].astype(dtype) + h * s
    record[f"{site}.s"] = amax(scse)

    out = jax.lax.conv_general_dilated(
        scse, fpc.w2.reshape(1, 1, cmid, -1), (1, 1), "SAME",
        dimension_numbers=dn,
    ) + fpc.b2
    if fp.wsk is not None:
        out = out + jax.lax.conv_general_dilated(
            x, fpc.wsk.reshape(1, 1, cin, -1), (1, 1), "SAME",
            dimension_numbers=dn,
        ) + fpc.bsk
    else:
        out = out + x
    return out.astype(dtype)


def calibrate_decoder(
    features_nhwc: Sequence[jnp.ndarray],
    folded: Dict[str, Tuple[FoldedBlockParams, FoldedBlockParams]],
    decoder_channels: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    """One calibration pass over the decoder: site → per-channel scale.

    Jittable; run on one representative batch. Scales get a small safety
    margin (×1.1) against calibration-batch under-coverage.
    """
    record: Dict[str, jnp.ndarray] = {}

    def block_fn(x, fp, site):
        return folded_block_calibrate(x, fp, record, site)

    fused_decoder_nhwc(
        features_nhwc, folded, decoder_channels, block_fn=block_fn
    )
    return {
        k: jnp.maximum(v * 1.1, 1e-6) / 127.0 for k, v in record.items()
    }


def make_int8_block_fn(
    scales: Dict[str, jnp.ndarray],
    sites: frozenset = frozenset(("y", "h", "s")),
) -> Callable:
    """``sites`` selects which activations quantize (accuracy knob: on a
    converged b0, all three → 0.9917 argmax agreement; fewer sites trade
    footprint for accuracy — measured in PROOFS/w8a8_accuracy_r3.json)."""
    def block_fn(x, fp, site):
        s = {
            "y": scales[f"{site}.y"],
            "h": scales[f"{site}.h"],
            "s": scales[f"{site}.s"],
        }
        return folded_block_int8(x, fp, s, sites=sites)

    return block_fn
