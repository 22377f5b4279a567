#!/usr/bin/env python
"""Probe: do NATIVE int8 convolutions lower + pay on this TPU?

The w8a8 activation-storage path measured ~no win (290 vs 300 tiles/s,
PERF.md r3): XLA:TPU cannot fuse dequantize prologues INTO convolution
ops, so every int8→bf16 convert before a conv materializes a full-size
tensor and the byte saving cancels. The principled alternative is
executing the convs themselves in int8 (int8×int8→int32, 394 TOPS on
v5e). This probe measures, at the flagship's hot x_0_3 geometry:

  a) 1×1 conv int8·int8→int32 vs bf16·bf16→f32 (the expand GEMM)
  b) depthwise conv int8 (feature_group_count=C) vs bf16
  c) end: whether XLA accepts them at all

Run from /root/repo with the TPU free: python scripts/probe_int8_conv.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=9):
    def sync(v):
        np.asarray(v)

    sync(fn(*args))
    sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters // 3):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / (iters // 3))
    return best * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    B, H, W, C = 128, 256, 256, 256
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C), np.int8))
    xb = (x8.astype(jnp.bfloat16) / 127.0)
    w8 = jnp.asarray(rng.integers(-127, 127, (1, 1, C, C), np.int8))
    wb = (w8.astype(jnp.bfloat16) / 127.0)
    dw8 = jnp.asarray(rng.integers(-127, 127, (3, 3, 1, C), np.int8))
    dwb = (dw8.astype(jnp.bfloat16) / 127.0)
    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv_bf16(x, w):
        y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return y.astype(jnp.float32).sum()

    @jax.jit
    def conv_int8(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return y.sum()

    @jax.jit
    def dw_bf16(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=dn)
        return y.astype(jnp.float32).sum()

    @jax.jit
    def dw_int8(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        return y.sum()

    # the production shape: int8 in → conv → requantize epilogue → int8
    # out (the int32 accumulator never reaches HBM if the epilogue fuses)
    scale = jnp.float32(0.01)

    @jax.jit
    def conv_int8_req(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        q = jnp.clip(jnp.round(y.astype(jnp.float32) * scale), -127, 127
                     ).astype(jnp.int8)
        return q.astype(jnp.int32).sum()

    @jax.jit
    def dw_int8_req(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        q = jnp.clip(jnp.round(y.astype(jnp.float32) * scale), -127, 127
                     ).astype(jnp.int8)
        return q.astype(jnp.int32).sum()

    # chain: does a dequant PROLOGUE into a conv avoid materializing bf16?
    @jax.jit
    def conv_bf16_from_int8(x, w):
        xb = x.astype(jnp.bfloat16) * jnp.bfloat16(0.01)
        y = jax.lax.conv_general_dilated(xb, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return y.astype(jnp.float32).sum()

    for name, fn, args in [
        ("1x1 conv bf16", conv_bf16, (xb, wb)),
        ("1x1 conv int8", conv_int8, (x8, w8)),
        ("1x1 conv int8->int8", conv_int8_req, (x8, w8)),
        ("dw3x3 bf16", dw_bf16, (xb, dwb)),
        ("dw3x3 int8", dw_int8, (x8, dw8)),
        ("dw3x3 int8->int8", dw_int8_req, (x8, dw8)),
        ("1x1 bf16 w/ int8-dequant prologue", conv_bf16_from_int8, (x8, wb)),
    ]:
        try:
            t = bench(fn, *args)
            print(f"{name}: {t:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
