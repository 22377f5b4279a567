#!/usr/bin/env python
"""Probe: can libtpu fuse int8-dequant PROLOGUES into convs under flags?

PERF.md r3 closed the int8-activation speed route on the fact that
XLA:TPU materializes the int8->bf16 convert before every conv (+70%
measured, probe_int8_conv.py). libtpu's string table carries two flag
names that sound exactly like the missing switch:

  xla_tpu_fuse_non_trivial_x8_producers_into_conv_like
  xla_tpu_allow_conv_input_fusion_with_downcast_convert

If either makes the dequant prologue fuse, int8 activation storage
halves the HBM read bytes of every dw/project conv in the mid-chain —
the "removing bytes" lever the post-flag roofline says is the only one
left (PERF.md r3 roofline floor).

MEASURED (r3, bs=128 256^2 C=256, vmem=65536 base in both runs):

  xla_tpu_fuse_non_trivial_x8_producers_into_conv_like=true — accepted
  but NO effect; the dequant prologue still materializes:
      1x1 bf16<-bf16      15.84 ms   |  dw3 bf16<-bf16      16.77 ms
      1x1 bf16<-int8+deq  25.52 ms   |  dw3 bf16<-int8+deq  26.37 ms
  (same +57-61% as the unflagged probe_int8_conv.py baseline)

  xla_tpu_allow_conv_input_fusion_with_downcast_convert=true — REJECTED:
  every case fails remote compile (tpu_compile_helper exit 1), i.e. not
  a valid libtpu compile option on this toolchain.

CONCLUSION (route closed): no flag unlocks int8-dequant prologue fusion
on this libtpu; the int8-activation speed route stays closed (PERF.md r3
"int8 ACTIVATION storage"), and the w8a8 path remains an accuracy-tested
footprint/wire-format option only.

Cases (per flag set, one set per process — retained-buffer OOM rule):
  a) 1x1 conv bf16 from bf16 input          (byte reference)
  b) 1x1 conv bf16 from int8 input + dequant (the +70% case)
  c) dw3x3 bf16 from bf16 input
  d) dw3x3 bf16 from int8 input + dequant    (the real prize: dw is
     the bottleneck family; fused prologue = half the read bytes)

Usage: python scripts/probe_x8_fusion.py [--bs 128] [--opt k=v ...]
"""

from __future__ import annotations

import argparse
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


def parse_opt(s: str):
    key, _, raw = s.partition("=")
    if raw.lower() in ("true", "false"):
        return key, raw.lower() == "true"
    try:
        return key, int(raw)
    except ValueError:
        return key, raw


def bench(fn, *args, iters=9):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters // 3):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / (iters // 3))
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--opt", action="append", default=[])
    args = ap.parse_args()

    opts = {"xla_tpu_scoped_vmem_limit_kib": 65536}
    for s in args.opt:
        k, v = parse_opt(s)
        opts[k] = v
    print(f"devices: {jax.devices()}  opts: {opts}", flush=True)
    kw = {"compiler_options": opts}

    B, H, W, C = args.bs, 256, 256, 256
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C), np.int8))
    xb = x8.astype(jnp.bfloat16) / 127.0
    wb = jnp.asarray(
        rng.normal(0, 0.05, (1, 1, C, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    dwb = jnp.asarray(
        rng.normal(0, 0.2, (3, 3, 1, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")
    dq = jnp.bfloat16(1.0 / 127.0)

    def conv(x, w):
        y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return y.astype(jnp.float32).sum()

    def conv_from_i8(x, w):
        return conv(x.astype(jnp.bfloat16) * dq, w)

    def dw(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=dn)
        return y.astype(jnp.float32).sum()

    def dw_from_i8(x, w):
        return dw(x.astype(jnp.bfloat16) * dq, w)

    cases = [
        ("1x1 bf16<-bf16     ", conv, (xb, wb)),
        ("1x1 bf16<-int8+deq ", conv_from_i8, (x8, wb)),
        ("dw3 bf16<-bf16     ", dw, (xb, dwb)),
        ("dw3 bf16<-int8+deq ", dw_from_i8, (x8, dwb)),
    ]
    for name, fn, a in cases:
        try:
            t = bench(jax.jit(fn, **kw), *a)
            print(f"{name}: {t:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
