#!/usr/bin/env python
"""Isolated fat-cell benchmark: fused_ir_fat vs the flax XLA block.

Shapes mirror the flagship-inference hot row (PERF.md r3): at 512² input
the dense-grid row-3 cells run at 256² spatial with 88-256-channel concat
inputs and carry 46% of the forward. Outputs reduce to a scalar (dispatch
cost scales with OUTPUT bytes on this attachment).

Run from /root/repo:  python scripts/bench_fused_cell.py [--bs 128]
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
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=8, warmup=2):
    def sync(v):
        np.asarray(v)

    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(max(iters // 3, 1)):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / max(iters // 3, 1))
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--cases", default="x03,x13,x33,ir2,x02")
    args = ap.parse_args()

    from deadtrees_tpu.models.blocks import InvertedResidual
    from deadtrees_tpu.ops.fused_cell import fused_ir_fat
    from deadtrees_tpu.ops.fused_mbconv import fold_inverted_residual
    from tests.test_fused_mbconv import _randomized_variables

    print(f"devices: {jax.devices()}", flush=True)

    # (name, cin, cout, hw) — flagship@512² decoder geometry
    all_cases = {
        "x03": (256, 32, 256),   # x_0_3 IR1: 4-way concat in
        "x13": (184, 48, 256),   # x_1_3 IR1
        "x33": (88, 48, 256),    # x_3_3 IR1
        "ir2": (48, 48, 256),    # row-3 IR2 (identity skip)
        "x02": (248, 64, 128),   # x_0_2 IR1 (row 2)
    }
    B = args.bs
    for name in args.cases.split(","):
        cin, cout, hw = all_cases[name]
        module = InvertedResidual(
            features=cout, expansion_ratio=1, squeeze_ratio=1,
            dtype=jnp.bfloat16,
        )
        x = jnp.asarray(
            np.random.default_rng(0)
            .normal(size=(B, hw, hw, cin))
            .astype(np.float32)
        ).astype(jnp.bfloat16)
        variables = _randomized_variables(module, x)
        fp = fold_inverted_residual(
            variables["params"], variables["batch_stats"]
        )

        @jax.jit
        def xla_fn(x):
            return module.apply(variables, x, train=False).astype(
                jnp.float32).sum()

        @jax.jit
        def fused_fn(x):
            return fused_ir_fat(x, fp).astype(jnp.float32).sum()

        t_x = bench(xla_fn, x)
        r_x = np.asarray(xla_fn(x))
        try:
            t_f = bench(fused_fn, x)
            r_f = np.asarray(fused_fn(x))
            rel = abs(r_f - r_x) / (abs(r_x) + 1e-6)
            print(
                f"{name}: cin={cin} cout={cout} {hw}²x{B}  "
                f"XLA {t_x:7.2f} ms   fused {t_f:7.2f} ms  "
                f"({t_x / t_f:.2f}x)  relsum={rel:.2e}",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: XLA {t_x:.2f} ms; fused FAILED: {e}", flush=True)
        # drop device buffers + compiled programs before the next case —
        # retained arrays from a 256²x128 case OOM the 16 GB HBM
        # (ResourceExhausted observed when running 3 cases in-process)
        del x, variables, fp, xla_fn, fused_fn
        jax.clear_caches()
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
