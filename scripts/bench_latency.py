#!/usr/bin/env python
"""Small-batch (latency-oriented) serving comparison on the flagship.

Throughput serving uses bs=128 where plain XLA wins (PERF.md r3). The
r1 CHW kernels were built for the opposite regime — few images per
request, where per-image grids don't serialize and lane-dense W-in-lanes
tiles avoid the small-batch underutilization. This measures end-to-end
JaxInference-equivalent programs at a small batch:

  flax/XLA  vs  fused_decoder="chw"  vs  fused_decoder="nhwc"

Run from /root/repo (TPU): python scripts/bench_latency.py [--bs 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--modes", default="flax,chw,nhwc")
    args = ap.parse_args()

    from deadtrees_tpu.models import create_model
    from deadtrees_tpu.ops.fused_decoder import (
        fold_effunetpp_decoder,
        fused_forward,
    )

    print(f"devices: {jax.devices()}", flush=True)
    model = create_model(
        "efficientunet++", "timm-efficientnet-b5", in_channels=4, classes=3,
        decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16,
    )
    spec = jax.ShapeDtypeStruct((1, args.image_size, args.image_size, 4),
                                jnp.float32)
    shapes = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), spec
    )
    host = np.random.default_rng(0)

    def materialize(path, s):
        name = jax.tree_util.keystr(path)
        if "var" in name or "scale" in name:
            return jnp.ones(s.shape, s.dtype)
        if np.issubdtype(s.dtype, np.floating):
            return jnp.asarray(host.normal(0, 0.05, s.shape).astype(s.dtype))
        return jnp.zeros(s.shape, s.dtype)

    variables = jax.tree_util.tree_map_with_path(materialize, shapes)
    folded = fold_effunetpp_decoder(variables)
    x = jnp.asarray(
        host.normal(size=(args.bs, args.image_size, args.image_size, 4))
        .astype(np.float32)
    )

    @jax.jit
    def run_flax(v, x):
        return jnp.argmax(
            model.apply(v, x, train=False), axis=-1
        ).astype(jnp.int32).sum()

    def make_fused(layout):
        @jax.jit
        def run(v, x):
            logits = fused_forward(model, v, folded, x, layout=layout)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32).sum()

        return run

    def bench(fn):
        def sync(v):
            np.asarray(v)

        sync(fn(variables, x))
        sync(fn(variables, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn(variables, x)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 4)
        return best * 1e3

    results = {}
    for mode in args.modes.split(","):
        fn = run_flax if mode == "flax" else make_fused(mode)
        try:
            t = bench(fn)
            results[mode] = t
            print(f"{mode:5s}: {t:8.2f} ms/call  "
                  f"({args.bs / (t / 1e3):.1f} img/s)", flush=True)
        except Exception as e:
            print(f"{mode:5s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    if "flax" in results:
        for m, t in results.items():
            if m != "flax":
                print(f"{m} vs flax: {results['flax'] / t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
