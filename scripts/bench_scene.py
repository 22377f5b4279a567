#!/usr/bin/env python
"""Scene-path benchmark (VERDICT r2 item 4): whole-orthophoto inference.

The production workload is thousands of 2048² scenes
(reference scripts/inference.py:16-115). r2 measured 121.2 tiles512/s —
2.5× below the batch path — because one scene yields only 64 subtiles of
256² (sub-batch underutilization). r3 packs multiple scenes per compiled
dispatch (infer/sliding.py predict_scenes).

Run from /root/repo (TPU): python scripts/bench_scene.py
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
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import argparse

    from deadtrees_tpu.infer.sliding import make_scene_predictor
    from deadtrees_tpu.models import create_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8,
                    help="scenes per compiled dispatch (8×16 subtiles of "
                    "512² = one full bs-128 model sub-batch)")
    ap.add_argument("--sub", type=int, default=512,
                    help="subtile size (512 = the deployment Tiler default, "
                    "runs the model in the bs=128/512² headline regime and "
                    "measured +15%% over 256 — PERF.md r3)")
    ap.add_argument("--tile", type=int, default=2048, help="scene size")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    model = create_model(
        "efficientunet++", "timm-efficientnet-b5", in_channels=4, classes=3,
        decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16,
    )
    from bench import _bench_variables  # repo root is on sys.path above

    variables = _bench_variables(model, args.sub)

    S, TH, sub = args.scenes, args.tile, args.sub
    fn = make_scene_predictor(
        model, subtile=sub, batch_size=128, packed=True
    )
    scenes = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (S, TH, TH, 4), np.uint8)
    )
    valid = jnp.ones((S, (TH // sub) ** 2), bool)

    t0 = time.perf_counter()
    out = fn(variables["params"], variables["batch_stats"], scenes, valid)
    np.asarray(out)
    print(f"compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        N = 4
        for _ in range(N):
            out = fn(variables["params"], variables["batch_stats"], scenes,
                     valid)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / N)
    tiles512 = S * (TH / 512.0) ** 2
    print(
        f"scene path: {best*1e3:.1f} ms per {S}-scene dispatch "
        f"({tiles512/best:.1f} tiles512/s; r2 single-scene was 121.2)",
        flush=True,
    )


if __name__ == "__main__":
    main()
