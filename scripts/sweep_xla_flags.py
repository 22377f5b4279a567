#!/usr/bin/env python
"""XLA:TPU compiler-flag sweep for the flagship programs.

The axon attachment forwards jit ``compiler_options`` to the remote
compile helper, where libtpu validates them (a bogus name fails the
compile) — so named TPU flags CAN be applied per-program even though
client-side XLA_FLAGS rejects them. This harness compiles the flagship
inference (or train) step under one option set and reports steady-state
throughput, bench.py-style (best of 3 windows, scalar-reduced outputs).

One option set per process: retained device buffers from a previous
fat case OOM the next one (ROADMAP.md environment constraints).

Usage (from /root/repo, TPU attached):
    python scripts/sweep_xla_flags.py --bs 32 --opt xla_tpu_scoped_vmem_limit_kib=65536
    python scripts/sweep_xla_flags.py --mode train --bs 32 --opt ...
"""

from __future__ import annotations

import argparse
import json
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


def parse_opt(s: str):
    key, _, raw = s.partition("=")
    if raw.lower() in ("true", "false"):
        return key, raw.lower() == "true"
    try:
        return key, int(raw)
    except ValueError:
        pass
    try:
        return key, float(raw)
    except ValueError:
        return key, raw


def materializer(host_rng):
    def materialize(path, s):
        name = jax.tree_util.keystr(path)
        if "var" in name or "scale" in name:
            return jnp.ones(s.shape, s.dtype)
        if np.issubdtype(s.dtype, np.floating):
            return jnp.asarray(host_rng.normal(0, 0.05, s.shape).astype(s.dtype))
        return jnp.zeros(s.shape, s.dtype)

    return materialize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["infer", "train"], default="infer")
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=0,
                    help="default: 512 infer / 256 train")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--opt", action="append", default=[],
                    help="repeatable key=value compiler option")
    ap.add_argument("--frozen-bn", action="store_true",
                    help="train mode: frozen-BN step (running stats)")
    ap.add_argument("--frozen-encoder", action="store_true",
                    help="train mode: multistage stage-1 step (encoder "
                    "grads masked+DCEd, reference callbacks/multistage.py)")
    args = ap.parse_args()
    size = args.image_size or (512 if args.mode == "infer" else 256)
    options = dict(parse_opt(s) for s in args.opt)

    from deadtrees_tpu.models import create_model

    model = create_model(
        "efficientunet++", "timm-efficientnet-b5", in_channels=4, classes=3,
        decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16,
    )
    spec = jax.ShapeDtypeStruct((1, size, size, 4), jnp.float32)
    train = args.mode == "train"
    shapes = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=train), spec
    )
    variables = jax.tree_util.tree_map_with_path(
        materializer(np.random.default_rng(0)), shapes
    )
    rng = np.random.default_rng(1)

    if args.mode == "infer":
        from deadtrees_tpu.data.augment import normalize
        from deadtrees_tpu.data.config import DATASET_CONFIG as DC
        from deadtrees_tpu.infer.packing import pack2
        from deadtrees_tpu.train import make_predict_step

        predict = make_predict_step(model, return_probs=False)
        img = jnp.asarray(
            rng.integers(0, 255, (args.bs, size, size, 4)).astype(np.uint8)
        )
        params, batch_stats = variables["params"], variables["batch_stats"]

        def run(params, batch_stats, img_u8):
            x = normalize(img_u8.astype(jnp.float32), DC.mean, DC.std)
            return pack2(predict(params, batch_stats, x).astype(jnp.uint8))

        t0 = time.perf_counter()
        compiled = (
            jax.jit(run)
            .lower(params, batch_stats, img)
            .compile(compiler_options=options or None)
        )
        compile_s = time.perf_counter() - t0
        call = lambda: compiled(params, batch_stats, img)  # noqa: E731
        sync = lambda out: np.asarray(out[0, 0, :8])  # noqa: E731
    else:
        from deadtrees_tpu.train import (
            OptimizerConfig, TrainState, build_loss, make_optimizer,
            make_train_step,
        )

        tx = make_optimizer(OptimizerConfig(steps_per_epoch=100))
        state = TrainState.create(
            params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx,
        )
        loss = build_loss(["GDICE", "FOCAL", "BOUNDARY"], 3)
        step = make_train_step(model, loss, num_classes=3,
                               frozen_bn=args.frozen_bn)
        batch = {
            "image": jnp.asarray(
                rng.normal(size=(args.bs, size, size, 4)).astype(np.float32)),
            "mask": jnp.asarray(
                rng.integers(0, 3, (args.bs, size, size)).astype(np.int32)),
            "distmap": jnp.asarray(
                rng.normal(size=(args.bs, size, size, 3)).astype(np.float32)),
        }
        t0 = time.perf_counter()
        # make_train_step returns a jitted fn (donated state, static frozen);
        # .lower preserves those
        compiled = step.lower(
            state, batch, jnp.int32(0), frozen=args.frozen_encoder
        ).compile(compiler_options=options or None)
        compile_s = time.perf_counter() - t0
        holder = {"state": state}

        def call():
            holder["state"], metrics = compiled(
                holder["state"], batch, jnp.int32(0)
            )
            return metrics

        def sync(out):
            np.asarray(out["total_loss"] if isinstance(out, dict)
                       else jax.tree_util.tree_leaves(out)[0])

    out = None
    for _ in range(3):
        out = call()
    sync(out)
    per_window = max(args.iters // 3, 1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(per_window):
            out = call()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / per_window)
    tiles = args.bs * (size / 512.0) ** 2
    print(json.dumps({
        "mode": args.mode, "bs": args.bs, "size": size,
        "frozen_bn": bool(args.frozen_bn),
        "options": options, "ms_per_call": round(best * 1e3, 2),
        "tiles512_per_sec": round(tiles / best, 2),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
