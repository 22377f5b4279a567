#!/usr/bin/env python
"""Capture and summarize a device trace of the flagship train/infer step.

VERDICT r2 item 3: the bs-128 train step runs at ~56 tiles512/s with
backward ≈ 4.6× forward (2-3× is normal) — this harness measures
forward-only vs full-step wall time and aggregates the profiler trace's
per-op device time so the backward's cost centers are attributable.

Usage (TPU, cwd=/root/repo):
    python scripts/profile_step.py --mode train --steps 3
    python scripts/profile_step.py --mode train --no-trace   # timings only

Writes the raw trace under --outdir and prints a device-time table.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from functools import partial  # noqa: E402
from deadtrees_tpu.core.tpu_opts import tpu_compiler_options  # noqa: E402


def build_train(args):
    from deadtrees_tpu.models import create_model
    from deadtrees_tpu.train import (
        OptimizerConfig,
        TrainState,
        build_loss,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        args.architecture, args.encoder, in_channels=4, classes=3,
        decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16,
    )
    spec = jax.ShapeDtypeStruct((1, args.image_size, args.image_size, 4),
                                jnp.float32)
    shapes = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=True), spec
    )
    host_rng = np.random.default_rng(0)

    def materialize(path, s):
        name = jax.tree_util.keystr(path)
        if "var" in name or "scale" in name:
            return jnp.ones(s.shape, s.dtype)
        if np.issubdtype(s.dtype, np.floating):
            return jnp.asarray(host_rng.normal(0, 0.05, s.shape).astype(s.dtype))
        return jnp.zeros(s.shape, s.dtype)

    variables = jax.tree_util.tree_map_with_path(materialize, shapes)
    tx = make_optimizer(OptimizerConfig(steps_per_epoch=100))
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    loss = build_loss(["GDICE", "FOCAL", "BOUNDARY"], 3)
    step = make_train_step(model, loss, num_classes=3)

    rng = np.random.default_rng(0)
    B, S = args.batch_size, args.image_size
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 4)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, 3, (B, S, S)).astype(np.int32)),
        "distmap": jnp.asarray(
            rng.normal(size=(B, S, S, 3)).astype(np.float32)
        ),
    }

    # forward-only loss program: the exact loss_fn the step differentiates,
    # reduced to its scalar total (steps.py:104-111)
    from deadtrees_tpu.losses.functional import class2one_hot

    @partial(jax.jit,
             compiler_options=tpu_compiler_options())
    def fwd(st, b):
        logits, _ = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            b["image"], train=True, mutable=["batch_stats"],
        )
        y = class2one_hot(b["mask"], 3)
        probs = jax.nn.softmax(logits, axis=-1)
        total, _ = loss(
            probs, y, logits=logits, distmap=b.get("distmap"),
            epoch=jnp.int32(0),
        )
        return total

    return state, batch, step, fwd


def build_infer(args):
    from deadtrees_tpu.models import create_model
    from deadtrees_tpu.train import make_predict_step

    model = create_model(
        args.architecture, args.encoder, in_channels=4, classes=3,
        decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16,
    )
    spec = jax.ShapeDtypeStruct((1, args.image_size, args.image_size, 4),
                                jnp.float32)
    shapes = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), spec
    )
    host_rng = np.random.default_rng(0)

    def materialize(path, s):
        name = jax.tree_util.keystr(path)
        if "var" in name or "scale" in name:
            return jnp.ones(s.shape, s.dtype)
        if np.issubdtype(s.dtype, np.floating):
            return jnp.asarray(host_rng.normal(0, 0.05, s.shape).astype(s.dtype))
        return jnp.zeros(s.shape, s.dtype)

    variables = jax.tree_util.tree_map_with_path(materialize, shapes)
    predict = make_predict_step(model, return_probs=False)
    from deadtrees_tpu.data.augment import normalize as _normalize
    from deadtrees_tpu.data.config import DATASET_CONFIG as _DC

    img = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, size=(args.batch_size, args.image_size, args.image_size, 4)
        ).astype(np.uint8)
    )

    @partial(jax.jit,
             compiler_options=tpu_compiler_options())
    def run_scalar(params, batch_stats, img_u8):
        x = _normalize(img_u8.astype(jnp.float32), _DC.mean, _DC.std)
        # scalar output: pure device-compute timing (PERF.md r2: dispatch
        # cost on this attachment scales with OUTPUT bytes)
        return predict(params, batch_stats, x).astype(jnp.int32).sum()

    return variables, img, run_scalar


def build_scene(args):
    """Whole-orthophoto program (bench.py bench_scene geometry: 8×2048²
    scenes → 16 subtiles of 512² each → one bs-128 sub-batch → on-device
    stitch → 2-bit packed map)."""
    from deadtrees_tpu.infer.sliding import make_scene_predictor
    from deadtrees_tpu.models import create_model

    model = create_model(
        args.architecture, args.encoder, in_channels=4, classes=3,
        decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16,
    )
    sub = args.image_size if args.image_size != 256 else 512
    from bench import _bench_variables

    variables = _bench_variables(model, sub)
    fn = make_scene_predictor(model, subtile=sub,
                              batch_size=args.batch_size, packed=True)
    scenes = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (8, 2048, 2048, 4),
                                          np.uint8)
    )
    valid = jnp.ones((8, (2048 // sub) ** 2), bool)
    return variables, fn, scenes, valid


def sync_scalar(x):
    np.asarray(x)


def sync_state(s):
    np.asarray(jax.tree_util.tree_leaves(s.params)[0]).ravel()[:1]


def summarize_trace(outdir: str):
    files = sorted(
        glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("no trace files found under", outdir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device; XLA op rows
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Device" in n
    }
    # device pids carry an "XLA Modules" row whose whole-program spans
    # double-count every op — keep the "XLA Ops" rows only (same filter
    # as roofline_share.load_trace)
    tid_names = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    op_rows = {
        k for k, n in tid_names.items()
        if k[0] in device_pids and n == "XLA Ops"
    }
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if op_rows and (e["pid"], e.get("tid")) not in op_rows:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))  # us
        if not name or dur <= 0:
            continue
        per_op[name] += dur
        base = re.sub(r"[.\d]+$", "", name)
        per_cat[base] += dur
        total += dur
    print(f"\n=== device time by op category (total {total/1e3:.1f} ms) ===")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/1e3:10.2f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")
    print("\n=== top individual ops ===")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v/1e3:10.2f} ms  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "infer", "scene"],
                    default="train")
    ap.add_argument("--architecture", default="efficientunet++")
    ap.add_argument("--encoder", default="timm-efficientnet-b5")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/trace_train")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--hlo", action="store_true",
                    help="dump optimized HLO of the step to outdir")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)

    if args.mode == "scene":
        variables, fn, scenes, valid = build_scene(args)
        params, batch_stats = variables["params"], variables["batch_stats"]
        t0 = time.perf_counter()
        np.asarray(fn(params, batch_stats, scenes, valid))
        print(f"scene compile+run1: {time.perf_counter()-t0:.1f}s",
              flush=True)
        N = 6
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(params, batch_stats, scenes, valid)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / N * 1e3
        tiles = 8 * (2048 / 512.0) ** 2
        print(f"scene: {ms:.1f} ms/dispatch "
              f"({tiles/(ms/1e3):.1f} tiles512/s)", flush=True)
        if args.hlo:
            txt = fn.lower(params, batch_stats, scenes,
                           valid).compile().as_text()
            Path(args.outdir).mkdir(parents=True, exist_ok=True)
            (Path(args.outdir) / "scene_hlo.txt").write_text(txt)
            print(f"HLO -> {args.outdir}/scene_hlo.txt ({len(txt)} bytes)")
        if not args.no_trace:
            Path(args.outdir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(args.outdir)
            for _ in range(args.steps):
                out = fn(params, batch_stats, scenes, valid)
            np.asarray(out)
            jax.profiler.stop_trace()
            summarize_trace(args.outdir)
        return

    if args.mode == "infer":
        variables, img, run = build_infer(args)
        params, batch_stats = variables["params"], variables["batch_stats"]
        t0 = time.perf_counter()
        sync_scalar(run(params, batch_stats, img))
        print(f"infer compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(2):
            sync_scalar(run(params, batch_stats, img))
        N = 6
        t0 = time.perf_counter()
        for _ in range(N):
            out = run(params, batch_stats, img)
        sync_scalar(out)
        ms = (time.perf_counter() - t0) / N * 1e3
        tiles = args.batch_size * (args.image_size / 512.0) ** 2
        print(f"infer fwd: {ms:.1f} ms/call ({tiles/(ms/1e3):.1f} tiles512/s)",
              flush=True)
        if args.hlo:
            txt = run.lower(params, batch_stats, img).compile().as_text()
            Path(args.outdir).mkdir(parents=True, exist_ok=True)
            (Path(args.outdir) / "infer_hlo.txt").write_text(txt)
            print(f"HLO -> {args.outdir}/infer_hlo.txt ({len(txt)} bytes)")
        if not args.no_trace:
            Path(args.outdir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(args.outdir)
            for _ in range(args.steps):
                out = run(params, batch_stats, img)
            sync_scalar(out)
            jax.profiler.stop_trace()
            summarize_trace(args.outdir)
        return

    state, batch, step, fwd = build_train(args)

    t0 = time.perf_counter()
    out = fwd(state, batch)
    sync_scalar(out)
    print(f"fwd compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)
    # timed forward
    for _ in range(2):
        out = fwd(state, batch)
        sync_scalar(out)
    t0 = time.perf_counter()
    N = 6
    for _ in range(N):
        out = fwd(state, batch)
    sync_scalar(out)
    fwd_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"forward-only loss: {fwd_ms:.1f} ms/call", flush=True)

    t0 = time.perf_counter()
    state, m = step(state, batch, jnp.int32(0))
    sync_state(state)
    print(f"step compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(2):
        state, m = step(state, batch, jnp.int32(0))
    sync_state(state)
    t0 = time.perf_counter()
    for _ in range(N):
        state, m = step(state, batch, jnp.int32(0))
    sync_state(state)
    step_ms = (time.perf_counter() - t0) / N * 1e3
    tiles = args.batch_size * (args.image_size / 512.0) ** 2
    print(
        f"full step: {step_ms:.1f} ms/call "
        f"({tiles / (step_ms/1e3):.1f} tiles512/s); "
        f"bwd+opt = {step_ms - fwd_ms:.1f} ms "
        f"= {(step_ms - fwd_ms) / max(fwd_ms, 1e-9):.2f}x fwd",
        flush=True,
    )

    if args.hlo:
        txt = step.lower(state, batch, jnp.int32(0)).compile().as_text()
        Path(args.outdir).mkdir(parents=True, exist_ok=True)
        (Path(args.outdir) / "step_hlo.txt").write_text(txt)
        print(f"HLO -> {args.outdir}/step_hlo.txt ({len(txt)} bytes)")

    if not args.no_trace:
        Path(args.outdir).mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(args.outdir)
        for _ in range(args.steps):
            state, m = step(state, batch, jnp.int32(0))
        sync_state(state)
        jax.profiler.stop_trace()
        summarize_trace(args.outdir)


if __name__ == "__main__":
    main()
