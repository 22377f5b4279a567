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

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TILES_PER_SEC = 10_000.0


def bench_inference(
    architecture: str,
    encoder: str,
    *,
    image_size: int,
    batch_size: int,
    iters: int = 20,
    warmup: int = 3,
    decoder_channels=(256, 128, 64, 32, 16),
) -> float:
    from deadtrees_tpu.models import create_model, init_model
    from deadtrees_tpu.train import make_predict_step

    model = create_model(
        architecture,
        encoder,
        in_channels=4,
        classes=3,
        decoder_channels=decoder_channels,
        dtype=jnp.bfloat16,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=image_size)
    predict = make_predict_step(model)

    img = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(batch_size, image_size, image_size, 4))
        .astype(np.float32)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    def sync(x):
        # block_until_ready does NOT actually synchronize through the axon
        # TPU tunnel (measured: deferred work drains on the next transfer);
        # a tiny D2H read is the only reliable barrier.
        np.asarray(x[0, 0, :8])

    for _ in range(warmup):
        pred, _ = predict(params, batch_stats, img)
        sync(pred)

    t0 = time.perf_counter()
    for _ in range(iters):
        pred, _ = predict(params, batch_stats, img)
    sync(pred)
    dt = time.perf_counter() - t0

    tiles = iters * batch_size * (image_size / 512.0) ** 2
    return tiles / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--architecture", default="efficientunet++")
    ap.add_argument("--encoder", default="timm-efficientnet-b5")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    platform = jax.devices()[0].platform
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

    tiles_per_sec = bench_inference(
        args.architecture,
        args.encoder,
        image_size=args.image_size,
        batch_size=args.batch_size,
        iters=args.iters,
    )

    print(
        f"bench: {args.architecture}/{args.encoder} {args.image_size}px "
        f"bs={args.batch_size} on {platform}: {tiles_per_sec:.1f} tiles512/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "infer_512px_tiles_per_sec_per_chip",
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/s",
                "vs_baseline": round(tiles_per_sec / BASELINE_TILES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
