#!/usr/bin/env python
"""Flagship on-chip training proof (VERDICT r2 item 6).

Runs the REAL Trainer path — multistage + SWA + checkpointing — on the
model of record (EfficientUNet++ / timm-efficientnet-b5, decoder
(256,128,64,32,16), reference configs/model/default.yaml:4-8 and the
protocol.md:24-30 recipe: Adam 3e-4, cosine T_max=10, grad-clip 0.5,
bf16) for N≥50 steps at 256² on the TPU, then:

  1. asserts the loss decreased,
  2. round-trips best.ckpt -> JaxInference -> prediction,
  3. measures int8-ACTIVATION (w8a8) argmax agreement vs bf16 on the
     TRAINED model (the honest accuracy half of VERDICT item 2),
  4. writes a JSON summary for PERF.md.

Usage (from /root/repo): python scripts/train_flagship_proof.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import numpy as np


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--learnable", action="store_true",
                    help="train on LEARNABLE synthetic data (mask = "
                    "deterministic function of the bands, "
                    "quant_accuracy_proof.py) so the b5 actually converges "
                    "and the w8a8 agreement is a serving-grade number")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--out", default=None,
                    help="output JSON (default: PROOFS/flagship_train_r3"
                    "[_learnable].json)")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)

    from tests.test_data import _write_shard

    from deadtrees_tpu.train.trainer import Trainer

    tmp = Path(tempfile.mkdtemp(prefix="flagship_proof_"))
    data = tmp / "data"
    data.mkdir()
    # the datamodule splits shards 0.7/0.2/0.1 (reference fractions), so
    # 10 shards leave 7 for train: 7*32/32 = 7 steps/epoch, 84 steps ≥ 50
    n_shards, per_shard = 10, 32
    if args.learnable:
        from scripts.quant_accuracy_proof import write_learnable_shard

        for i in range(n_shards):
            write_learnable_shard(
                data / f"train-combo-{i:06d}.tar", per_shard, 256, i
            )
    else:
        for i in range(n_shards):
            _write_shard(
                data / f"train-combo-{i:06d}.tar", per_shard, seed=i, size=256
            )
    print(f"dataset: {n_shards} shards x {per_shard} samples @256² "
          f"(learnable={args.learnable})", flush=True)

    bs = 32  # the reference recipe's batch (protocol.md:24)
    cfg = {
        "data_dir": str(data),
        "seed": 42,
        "datamodule": {"pattern": "train-combo-*.tar", "batch_size": bs,
                       "num_workers": 2},
        "model": {
            "network": {
                "architecture": "efficientunet++",
                "encoder_name": "timm-efficientnet-b5",
                "decoder_channels": [256, 128, 64, 32, 16],
                "classes": ["background", "conifers", "deciduous"],
                "in_channels": 4,
                "losses": ["GDICE", "FOCAL", "BOUNDARY"],
            },
            "training": {"learning_rate": 3e-4, "cosineannealing_tmax": 10},
        },
        "trainer": {
            "max_epochs": args.epochs,
            "min_epochs": 1,
            "precision": "bf16",
            "gradient_clip_val": 0.5,
            "limit_val_batches": 1,
            "devices": 1,
        },
        "callbacks": {
            "model_checkpoint": {"monitor": "val/dice", "mode": "max",
                                 "dirpath": "checkpoints/"},
            "early_stopping": {"monitor": "val/dice", "patience": 200},
            "multistage": {"unfreeze_epoch": 2, "lr_reduce_epoch": 4,
                           "lr_reduce_fraction": 4},
            "swa": {"swa_epoch_start": 8},
        },
        "logger": {"kind": "csv", "save_dir": "metrics"},
    }
    work = tmp / "run"
    work.mkdir()

    t0 = time.perf_counter()
    trainer = Trainer(cfg, work_dir=work)
    result = trainer.fit()
    wall = time.perf_counter() - t0

    import csv

    with open(work / "metrics" / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["train/total_loss"]) for r in rows
              if r.get("train/total_loss")]
    steps_per_sec = [float(r["steps_per_sec"]) for r in rows
                     if r.get("steps_per_sec")]
    total_steps = int(rows[-1]["step"]) if rows and rows[-1].get("step") else 0
    # steady-state epochs exclude the compile-dominated first epoch
    steady = steps_per_sec[1:] or steps_per_sec
    tiles512_s = max(steady) * bs * (256 / 512.0) ** 2

    print(
        f"train: {total_steps} steps, loss {losses[0]:.4f} -> {losses[-1]:.4f},"
        f" best steady epoch {max(steady):.3f} steps/s"
        f" = {tiles512_s:.1f} tiles512/s (wall {wall/60:.1f} min incl compile)",
        flush=True,
    )
    assert total_steps >= 50, f"only {total_steps} steps"
    assert losses[-1] < losses[0], "loss did not decrease"

    # ckpt -> engine round trip on the trained flagship
    from deadtrees_tpu.infer import JaxInference

    best = result.get("best_ckpt") or str(work / "checkpoints" / "last.ckpt")
    eng = JaxInference(best)
    rng = np.random.default_rng(0)
    if args.learnable:
        # held-out learnable samples: agreement where logits are decisive
        from scripts.quant_accuracy_proof import write_learnable_shard

        from deadtrees_tpu.data.tar import decode_sample, iter_tar_samples

        eval_shard = tmp / "eval-000000.tar"
        write_learnable_shard(eval_shard, 8, 256, 99)
        img = np.stack(
            [decode_sample(s)["image"]
             for s in iter_tar_samples(str(eval_shard))]
        )
    else:
        img = rng.integers(0, 255, (8, 256, 256, 4), np.uint8)
    pred = eng.run(img)
    assert pred.shape == (8, 256, 256)
    print(f"JaxInference round trip OK from {Path(best).name}", flush=True)

    # int8-activation accuracy on the TRAINED model (VERDICT item 2)
    eng8 = JaxInference(best, quantized="w8a8")
    pred8 = eng8.run(img)
    agree = float((pred8 == pred).mean())
    print(f"w8a8 argmax agreement on trained flagship: {agree:.5f}", flush=True)

    out = {
        "model": "efficientunet++/timm-efficientnet-b5 (256,128,64,32,16)",
        "recipe": "bs32 256² adam3e-4 cosine10 clip0.5 bf16 multistage+swa",
        "data": "learnable synthetic" if args.learnable else "random synthetic",
        "total_steps": total_steps,
        "loss_first_epoch": round(losses[0], 4),
        "loss_last_epoch": round(losses[-1], 4),
        "steady_steps_per_sec": round(max(steady), 3),
        "tiles512_per_sec": round(tiles512_s, 1),
        "val_dice_last": result.get("val/dice"),
        "w8a8_argmax_agreement": round(agree, 5),
        "wall_minutes_incl_compile": round(wall / 60, 1),
        "best_ckpt": str(best),
    }
    Path("PROOFS").mkdir(exist_ok=True)
    dest = args.out or (
        "PROOFS/flagship_train_r3_learnable.json" if args.learnable
        else "PROOFS/flagship_train_r3.json"
    )
    Path(dest).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
