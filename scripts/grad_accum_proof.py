#!/usr/bin/env python
"""Gradient accumulation in anger (VERDICT r3 item 7).

The accumulate_grad_batches knob had a CPU equivalence test but no real
fit behind it. This proof runs the REAL Trainer on the flagship
(efficientunet++/timm-efficientnet-b5) over learnable shards TWICE on
the chip:

  A: batch_size=128, no accumulation        (the HBM-limit batch)
  B: batch_size=32, accumulate_grad_batches=4  (same effective batch)

Same seed → the shuffled sample stream is identical, so every optimizer
update in B averages gradients over exactly the 128 samples A saw in one
step. The runs are not bit-equal (BN batch statistics are computed per
micro-batch), so the acceptance is statistical: both runs' losses
decrease, and the final val dice agree within ``--tol`` (default 0.05).

Each fit runs in its own subprocess (one process owns the TPU on this
attachment; retained buffers from run A would OOM run B).

Usage (from /root/repo): python scripts/grad_accum_proof.py [--epochs 6]
Writes PROOFS/grad_accum_r4.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


# 20 shards split 0.7/0.2/0.1 -> 14 train / 4 val / 2 test: the val split
# must hold >= one FULL bs=128 batch (batched(partial=False) semantics —
# with 10 shards the 64 val samples yield zero bs-128 batches and run A
# would never produce a val/dice)
def write_dataset(data: Path, n_shards: int = 20, per_shard: int = 32,
                  size: int = 256) -> None:
    from scripts.quant_accuracy_proof import write_learnable_shard

    data.mkdir(parents=True, exist_ok=True)
    for i in range(n_shards):
        write_learnable_shard(data / f"train-combo-{i:06d}.tar",
                              per_shard, size, i)


def fit_once(data: str, work: str, batch_size: int, accum: int,
             epochs: int, out_json: str) -> None:
    """One Trainer fit (subprocess role)."""
    import csv

    from deadtrees_tpu.train.trainer import Trainer

    cfg = {
        "data_dir": data,
        "seed": 42,
        "datamodule": {"pattern": "train-combo-*.tar",
                       "batch_size": batch_size, "num_workers": 2},
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
            "max_epochs": epochs,
            "min_epochs": 1,
            "precision": "bf16",
            "gradient_clip_val": 0.5,
            # no val cap: both runs score the SAME 128 val samples
            # (A: one bs-128 batch; B: four bs-32 batches)
            "devices": 1,
            "accumulate_grad_batches": accum,
        },
        "callbacks": {
            "model_checkpoint": {"monitor": "val/dice", "mode": "max",
                                 "dirpath": "checkpoints/"},
            "early_stopping": {"monitor": "val/dice", "patience": 200},
            # keep the schedule simple: no freeze stage, no SWA — the
            # comparison is about the accumulation math, not the recipe
            "multistage": {"unfreeze_epoch": 0, "lr_reduce_epoch": None},
        },
        "logger": {"kind": "csv", "save_dir": "metrics"},
    }
    t0 = time.perf_counter()
    trainer = Trainer(cfg, work_dir=Path(work))
    result = trainer.fit()
    wall = time.perf_counter() - t0

    with open(Path(work) / "metrics" / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["train/total_loss"]) for r in rows
              if r.get("train/total_loss")]

    val_dice_recal = _recalibrated_val_dice(trainer)
    Path(out_json).write_text(json.dumps({
        "batch_size": batch_size,
        "accum": accum,
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "val_dice_raw": result.get("val/dice"),
        "val_dice_recal": val_dice_recal,
        "wall_min": round(wall / 60, 1),
    }))
    print(f"fit bs={batch_size} accum={accum}: loss {losses[0]:.4f} -> "
          f"{losses[-1]:.4f}, val dice raw={result.get('val/dice')} "
          f"recal={val_dice_recal:.4f}", flush=True)


def _recalibrated_val_dice(trainer) -> float:
    """Foreground dice over the val split after BN-stat RECALIBRATION.

    The two recipes update BN running stats at 4x different rates (per
    micro-step), so on a short run the raw val/dice mostly measures BN
    warmup, not the learned weights (measured: 0.46 vs 0.70 at epoch 8
    while train losses tracked within 0.1). 40 train-mode passes at
    momentum 0.9 put both runs' stats ~98.5% of the way to their
    steady state, making the dice comparison about the gradient math —
    the same recalibration trick the SWA finalizer uses
    (trainer._finalize_swa).
    """
    import jax
    import jax.numpy as jnp

    from deadtrees_tpu.losses.functional import class2one_hot
    from deadtrees_tpu.losses.metrics import fscore

    model = trainer.model
    params = trainer.state.params
    stats = trainer.state.batch_stats

    @jax.jit
    def bn_pass(params, batch_stats, img):
        _, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, train=True, mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    seen = 0
    epoch = 0
    while seen < 40:
        for b in trainer.datamodule.train_batches(jax.random.PRNGKey(epoch)):
            stats = bn_pass(params, stats, b["image"])
            seen += 1
            if seen >= 40:
                break
        epoch += 1

    @jax.jit
    def predict(img):
        logits = model.apply(
            {"params": params, "batch_stats": stats}, img, train=False
        )
        return jax.nn.softmax(logits, axis=-1)

    dices = []
    for b in trainer.datamodule.val_batches():
        probs = predict(b["image"])
        y = class2one_hot(jnp.asarray(b["mask"]), probs.shape[-1])
        dices.append(float(fscore(probs, y, ignore_channels=[0])))
    return sum(dices) / max(len(dices), 1)


def main(argv=None) -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "fit":
        fit_once(sys.argv[2], sys.argv[3], int(sys.argv[4]),
                 int(sys.argv[5]), int(sys.argv[6]), sys.argv[7])
        return 0

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--tol", type=float, default=0.05,
                    help="max |dice_A - dice_B| accepted (BN micro-batch "
                         "stats make the runs statistically, not bitwise, "
                         "equivalent)")
    ap.add_argument("--out", type=Path, default=REPO / "PROOFS" / "grad_accum_r4.json")
    args = ap.parse_args(argv)

    tmp = Path(tempfile.mkdtemp(prefix="grad_accum_proof_"))
    data = tmp / "data"
    write_dataset(data)
    print(f"dataset: 20 learnable shards @256² in {data}", flush=True)

    runs = {}
    for name, bs, accum in (("A_bs128", 128, 1), ("B_bs32x4", 32, 4)):
        work = tmp / name
        work.mkdir()
        out_json = tmp / f"{name}.json"
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, __file__, "fit", str(data), str(work),
             str(bs), str(accum), str(args.epochs), str(out_json)],
            cwd=REPO,
        ).returncode
        if rc != 0:
            print(f"FAIL: fit {name} exited {rc}")
            return rc
        runs[name] = json.loads(out_json.read_text())
        print(f"{name} done in {(time.time() - t0) / 60:.1f} min", flush=True)

    a, b = runs["A_bs128"], runs["B_bs32x4"]
    delta = abs((a["val_dice_recal"] or 0) - (b["val_dice_recal"] or 0))
    ok = (
        a["loss_last"] < a["loss_first"]
        and b["loss_last"] < b["loss_first"]
        and delta <= args.tol
    )
    report = {
        "model": "efficientunet++/timm-efficientnet-b5 (256,128,64,32,16)",
        "epochs": args.epochs,
        "runs": runs,
        "dice_delta_recal": round(delta, 4),
        "tolerance": args.tol,
        "note": "dice compared after identical BN-stat recalibration; raw "
                "val/dice differs on short runs because BN running stats "
                "update 4x more often in the accumulation recipe",
        "status": "ok" if ok else "FAIL",
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
