#!/usr/bin/env python
"""Measured TTA value: dice delta + throughput cost on a converged model.

Trains a small EfficientUNet++ (b0 encoder) on learnable synthetic shards
(same harness as quant_accuracy_proof.py), then scores plain vs tta=4 vs
tta=8 predictions against held-out ground truth and times each engine.
The reference predicts one orientation per tile
(/root/reference/deadtrees/deployment/inference.py:56-62); TTA is this
framework's accuracy lever on top of parity — this proof records what it
actually buys and costs on the TPU.

Run from /root/repo (TPU): python scripts/tta_accuracy_proof.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

from scripts.quant_accuracy_proof import write_learnable_shard  # noqa: E402


def _macro_fg_dice(pred: np.ndarray, truth: np.ndarray, classes=(1, 2)) -> float:
    """Mean foreground dice over classes (the val/dice convention:
    background excluded)."""
    scores = []
    for c in classes:
        p = pred == c
        t = truth == c
        denom = p.sum() + t.sum()
        if denom == 0:
            continue
        scores.append(2.0 * (p & t).sum() / denom)
    return float(np.mean(scores)) if scores else float("nan")


def main() -> int:
    import jax

    print(f"devices: {jax.devices()}", flush=True)

    from deadtrees_tpu.train.trainer import Trainer

    tmp = Path(tempfile.mkdtemp(prefix="tta_proof_"))
    data = tmp / "data"
    data.mkdir()
    for i in range(10):
        write_learnable_shard(data / f"train-combo-{i:06d}.tar", 32, 128, i)

    cfg = {
        "data_dir": str(data),
        "seed": 11,
        "datamodule": {"pattern": "train-combo-*.tar", "batch_size": 32,
                       "num_workers": 2},
        "model": {
            "network": {
                "architecture": "efficientunet++",
                "encoder_name": "timm-efficientnet-b0",
                "decoder_channels": [64, 48, 32, 24, 16],
                "classes": ["background", "conifers", "deciduous"],
                "in_channels": 4,
                "losses": ["GDICE", "FOCAL", "BOUNDARY"],
            },
            "training": {"learning_rate": 1e-3, "cosineannealing_tmax": 10},
        },
        "trainer": {
            "max_epochs": 25,
            "min_epochs": 1,
            "precision": "bf16",
            "limit_val_batches": 2,
            "devices": 1,
        },
        "callbacks": {
            "model_checkpoint": {"monitor": "val/dice", "mode": "max",
                                 "dirpath": "checkpoints/"},
            "early_stopping": {"monitor": "val/dice", "patience": 200},
        },
        "logger": {"kind": "csv", "save_dir": "metrics"},
    }
    work = tmp / "run"
    work.mkdir()
    trainer = Trainer(cfg, work_dir=work)
    result = trainer.fit()
    print(f"trained: val/dice={result.get('val/dice', 0.0):.4f}", flush=True)

    from deadtrees_tpu.data.tar import decode_sample, iter_tar_samples
    from deadtrees_tpu.infer import JaxInference

    best = result.get("best_ckpt") or str(work / "checkpoints" / "last.ckpt")
    eval_shard = tmp / "eval.tar"
    write_learnable_shard(eval_shard, 32, 128, 99)
    samples = [decode_sample(s) for s in iter_tar_samples(str(eval_shard))]
    imgs = np.stack([s["image"] for s in samples])
    truth = np.stack([s["mask"] for s in samples])

    out = {
        "model": "efficientunet++/timm-efficientnet-b0 (64,48,32,24,16)",
        "train_val_dice": round(float(result.get("val/dice", 0.0)), 4),
        "eval_images": int(imgs.shape[0]),
        "by_views": {},
    }
    base_pred = None
    for views in (0, 4, 8):
        eng = JaxInference(best, tta=views or False)
        pred = eng.run(imgs)  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            pred = eng.run(imgs)
        dt = (time.perf_counter() - t0) / reps
        if base_pred is None:
            base_pred = pred
        entry = {
            "fg_dice": round(_macro_fg_dice(pred, truth), 5),
            "pixel_acc": round(float((pred == truth).mean()), 5),
            "imgs_per_s": round(imgs.shape[0] / dt, 2),
            "agreement_vs_plain": round(float((pred == base_pred).mean()), 5),
        }
        out["by_views"][str(views)] = entry
        print(f"tta={views}: {entry}", flush=True)

    d0 = out["by_views"]["0"]["fg_dice"]
    out["note"] = (
        "fg_dice = macro dice over foreground classes vs held-out ground "
        f"truth; deltas vs plain: tta4 {out['by_views']['4']['fg_dice']-d0:+.5f}, "
        f"tta8 {out['by_views']['8']['fg_dice']-d0:+.5f}; throughput cost is "
        "~views x (free layout remaps, pure extra compute)"
    )
    Path("PROOFS").mkdir(exist_ok=True)
    Path("PROOFS/tta_accuracy_r3.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
