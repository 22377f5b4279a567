#!/usr/bin/env python
"""Production rehearsal: the reference's full production story, on TPU.

The reference's deployed workflow is train → checkpoint → batch scene
inference over orthophoto GeoTIFFs → yearly aggregation into CSV +
shapefile (/root/reference/scripts/inference.py:16-115 and
aggregate_results.py:27-123). This script rehearses that exact story
end-to-end at FLAGSHIP scale (efficientunet++/timm-efficientnet-b5,
decoder 256..16) on the real chip, using learnable synthetic data so
every stage's output is checkable:

  1. train the flagship with the REAL Trainer (multistage + SWA +
     checkpointing) on learnable shards  [TPU, own process]
  2. generate K 2048² 4-band orthophoto scenes with the same learnable
     rule + matching forest-mask (lu) tiles, as georeferenced GeoTIFFs
  3. run the production CLI `scripts/inference.py --all` with the
     trained checkpoint → predicted GeoTIFFs  [TPU, own process]
  4. score the predictions against the scenes' ground-truth masks
  5. run `scripts/aggregate_results.py` → aggregated_2020.csv + .shp
  6. read the shapefile back with the first-party reader and verify
     record count + attribute schema

Each TPU stage runs in its own process (one process owns the TPU on
this attachment). Writes PROOFS/production_rehearsal_r3.json.

Usage (from /root/repo): python scripts/production_rehearsal.py
  [--epochs 12] [--scenes 16] [--ckpt PATH  # skip stage 1]
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

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

YEAR = 2020


def make_learnable_scene(size: int, seed: int):
    """Same deterministic rule as the training shards
    (quant_accuracy_proof.write_learnable_shard): smoothed 4-band noise;
    class 1 where G dominates NIR, class 2 where NIR dominates G;
    forest mask = NIR > 128."""
    rng = np.random.default_rng(seed)
    base = rng.normal(128, 60, (size, size, 4))
    k = np.ones((5, 5)) / 25.0
    fk = np.fft.fft2(k, s=(size, size))
    for c in range(4):
        base[..., c] = np.real(np.fft.ifft2(np.fft.fft2(base[..., c]) * fk))
    rgbn = np.clip(base, 0, 255).astype(np.uint8)
    g = rgbn[..., 1].astype(np.int16)
    nir = rgbn[..., 3].astype(np.int16)
    mask = np.zeros((size, size), np.uint8)
    mask[g - nir > 10] = 1
    mask[nir - g > 10] = 2
    lu = (nir > 128).astype(np.uint8)
    return rgbn, mask, lu


def geo_tags(scene_idx: int, size: int, px: float = 0.2):
    """Distinct georeferencing per scene so the aggregated shapefile
    carries distinct tile polygons (ModelPixelScale + ModelTiepoint)."""
    x0 = 500000.0 + scene_idx * size * px
    y0 = 5400000.0
    return {
        33550: (px, px, 0.0),
        33922: (0.0, 0.0, 0.0, x0, y0, 0.0),
    }


def run_stage(cmd, cwd: Path = REPO, **kw) -> float:
    # TPU stages MUST run with CWD=/root/repo (the remote-compile helper
    # breaks otherwise — see .claude/skills/verify); CPU-only stages may
    # run elsewhere.
    print(f"\n>>> {' '.join(str(c) for c in cmd)}", flush=True)
    t0 = time.perf_counter()
    subprocess.run([str(c) for c in cmd], check=True, cwd=str(cwd), **kw)
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--scene-size", type=int, default=2048)
    ap.add_argument("--ckpt", default=None,
                    help="existing flagship checkpoint (skips training)")
    ap.add_argument("--out", default="PROOFS/production_rehearsal_r3.json")
    args = ap.parse_args()

    work = Path(tempfile.mkdtemp(prefix="rehearsal_"))
    print(f"workdir: {work}", flush=True)
    proof: dict = {}

    # ---- stage 1: train (TPU, own process) ----
    if args.ckpt:
        ckpt = Path(args.ckpt)
        proof["train"] = f"skipped (provided checkpoint {ckpt})"
    else:
        train_json = work / "train.json"
        dt = run_stage([
            sys.executable, "scripts/train_flagship_proof.py", "--learnable",
            "--epochs", args.epochs, "--out", train_json,
        ])
        tr = json.loads(train_json.read_text())
        ckpt = Path(tr["best_ckpt"])
        proof["train"] = {
            "total_steps": tr["total_steps"],
            "loss": [tr["loss_first_epoch"], tr["loss_last_epoch"]],
            "val_dice_last": tr["val_dice_last"],
            "wall_minutes": round(dt / 60, 1),
        }
    assert ckpt.exists(), ckpt
    from deadtrees_tpu.core.checkpoint import load_checkpoint

    hp = load_checkpoint(ckpt)["hparams"]
    proof["model"] = (
        f"{hp['architecture']}/{hp['encoder_name']} "
        f"{tuple(hp['decoder_channels'])}"
    )

    # ---- stage 2: orthophoto scenes + forest-mask tiles (CPU) ----
    scenes_dir = work / "scenes"
    forest_dir = work / f"processed.lus.{YEAR}"
    pred_dir = work / f"predicted.{YEAR}"
    gt_dir = work / "gt"
    for d in (scenes_dir, forest_dir, pred_dir, gt_dir):
        d.mkdir(parents=True)

    from deadtrees_tpu.infer.geotiff import write_geotiff

    t0 = time.perf_counter()
    for i in range(args.scenes):
        rgbn, mask, lu = make_learnable_scene(args.scene_size, 1000 + i)
        name = f"ortho_{YEAR}_{i:03d}.tif"
        geo = {"backend": "pil", "tags": geo_tags(i, args.scene_size)}
        write_geotiff(scenes_dir / name, rgbn, geo)
        write_geotiff(forest_dir / name, lu, geo)
        np.save(gt_dir / f"{name}.npy", mask)
    proof["scenes"] = {
        "count": args.scenes, "size": args.scene_size,
        "gen_seconds": round(time.perf_counter() - t0, 1),
    }
    print(f"generated {args.scenes} scenes @ {args.scene_size}²", flush=True)

    # ---- stage 3: production inference CLI (TPU, own process) ----
    mosaic_path = pred_dir / f"predicted_mosaic_{YEAR}.tif"
    dt = run_stage([
        sys.executable, "scripts/inference.py", scenes_dir, ckpt,
        "--all", "--outpath", pred_dir, "--mosaic", mosaic_path,
    ])
    preds = sorted(pred_dir.glob("ortho*.tif"))
    assert len(preds) == args.scenes, (len(preds), args.scenes)
    # mosaic stage (gdal_merge analogue, dvc.yaml:134-146): every predicted
    # pixel must land in the merged raster at its world position
    from deadtrees_tpu.infer.geotiff import read_geotiff as _read

    assert mosaic_path.exists(), mosaic_path
    proof["mosaic"] = {"shape": list(np.squeeze(_read(mosaic_path).data).shape)}
    tiles512 = args.scenes * (args.scene_size / 512) ** 2
    proof["inference_cli"] = {
        "wall_seconds": round(dt, 1),
        "tiles512_per_sec_wall": round(tiles512 / dt, 1),
        "note": "wall includes process start, 373 MB checkpoint load, "
                "compile-cache load and GeoTIFF IO; the steady-state "
                "compute number for this exact program is bench_scene's "
                "(PERF.md r3: ~300 tiles512/s)",
    }

    # ---- stage 4: score vs ground truth (CPU) ----
    from deadtrees_tpu.infer.geotiff import read_geotiff

    inter = np.zeros(3, np.int64)
    psum = np.zeros(3, np.int64)
    gsum = np.zeros(3, np.int64)
    agree = n_pix = 0
    for p in preds:
        pred = read_geotiff(p).data.squeeze()
        gt = np.load(gt_dir / f"{p.name}.npy")
        assert pred.shape == gt.shape, (pred.shape, gt.shape)
        agree += int((pred == gt).sum())
        n_pix += gt.size
        for c in range(3):
            inter[c] += int(((pred == c) & (gt == c)).sum())
            psum[c] += int((pred == c).sum())
            gsum[c] += int((gt == c).sum())
    dice = (2 * inter / np.maximum(psum + gsum, 1)).round(4)
    proof["accuracy"] = {
        "pixel_agreement": round(agree / n_pix, 4),
        "dice_per_class": dice.tolist(),
        "dice_foreground_mean": round(float(dice[1:].mean()), 4),
    }
    print(f"scene accuracy: agreement={agree / n_pix:.4f} dice={dice}",
          flush=True)

    # ---- stage 5: aggregation (CPU, reference CLI contract) ----
    dt = run_stage(
        [sys.executable, str(REPO / "scripts" / "aggregate_results.py"),
         forest_dir, "--years", YEAR, "--limit", 10],
        cwd=work,  # CPU-only stage; artifacts land in the proof dir
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    csv_path = work / f"aggregated_{YEAR}.csv"
    shp_path = work / f"aggregated_{YEAR}"
    import csv as csvmod

    with open(csv_path) as f:
        rows = list(csvmod.DictReader(f))
    assert rows, "aggregation produced no tiles"

    # ---- stage 6: shapefile read-back (first-party reader) ----
    from deadtrees_tpu.geo.shapefile import read_dbf, read_shapefile

    recs = read_shapefile(f"{shp_path}.shp")
    attrs = read_dbf(f"{shp_path}.dbf")
    assert len(recs) == len(rows) == len(attrs), (len(recs), len(rows))
    assert {"conifer", "broadleaf", "total"} <= set(attrs[0]), attrs[0]
    # polygons must be the distinct per-scene bounding boxes
    xmins = sorted(r["bbox"][0] for r in recs)
    assert len(set(xmins)) == len(recs), "tile polygons not distinct"
    proof["aggregation"] = {
        "tiles_kept": len(rows),
        "csv": str(csv_path.name),
        "shp_records": len(recs),
        "mean_total_dead_pct": round(
            float(np.mean([float(r["total"]) for r in rows])), 2),
    }
    proof["workdir"] = str(work)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(proof, indent=1))
    print("\n" + json.dumps(proof, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
