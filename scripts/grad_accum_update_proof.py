#!/usr/bin/env python
"""Single-update gradient-accumulation equivalence at flagship geometry.

The fit-level proof (scripts/grad_accum_proof.py, PROOFS/grad_accum_r4.json)
compares two stochastic 8-epoch runs and needs a BN-stat recalibration to
score them — it shows the recipes CONVERGE alike, but can't isolate the
gradient math. This proof does: from ONE frozen (params, batch_stats,
opt_state) and ONE fixed 128-sample batch it runs

  A: one bs-128 train step                      (optax chain, k=1)
  B: four bs-32 micro steps through the REAL
     ``accumulate_grad_batches=4`` path          (optax.MultiSteps, k=4)

and compares (a) the accumulated gradient trees and (b) the updated
parameter trees, elementwise, at flagship geometry
(efficientunet++/timm-efficientnet-b5, 256², the production HBM-limit
batch). Three configurations:

- **exact** — frozen-BN forward + boundary loss (a pure per-pixel mean,
  so mean-of-4-micro-grads ≡ full-batch grad mathematically). Any delta is
  pure float noise: bf16 MXU accumulation order inside convs changes with
  batch tiling, plus the f32 4-way mean. This gate proves the MultiSteps
  machinery (accumulate → clip full-batch grad → Adam → one schedule tick)
  implements exactly the bs-128 update.
- **loss_stats** — frozen-BN forward + the production compound loss:
  isolates the loss's own batch-statistic terms (GDICE class-volume
  weights summed over the whole batch, FOCAL's mask-sum normalizer) from
  the BN effect.
- **flagship** — train-mode BN + GDICE+FOCAL+BOUNDARY (the production
  recipe). Here the two sides differ MATHEMATICALLY, not just numerically:
  BN normalizes by 32- vs 128-sample batch statistics, GDICE class-volume
  weights (losses.py GeneralizedDiceLoss, summed over the whole batch) and
  FOCAL's mask-sum normalizer are computed per micro-batch. Lightning's
  ``accumulate_grad_batches`` has the identical semantics on the reference
  (micro-batch losses, averaged grads), so this gate documents the shared,
  expected divergence rather than a rebuild defect.

Expected floors (documented, then gated with headroom):

- Updates are first-step Adam: update ≈ lr·sign(g) per coordinate, so
  coordinates with |g| below the noise floor can flip sign and contribute
  2·lr each to the update delta no matter how exact the gradient math is.
  The honest update-level metrics are therefore cosine similarity and the
  p99 of |Δa−Δb|/lr — not a plain relative L2, which the near-zero-gradient
  tail dominates by construction.
- Gradient-level agreement is the core claim: relative L2 and cosine over
  the concatenated tree.

Usage (TPU attached): python scripts/grad_accum_update_proof.py
Writes PROOFS/grad_accum_update_r5.json. ~10 min incl. compiles.

Reference: Lightning Trainer(accumulate_grad_batches) semantics vs
/root/reference/configs/trainer/default.yaml; optimizer chain
deadtrees_tpu/train/optim.py:71-92.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
MICRO = 32
K = BATCH // MICRO
SIZE = 256
CLASSES = 3
LR = 3e-4


def make_batch(seed: int = 0):
    """One fixed, learnable 128-sample batch: image, mask, distmap."""
    from deadtrees_tpu.losses.functional import batch_one_hot2dist, class2one_hot

    rng = np.random.default_rng(seed)
    img = rng.normal(0.0, 1.0, (BATCH, SIZE, SIZE, 4)).astype(np.float32)
    # masks correlated with the image so gradients are structured, not noise
    field = img[..., 0] + 0.5 * img[..., 1]
    mask = np.zeros((BATCH, SIZE, SIZE), np.int32)
    mask[field > 0.8] = 1
    mask[field < -0.8] = 2
    one_hot = class2one_hot(jnp.asarray(mask), CLASSES)
    dist = np.asarray(jax.jit(batch_one_hot2dist)(one_hot))
    return {
        "image": img,
        "mask": mask,
        "distmap": dist.astype(np.float32),
    }


class BoundaryOnlyLoss:
    """Duck-typed CompoundLoss: boundary term only — a pure jnp.mean over
    (B,H,W,idc), hence EXACTLY decomposable into equal-size micro-batches."""

    def __init__(self):
        from deadtrees_tpu.losses.losses import BoundaryLoss

        self._bd = BoundaryLoss(idc=[1, 2])

    def __call__(self, probs, y, *, logits=None, distmap=None, epoch=0):
        loss = self._bd(probs, distmap)
        return loss, {"boundary_loss": loss, "total_loss": loss}


def tree_stats(tree_a, tree_b, lr: float):
    """Elementwise agreement metrics over two same-structure pytrees."""
    va = np.concatenate([np.ravel(np.asarray(x, np.float64))
                         for x in jax.tree_util.tree_leaves(tree_a)])
    vb = np.concatenate([np.ravel(np.asarray(x, np.float64))
                         for x in jax.tree_util.tree_leaves(tree_b)])
    diff = va - vb
    na, nb, nd = np.linalg.norm(va), np.linalg.norm(vb), np.linalg.norm(diff)
    cos = float(np.dot(va, vb) / (na * nb)) if na and nb else 0.0
    out = {
        "rel_l2": float(nd / na) if na else 0.0,
        "cosine": cos,
        "norm_ratio": float(nb / na) if na else 0.0,
        "n_elements": int(va.size),
    }
    if lr:
        scaled = np.abs(diff) / lr
        out["p50_absdiff_over_lr"] = float(np.percentile(scaled, 50))
        out["p99_absdiff_over_lr"] = float(np.percentile(scaled, 99))
        out["max_absdiff_over_lr"] = float(scaled.max())
    return out


def run_gate(name: str, *, frozen_bn: bool, loss, batch, variables,
             report: dict) -> None:
    from deadtrees_tpu.models.factory import create_model
    from deadtrees_tpu.train.optim import OptimizerConfig, make_optimizer
    from deadtrees_tpu.train.steps import TrainState, make_train_step

    model = create_model(
        architecture="efficientunet++",
        encoder_name="timm-efficientnet-b5",
        decoder_channels=(256, 128, 64, 32, 16),
        in_channels=4,
        classes=CLASSES,
    )

    p0 = jax.tree_util.tree_map(np.asarray, variables["params"])
    bs0 = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    epoch = jnp.zeros((), jnp.float32)

    def fresh_state(k: int) -> TrainState:
        cfg = OptimizerConfig(
            learning_rate=LR,
            gradient_clip_val=0.5,
            steps_per_epoch=1,
            accumulate_grad_batches=k,
        )
        return TrainState.create(
            params=jax.tree_util.tree_map(jnp.asarray, p0),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, bs0),
            tx=make_optimizer(cfg),
        )

    step = make_train_step(model, loss, num_classes=CLASSES, remat=True,
                           frozen_bn=frozen_bn)

    full = {k: jnp.asarray(v) for k, v in batch.items()}
    t0 = time.perf_counter()
    state_a, metrics_a = step(fresh_state(1), full, epoch)
    params_a = jax.tree_util.tree_map(np.asarray, state_a.params)
    del state_a
    t_a = time.perf_counter() - t0

    t0 = time.perf_counter()
    state_b = fresh_state(K)
    for i in range(K):
        micro = {k: jnp.asarray(v[i * MICRO:(i + 1) * MICRO])
                 for k, v in batch.items()}
        state_b, metrics_b = step(state_b, micro, epoch)
    params_b = jax.tree_util.tree_map(np.asarray, state_b.params)
    del state_b
    t_b = time.perf_counter() - t0

    # raw gradient trees: full-batch vs mean of the 4 micro-batch grads
    from deadtrees_tpu.losses.functional import class2one_hot

    def loss_fn(params, batch_stats, img, mask, distmap):
        def forward(p, x):
            if frozen_bn:
                logits = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x, train=False
                )
                return logits, batch_stats
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return logits, mut["batch_stats"]

        forward = jax.checkpoint(forward)
        logits, _ = forward(params, img)
        y = class2one_hot(mask, CLASSES)
        probs = jax.nn.softmax(logits, axis=-1)
        total, _ = loss(probs, y, logits=logits, distmap=distmap, epoch=0)
        return total

    grad_fn = jax.jit(jax.grad(loss_fn))
    g_full = grad_fn(
        jax.tree_util.tree_map(jnp.asarray, p0),
        jax.tree_util.tree_map(jnp.asarray, bs0),
        full["image"], full["mask"], full["distmap"],
    )
    g_full = jax.tree_util.tree_map(np.asarray, g_full)

    g_acc = None
    for i in range(K):
        g_i = grad_fn(
            jax.tree_util.tree_map(jnp.asarray, p0),
            jax.tree_util.tree_map(jnp.asarray, bs0),
            full["image"][i * MICRO:(i + 1) * MICRO],
            full["mask"][i * MICRO:(i + 1) * MICRO],
            full["distmap"][i * MICRO:(i + 1) * MICRO],
        )
        g_i = jax.tree_util.tree_map(np.asarray, g_i)
        g_acc = g_i if g_acc is None else jax.tree_util.tree_map(
            np.add, g_acc, g_i)
    g_mean = jax.tree_util.tree_map(lambda x: x / K, g_acc)

    delta_a = jax.tree_util.tree_map(np.subtract, params_a, p0)
    delta_b = jax.tree_util.tree_map(np.subtract, params_b, p0)

    report[name] = {
        "frozen_bn": frozen_bn,
        "loss": type(loss).__name__,
        "grads": tree_stats(g_full, g_mean, 0.0),
        "updates": tree_stats(delta_a, delta_b, LR),
        "loss_a": float(metrics_a["total_loss"]),
        "loss_b_last_micro": float(metrics_b["total_loss"]),
        "wall_s": {"A_bs128": round(t_a, 1), "B_bs32x4": round(t_b, 1)},
    }
    print(f"[{name}] grads: {report[name]['grads']}")
    print(f"[{name}] updates: {report[name]['updates']}", flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", type=Path,
                    default=REPO / "PROOFS" / "grad_accum_update_r5.json")
    args = ap.parse_args(argv)

    from deadtrees_tpu.models.factory import create_model, init_model
    from deadtrees_tpu.train.loss import build_loss

    print(f"devices: {jax.devices()}", flush=True)
    batch = make_batch()

    model = create_model(
        architecture="efficientunet++",
        encoder_name="timm-efficientnet-b5",
        decoder_channels=(256, 128, 64, 32, 16),
        in_channels=4,
        classes=CLASSES,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=SIZE)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    report: dict = {
        "model": "efficientunet++/timm-efficientnet-b5 (256,128,64,32,16)",
        "geometry": f"bs{BATCH}@{SIZE}² vs {K}×bs{MICRO} (optax.MultiSteps)",
        "lr": LR,
    }
    compound = build_loss(["GDICE", "FOCAL", "BOUNDARY"], CLASSES)
    run_gate("exact", frozen_bn=True, loss=BoundaryOnlyLoss(), batch=batch,
             variables=variables, report=report)
    # attribution middle rung: same compound loss, BN on running stats —
    # isolates the LOSS batch-statistics (GDICE class-volume weights,
    # FOCAL mask-sum normalizer) from the BN micro-stat effect
    run_gate("loss_stats", frozen_bn=True, loss=compound, batch=batch,
             variables=variables, report=report)
    run_gate("flagship", frozen_bn=False, loss=compound, batch=batch,
             variables=variables, report=report)

    ex, fl = report["exact"], report["flagship"]
    gates = {
        # THE machinery+math claim: mean-of-micro-grads through the real
        # MultiSteps path IS the bs-128 update, up to bf16 conv-tiling
        # noise; the p50 update gate shows the typical coordinate agrees to
        # far better than 5% of one lr-quantum (measured r5: p50 = 0.0,
        # p99 = 5e-4)
        "exact_grad_rel_l2<=5e-3": ex["grads"]["rel_l2"] <= 5e-3,
        "exact_grad_cosine>=0.99999": ex["grads"]["cosine"] >= 0.99999,
        "exact_update_cosine>=0.995": ex["updates"]["cosine"] >= 0.995,
        "exact_update_p50/lr<=0.05": ex["updates"]["p50_absdiff_over_lr"] <= 0.05,
        # production recipe sanity: batch-statistic terms (BN train-mode
        # stats, GDICE/FOCAL normalizers) make A and B MATHEMATICALLY
        # different per update — exactly as Lightning's
        # accumulate_grad_batches is on the reference (micro-batch losses,
        # averaged grads). Gate only what must still hold: magnitudes
        # match and the typical coordinate agrees; direction cosines are
        # reported as measurements, not gated (first-step Adam ≈
        # lr·sign(g), so every sign flip in the stochastic tail costs 2·lr
        # regardless of how small the underlying disagreement is).
        "flagship_grad_norm_ratio_within_5%":
            abs(fl["grads"]["norm_ratio"] - 1.0) <= 0.05,
        "flagship_update_norm_ratio_within_2%":
            abs(fl["updates"]["norm_ratio"] - 1.0) <= 0.02,
        "flagship_update_p50/lr<=0.05":
            fl["updates"]["p50_absdiff_over_lr"] <= 0.05,
    }
    report["gates"] = gates
    report["status"] = "ok" if all(gates.values()) else "FAIL"
    report["note"] = (
        "exact: frozen-BN + boundary loss (pure mean) — accumulation is "
        "mathematically identical to the bs-128 step; residual is bf16 "
        "batch-tiling noise. loss_stats: same but with the production "
        "GDICE+FOCAL+BOUNDARY loss — isolates the loss's batch-statistic "
        "terms. flagship: full production step (train-mode BN) — adds the "
        "BN micro-stat effect. The per-update divergence in the latter two "
        "is a property of micro-batch accumulation itself (identical in "
        "Lightning's accumulate_grad_batches), not of this implementation; "
        "fit-level equivalence is PROOFS/grad_accum_r4.json."
    )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    return 0 if report["status"] == "ok" else 1


if __name__ == "__main__":
    raise SystemExit(main())
