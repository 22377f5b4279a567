"""Training walkthrough — the reference's notebooks/01-Training.ipynb as a
runnable script.

Covers the full user path: synthetic tar shards → config composition
(Hydra-style overrides) → Trainer (jitted train/eval steps, checkpoints,
CSV metrics) → best-checkpoint inference smoke. Runs in ~a minute on CPU
with tiny shapes; on a TPU VM the same code runs unchanged (drop the
JAX_PLATFORMS pin and raise the shapes/batch size).

    python examples/01_training.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

# Pin CPU before first JAX use (examples are meant to run anywhere, and on
# TPU VMs the plugin can override the JAX_PLATFORMS env var — the config
# API always wins). Set DEADTREES_EXAMPLE_TPU=1 to run on the accelerator.
if not os.environ.get("DEADTREES_EXAMPLE_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from examples._synthetic import make_dataset  # noqa: E402


def main(workdir: Path) -> None:
    # ------------------------------------------------------------------ #
    # 1. Dataset: webdataset-style tar shards (see scripts/createdataset.py
    #    for the real preprocessing chain from orthophotos + shapefiles).
    # ------------------------------------------------------------------ #
    data_dir = make_dataset(workdir / "data", shards=4, samples=8, size=32)
    os.environ["TRAIN_DATASET_PATH"] = str(data_dir)
    print(f"dataset: {data_dir} ({len(list(data_dir.glob('*.tar')))} shards)")

    # ------------------------------------------------------------------ #
    # 2. Config: the same group=option / a.b.c=value grammar as the
    #    reference CLI (run.py). `mode=debug` keeps epochs/batches tiny.
    # ------------------------------------------------------------------ #
    from deadtrees_tpu.config import compose

    cfg = compose(
        config_dir=REPO / "configs",
        overrides=[
            "model=unet",
            "mode=debug",
            "datamodule.pattern='*.tar'",
            "datamodule.batch_size=4",
            "model.network.encoder_name=resnet18",
            "model.network.decoder_channels=[16,16,8,8,8]",
            "trainer.max_epochs=2",
            "trainer.limit_train_batches=2",
            "trainer.limit_val_batches=1",
            "trainer.devices=1",
            "trainer.precision=f32",  # CPU; on TPU leave the bf16 default
            "test_after_training=false",
            "seed=7",
        ],
    )

    # ------------------------------------------------------------------ #
    # 3. Train. The Trainer owns the jitted steps, the device mesh, the
    #    multistage schedule, checkpointing, and CSV metrics — the same
    #    role the reference's Lightning Trainer + SemSegment play.
    # ------------------------------------------------------------------ #
    from deadtrees_tpu.train.trainer import train

    run_dir = workdir / "run"
    result = train(cfg, work_dir=run_dir)
    print("train result:", {k: v for k, v in result.items() if k != "state"})

    # ------------------------------------------------------------------ #
    # 4. The checkpoint round-trips straight into the inference engine.
    # ------------------------------------------------------------------ #
    import numpy as np

    from deadtrees_tpu.infer.engine import JaxInference

    best = result["best_ckpt"]
    engine = JaxInference(best)
    batch = np.random.default_rng(0).integers(
        0, 255, (2, 32, 32, 4), dtype=np.uint8
    )
    classes = engine.run(batch)
    print(f"inference on {batch.shape} → class map {classes.shape}, "
          f"classes present: {sorted(np.unique(classes).tolist())}")
    print("checkpoints:", sorted(p.name for p in Path(best).parent.glob("*.ckpt")))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(Path(sys.argv[1]))
    else:
        with tempfile.TemporaryDirectory() as td:
            main(Path(td))
