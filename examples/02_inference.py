"""Inference walkthrough — the reference's notebooks/02-Inference.ipynb as a
runnable script.

Covers every serving surface on a tiny model: batch inference
(JaxInference), whole-scene sliding-window prediction (Tiler +
predict_scene), ensemble majority vote, the AOT export artifact, and the
quantized/packed serving options. CPU-sized; the same code runs on TPU.

    python examples/02_inference.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

# Pin CPU before first JAX use (the config API wins even on TPU VMs where
# the plugin overrides the JAX_PLATFORMS env var). Set
# DEADTREES_EXAMPLE_TPU=1 to run on the accelerator instead.
if not os.environ.get("DEADTREES_EXAMPLE_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def make_checkpoint(path: Path, seed: int = 0) -> Path:
    """A tiny trained-shape checkpoint (random init — mechanics, not
    quality; examples/01_training.py produces a real one)."""
    import jax

    from deadtrees_tpu.core.checkpoint import save_checkpoint
    from deadtrees_tpu.models.factory import create_model, init_model

    hparams = dict(
        architecture="unet",
        encoder_name="resnet18",
        decoder_channels=[16, 16, 8, 8, 8],
        classes=3,
        in_channels=4,
    )
    import jax.numpy as jnp

    model = create_model(**hparams, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(seed), image_size=64)
    save_checkpoint(
        path,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        hparams=hparams,
    )
    return path


def main(workdir: Path) -> None:
    from deadtrees_tpu.infer.engine import (
        EnsembleInference,
        ExportedInference,
        JaxInference,
    )

    ckpt = make_checkpoint(workdir / "model.ckpt")

    # ------------------------------------------------------------------ #
    # 1. Batch inference: (B, H, W, 4) uint8 → (B, H, W) class map.
    #    Normalization happens in-graph (uint8 on the wire, 4× less H2D).
    # ------------------------------------------------------------------ #
    engine = JaxInference(ckpt)
    rng = np.random.default_rng(1)
    tiles = rng.integers(0, 255, (4, 64, 64, 4), dtype=np.uint8)
    classes = engine.run(tiles)
    print(f"batch: {tiles.shape} → {classes.shape} "
          f"(classes {sorted(np.unique(classes).tolist())})")

    # ------------------------------------------------------------------ #
    # 2. Whole-scene inference: one orthophoto → one stitched class map.
    #    The tiler pads the scene, the compiled program predicts and
    #    stitches all subtiles on device in a single dispatch, and the
    #    class map travels back 2-bit packed (4 px/byte).
    # ------------------------------------------------------------------ #
    from deadtrees_tpu.infer.sliding import predict_scene

    scene = rng.integers(0, 255, (200, 300, 4), dtype=np.uint8)
    scene_map = predict_scene(
        engine.model,
        engine.variables,
        scene,  # padded up to tile_shape, cropped back after stitching
        tile_shape=(256, 320),
        subtile=64,
        batch_size=8,
    )
    print(f"scene: {scene.shape} → {scene_map.shape}")
    assert scene_map.shape == scene.shape[:2]

    # ------------------------------------------------------------------ #
    # 3. Ensembles: odd number of members, pixelwise majority vote
    #    (reference deployment/inference.py:65-116). Homogeneous members
    #    run vmapped in one program; mixed architectures fall back to
    #    sequential members with the same vote.
    # ------------------------------------------------------------------ #
    members = [ckpt, make_checkpoint(workdir / "m2.ckpt", seed=2),
               make_checkpoint(workdir / "m3.ckpt", seed=3)]
    ensemble = EnsembleInference(members)
    voted = ensemble.run(tiles)
    print(f"ensemble({len(members)}): → {voted.shape}")

    # ------------------------------------------------------------------ #
    # 4. AOT export: a self-contained serving artifact with a symbolic
    #    batch dimension (the reference's create_onnx.py analogue);
    #    quantize=True stores int8 weights (~4× smaller on disk).
    # ------------------------------------------------------------------ #
    from deadtrees_tpu.infer.export import export_inference

    artifact = workdir / "model.jaxexport"
    export_inference(ckpt, artifact, image_size=64)
    exported = ExportedInference(artifact)
    out = exported.run(tiles)
    agree_exported = float((out == classes).mean())
    print(f"exported artifact: {artifact.stat().st_size / 1e6:.1f} MB, "
          f"run → {out.shape}, agreement vs engine {agree_exported:.4f}")
    # not exact equality: the AOT program may fuse in a different order,
    # and a random-init model has near-tied logits on noise inputs — the
    # f32 parity tests measure O(0.4%) argmax flips from accumulation
    # order alone, so the walkthrough bars loosely (trained models with
    # separated logits agree ≥99.9%; see tests/test_checkpoint_engine.py)
    assert agree_exported > 0.98

    # ------------------------------------------------------------------ #
    # 5. Serving knobs (TPU-measured): int8 weight simulation, w8a8
    #    activation storage, latency-routed fused decoder — see
    #    JaxInference's docstring and PERF.md. On CPU just show the API:
    # ------------------------------------------------------------------ #
    int8_engine = JaxInference(ckpt, quantized=True)
    agree = float((int8_engine.run(tiles) == classes).mean())
    print(f"int8 weight round-trip argmax agreement: {agree:.4f}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(Path(sys.argv[1]))
    else:
        with tempfile.TemporaryDirectory() as td:
            main(Path(td))
