"""Fused CHW decoder: full-model parity vs the flax EfficientUnet++."""

import jax
import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.models import create_model, init_model
from deadtrees_tpu.ops.fused_decoder import fold_effunetpp_decoder, fused_forward


def test_fused_forward_matches_flax():
    model = create_model(
        "efficientunet++",
        "timm-efficientnet-b0",
        in_channels=4,
        classes=3,
        decoder_channels=(24, 16, 16, 8, 8),
        dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    # randomize BN stats so folding is exercised
    rng = np.random.default_rng(1)

    def jiggle(path, leaf):
        name = jax.tree_util.keystr(path)
        if "mean" in name:
            return jnp.asarray(rng.uniform(-0.2, 0.2, leaf.shape), leaf.dtype)
        if "var" in name:
            return jnp.asarray(rng.uniform(0.8, 1.2, leaf.shape), leaf.dtype)
        return leaf

    variables = jax.tree_util.tree_map_with_path(jiggle, variables)

    img = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 32, 32, 4)).astype(np.float32)
    )
    ref = model.apply(variables, img, train=False)

    folded = fold_effunetpp_decoder(variables)
    out = fused_forward(model, variables, folded, img, interpret=True)

    assert out.shape == ref.shape
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 5e-3, f"max err {err}"

    # the r3 fat-cell NHWC layout must match too (same folded params)
    out2 = fused_forward(
        model, variables, folded, img, interpret=True, layout="nhwc"
    )
    err2 = np.abs(np.asarray(out2) - np.asarray(ref)).max()
    assert err2 < 5e-3, f"nhwc max err {err2}"


def test_engine_fused_decoder_flag(tmp_path):
    """JaxInference(fused_decoder=True) matches the flax engine."""
    from deadtrees_tpu.core import save_checkpoint
    from deadtrees_tpu.infer import JaxInference

    hp = dict(
        architecture="efficientunet++",
        encoder_name="timm-efficientnet-b0",
        in_channels=4,
        classes=3,
        decoder_channels=[24, 16, 16, 8, 8],
    )
    model = create_model(**hp, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    path = tmp_path / "m.ckpt"
    save_checkpoint(
        path, params=variables["params"], batch_stats=variables["batch_stats"],
        hparams=hp,
    )
    img = np.random.default_rng(0).integers(0, 255, (1, 32, 32, 4), np.uint8)
    a = JaxInference(path).run(img)
    b = JaxInference(path, fused_decoder=True).run(img)
    assert (a != b).mean() < 1e-2

    # batch-size-aware "auto": ≤32 images route through the CHW kernels,
    # bigger batches through flax — both must match the plain engine
    auto = JaxInference(path, fused_decoder="auto")
    assert (auto.run(img) != a).mean() < 1e-2
    big = np.random.default_rng(1).integers(0, 255, (33, 32, 32, 4), np.uint8)
    np.testing.assert_array_equal(
        auto.run(big), JaxInference(path).run(big)
    )


def test_engine_true_routes_chw_and_validates_args(tmp_path, monkeypatch):
    """fused_decoder=True keeps its historical CHW meaning (the measured
    small-batch win), and unknown engine knob values raise instead of
    silently running the default path."""
    from deadtrees_tpu.core import save_checkpoint
    from deadtrees_tpu.infer import JaxInference

    hp = dict(
        architecture="efficientunet++",
        encoder_name="timm-efficientnet-b0",
        in_channels=4,
        classes=3,
        decoder_channels=[24, 16, 16, 8, 8],
    )
    model = create_model(**hp, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    path = tmp_path / "m.ckpt"
    save_checkpoint(
        path, params=variables["params"], batch_stats=variables["batch_stats"],
        hparams=hp,
    )

    seen = {}
    import deadtrees_tpu.ops.fused_decoder as fd

    real = fd.fused_forward

    def spy(model, variables, folded, img, **kw):
        seen["layout"] = kw.get("layout")
        return real(model, variables, folded, img, **kw)

    # engine.__init__ imports fused_forward from the module at construction
    # time, so patching the module attr before constructing is sufficient
    monkeypatch.setattr(fd, "fused_forward", spy)
    img = np.random.default_rng(0).integers(0, 255, (1, 32, 32, 4), np.uint8)
    JaxInference(path, fused_decoder=True).run(img)
    assert seen["layout"] == "chw"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="quantized"):
        JaxInference(path, quantized="int8")
    with _pytest.raises(ValueError, match="fused_decoder"):
        JaxInference(path, fused_decoder="fast")
    with _pytest.raises(ValueError, match="cannot be combined"):
        JaxInference(path, quantized="w8a8", fused_decoder="auto")
    with _pytest.raises(ValueError, match="quant_sites"):
        JaxInference(path, quantized="w8a8", quant_sites=("y", "q"))
