"""Model zoo tests: shapes, dispatch, gradient flow.

Mirrors the reference's implicit contract (segmodel.py:61-75 dispatch; all
architectures map (B, C, H, W) -> (B, classes, H, W) logits — here NHWC).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.models import (
    ARCHITECTURES,
    canonical_architecture,
    create_model,
    get_encoder,
    init_model,
)


def test_architecture_aliases():
    assert canonical_architecture("Unet++") == "unetplusplus"
    assert canonical_architecture("EfficientUnet++ ") == "efficientunetplusplus"
    assert canonical_architecture("resunet") == "resunet"
    with pytest.raises(NotImplementedError):
        canonical_architecture("segnet")


@pytest.mark.parametrize(
    "name,expected",
    [
        ("resnet18", (4, 64, 64, 128, 256, 512)),
        ("resnet34", (4, 64, 64, 128, 256, 512)),
        ("resnet50", (4, 64, 256, 512, 1024, 2048)),
        ("timm-efficientnet-b5", (4, 48, 40, 64, 176, 512)),
        ("timm-efficientnet-b4", (4, 48, 32, 56, 160, 448)),
        ("timm-efficientnet-b0", (4, 32, 24, 40, 112, 320)),
    ],
)
def test_encoder_out_channels(name, expected):
    """Registry values AND the actual feature-pyramid shapes (via eval_shape —
    CPU XLA compiles of the big encoders are too slow for a unit test)."""
    enc, out_channels = get_encoder(name, in_channels=4)
    assert out_channels == expected
    x = jax.ShapeDtypeStruct((1, 64, 64, 4), jnp.float32)
    variables = jax.eval_shape(lambda xx: enc.init(jax.random.PRNGKey(0), xx), x)
    feats = jax.eval_shape(
        lambda v, xx: enc.apply(v, xx, train=False), variables, x
    )
    assert len(feats) == 6
    for i, (f, c) in enumerate(zip(feats, expected)):
        assert f.shape[-1] == c, f"level {i}: {f.shape} vs {c}"
        assert f.shape[1] == 64 // (2**i)


@pytest.mark.parametrize("arch", ARCHITECTURES)
def test_model_forward_shapes(arch):
    model = create_model(
        arch,
        "resnet18",
        in_channels=4,
        classes=3,
        decoder_channels=(64, 32, 16, 8, 8),
        dtype=jnp.float32,
    )
    x = jax.ShapeDtypeStruct((2, 64, 64, 4), jnp.float32)
    variables = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x
    )
    logits = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False), variables, x
    )
    assert logits.shape == (2, 64, 64, 3)
    assert logits.dtype == jnp.float32


def test_flagship_b5_shapes():
    """Model of record (configs/model/default.yaml:4-8) at full tile size."""
    model = create_model(
        "efficientunet++",
        "timm-efficientnet-b5",
        in_channels=4,
        classes=3,
        decoder_channels=(256, 128, 64, 32, 16),
    )
    x = jax.ShapeDtypeStruct((32, 256, 256, 4), jnp.float32)
    variables = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x
    )
    logits = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False), variables, x
    )
    assert logits.shape == (32, 256, 256, 3)
    n_params = sum(
        np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"])
    )
    # efficientnet-b5 backbone alone is ~28M params; full model well above
    assert n_params > 20e6, f"suspiciously small flagship: {n_params/1e6:.1f}M"


def test_efficientunetpp_effnet_forward():
    """Flagship combo: EfficientUnet++/efficientnet-b0 (b5 is too slow for CI)."""
    model = create_model(
        "efficientunet++",
        "timm-efficientnet-b0",
        in_channels=4,
        classes=3,
        decoder_channels=(64, 32, 16, 8, 8),
        dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=64)
    x = jnp.ones((1, 64, 64, 4))
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_batchnorm_mutable_train_step():
    model = create_model(
        "unet", "resnet18", in_channels=4, classes=2,
        decoder_channels=(32, 16, 8, 8, 8), dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
    logits, new_state = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert logits.shape == (2, 32, 32, 2)
    # running stats must actually move
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_gradients_flow_everywhere():
    model = create_model(
        "unet", "resnet18", in_channels=3, classes=2,
        decoder_channels=(32, 16, 8, 8, 8), dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))

    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        return jnp.mean(logits**2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    n_nonzero = sum(int(np.any(np.asarray(g) != 0)) for g in flat)
    assert n_nonzero / len(flat) > 0.95


def test_partwise_grid_matches_default(monkeypatch, rng):
    """Opt-in partwise/lowres grid must be numerically equivalent to the
    default concat path (same params, same logits)."""

    import jax
    import jax.numpy as jnp

    from deadtrees_tpu.models import create_model, init_model

    model = create_model(
        "efficientunet++", "timm-efficientnet-b0", in_channels=4, classes=3,
        decoder_channels=(16, 16, 8, 8, 8), dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 4)).astype(np.float32))

    monkeypatch.delenv("DEADTREES_PARTWISE_GRID", raising=False)
    ref = model.apply(variables, x, train=False)

    monkeypatch.setenv("DEADTREES_PARTWISE_GRID", "1")
    monkeypatch.setenv("DEADTREES_LOWRES_EXPAND", "1")
    got = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # per-row gating (DEADTREES_PARTWISE_ROWS): only the listed grid rows
    # go concat-free; result must still match exactly
    monkeypatch.delenv("DEADTREES_PARTWISE_GRID", raising=False)
    monkeypatch.delenv("DEADTREES_LOWRES_EXPAND", raising=False)
    monkeypatch.setenv("DEADTREES_PARTWISE_ROWS", "2,3")
    got2 = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # per-cell gating (DEADTREES_PARTWISE_CELLS): only the named cells go
    # concat-free; result must still match exactly
    monkeypatch.delenv("DEADTREES_PARTWISE_ROWS", raising=False)
    monkeypatch.setenv("DEADTREES_PARTWISE_CELLS", "x_0_3")
    got3 = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # combined expand+skip conv (DEADTREES_COMBINED_EXPAND_SKIP): the IR1
    # Conv_0/Conv_3 pair executes as one output-concat conv — same params,
    # same logits; must also compose with partwise cells
    monkeypatch.delenv("DEADTREES_PARTWISE_CELLS", raising=False)
    monkeypatch.setenv("DEADTREES_COMBINED_EXPAND_SKIP", "1")
    got4 = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    monkeypatch.setenv("DEADTREES_PARTWISE_CELLS", "x_0_3")
    got5 = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got5), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tf_same_pads_math():
    """TF-'SAME' asymmetric padding helper (docs/encoder_audit.md):
    low-first split; equals torch static k//2 padding at stride 1 / odd k."""
    from deadtrees_tpu.models.encoders import _tf_same_pads

    shape = (1, 64, 64, 3)
    assert _tf_same_pads(shape, 3, 2) == [(0, 1), (0, 1)]
    assert _tf_same_pads(shape, 5, 2) == [(1, 2), (1, 2)]
    assert _tf_same_pads(shape, 3, 1) == [(1, 1), (1, 1)]
    assert _tf_same_pads(shape, 5, 1) == [(2, 2), (2, 2)]
    assert _tf_same_pads((1, 65, 65, 3), 3, 2) == [(1, 1), (1, 1)]


def test_effnet_encoder_conventions_change_forward():
    """bn_eps/pad_type must change the forward function (else the
    parity-harness convention sweep would be a no-op) while keeping the
    parameter tree identical (same converted weights load into all four)."""
    import jax

    from deadtrees_tpu.models.encoders import EfficientNetEncoder

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 32, 32, 4)).astype(np.float32)
    )
    base = EfficientNetEncoder(width_mult=1.0, depth_mult=1.0)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    out_base = base.apply(variables, x, train=False)[-1]

    for kwargs in ({"bn_eps": 1e-5}, {"pad_type": "same"}):
        variant = EfficientNetEncoder(width_mult=1.0, depth_mult=1.0, **kwargs)
        ref = jax.tree_util.tree_structure(
            variant.init(jax.random.PRNGKey(0), x, train=False)
        )
        assert ref == jax.tree_util.tree_structure(variables)
        out = variant.apply(variables, x, train=False)[-1]
        assert out.shape == out_base.shape
        assert float(jnp.abs(out - out_base).max()) > 0, kwargs
