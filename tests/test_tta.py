"""Test-time augmentation: view transforms, group equivariance, engine knob.

The TTA wrapper (infer/tta.py) must (a) invert every dihedral view exactly,
(b) make the ensembled predictor EQUIVARIANT under the group it averages
over — predicting a transformed tile gives the transformed prediction —
and (c) ride the JaxInference(tta=) knob. The reference has no TTA
(deployment/inference.py:56-62 predicts one orientation); this is an
accuracy capability on top of parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.infer.tta import (
    DIHEDRAL,
    ROTATIONS,
    apply_view,
    invert_view,
    make_tta_fn,
)


def test_view_roundtrip_all_eight():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)))
    for k, f in DIHEDRAL:
        np.testing.assert_array_equal(
            np.asarray(invert_view(apply_view(x, k, f), k, f)), np.asarray(x)
        )


def test_views_are_distinct():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    seen = {np.asarray(apply_view(x, k, f)).tobytes() for k, f in DIHEDRAL}
    assert len(seen) == 8


def _conv_logits_fn(key, cin=4, classes=3):
    """A deliberately asymmetric 'model': one 3x3 conv, random kernel."""
    kern = jax.random.normal(key, (3, 3, cin, classes))

    def logits_fn(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return logits_fn


@pytest.mark.parametrize("views", [4, 8])
def test_tta_group_equivariance(views):
    """Averaging over a group makes the predictor equivariant under it:
    tta(g(x)) == g(tta(x)) for every g in the group."""
    logits_fn = _conv_logits_fn(jax.random.PRNGKey(1))
    tta = make_tta_fn(logits_fn, views)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 16, 16, 4)).astype(np.float32)
    )
    base = np.asarray(tta(x))
    group = DIHEDRAL if views == 8 else ROTATIONS
    for k, f in group:
        lhs = np.asarray(tta(apply_view(x, k, f)))
        rhs = np.asarray(apply_view(jnp.asarray(base), k, f))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_tta_is_probability_map():
    tta = make_tta_fn(_conv_logits_fn(jax.random.PRNGKey(3)), 8)
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 8, 8, 4)).astype(np.float32)
    )
    probs = np.asarray(tta(x))
    assert probs.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert (probs >= 0).all()


def test_tta_rejects_non_square_and_bad_views():
    fn = _conv_logits_fn(jax.random.PRNGKey(5))
    with pytest.raises(ValueError, match="views"):
        make_tta_fn(fn, 3)
    tta = make_tta_fn(fn, 4)
    with pytest.raises(ValueError, match="square"):
        tta(jnp.zeros((1, 8, 16, 4)))


def test_engine_tta_knob(tmp_path):
    from deadtrees_tpu.core import save_checkpoint
    from deadtrees_tpu.infer import JaxInference
    from deadtrees_tpu.models import create_model, init_model

    hp = dict(
        architecture="unet", encoder_name="resnet18", in_channels=4,
        classes=3, decoder_channels=[16, 16, 8, 8, 8],
    )
    model = create_model(**hp, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    path = tmp_path / "m.ckpt"
    save_checkpoint(
        path, params=variables["params"], batch_stats=variables["batch_stats"],
        hparams=hp,
    )

    batch = np.random.default_rng(0).integers(
        0, 255, (2, 32, 32, 4), dtype=np.uint8
    )
    plain = JaxInference(path).run(batch)
    tta = JaxInference(path, tta=True)
    assert tta.tta_views == 8
    out = tta.run(batch)
    assert out.shape == plain.shape and out.dtype == plain.dtype
    assert set(np.unique(out)) <= {0, 1, 2}

    with pytest.raises(ValueError, match="tta"):
        JaxInference(path, tta=5)
    with pytest.raises(ValueError, match="standard predict path"):
        JaxInference(path, tta=True, fused_decoder="auto")


def test_scene_predictor_tta(tmp_path):
    from deadtrees_tpu.core import save_checkpoint
    from deadtrees_tpu.infer import JaxInference, predict_scene
    from deadtrees_tpu.models import create_model, init_model

    hp = dict(
        architecture="unet", encoder_name="resnet18", in_channels=4,
        classes=3, decoder_channels=[16, 16, 8, 8, 8],
    )
    model = create_model(**hp, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    scene = np.random.default_rng(1).integers(
        0, 255, (50, 60, 4), dtype=np.uint8
    )
    out = predict_scene(
        model, variables, scene,
        tile_shape=(64, 64), subtile=32, batch_size=4, tta=4,
    )
    assert out.shape == (50, 60)
    assert set(np.unique(out)) <= {0, 1, 2}
