"""SegFormer stretch-model tests (BASELINE config 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.models import create_model


def test_segformer_shapes_eval_shape():
    model = create_model("segformer", "mit-b0", in_channels=4, classes=3)
    x = jax.ShapeDtypeStruct((2, 64, 64, 4), jnp.float32)
    variables = jax.eval_shape(
        lambda xx: model.init(jax.random.PRNGKey(0), xx, train=False), x
    )
    logits = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False), variables, x
    )
    assert logits.shape == (2, 64, 64, 3)
    assert logits.dtype == jnp.float32
    n = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
    )
    assert 3e6 < n < 6e6, f"mit-b0 ~3.7M params, got {n/1e6:.1f}M"


def test_segformer_forward_and_grad():
    model = create_model(
        "segformer", "mit-b0", in_channels=4, classes=3, dtype=jnp.float32
    )
    # 64² min: at 32² the last stage has ONE token, so softmax(QK) is
    # constant and Q/K projections get structurally zero grads
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 64, 64, 4)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(logits)))

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        return jnp.mean(out**2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert sum(int(np.any(np.asarray(g) != 0)) for g in flat) / len(flat) > 0.9
