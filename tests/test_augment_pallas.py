"""Pallas fused-augmentation kernel parity vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.data.augment import augment_batch

MEAN = (0.3661029729, 0.3875165941, 0.3501133538, 0.5797285859)
STD = (0.2388708549, 0.2103625723, 0.2050272174, 0.2025812523)


def test_pallas_matches_xla_path():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (8, 32, 32, 4), dtype=np.uint8)
    mask = rng.integers(0, 3, (8, 32, 32)).astype(np.int32)

    key = jax.random.PRNGKey(123)
    ref = augment_batch(key, jnp.asarray(img), jnp.asarray(mask), train=True)
    fused = augment_batch(
        key, jnp.asarray(img), jnp.asarray(mask), train=True, use_pallas=True
    )

    assert np.allclose(np.asarray(ref["image"]), np.asarray(fused["image"]),
                       atol=1e-5), "pallas image path diverges from XLA path"
    assert np.array_equal(np.asarray(ref["mask"]), np.asarray(fused["mask"]))


def test_pallas_val_path_noop():
    # use_pallas only affects the train path; val output identical
    img = np.full((2, 16, 16, 4), 100, np.uint8)
    a = augment_batch(jax.random.PRNGKey(0), jnp.asarray(img), train=False)
    b = augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(img), train=False, use_pallas=True
    )
    assert np.array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
