"""Test-time augmentation: dihedral-group logit ensembling on device.

The reference trains with HFlip/VFlip/RandomRotate90 augmentation
(/root/reference/deadtrees/data/deadtreedata.py:132-146) but predicts each
tile in a single orientation (deployment/inference.py:56-62). Averaging the
model over the same symmetry group it was trained under is the standard
segmentation accuracy lever the reference leaves on the table — and on TPU
the extra views are pure compute: rot90/flip are free layout remaps fused
into the surrounding program, no host round-trips.

``make_tta_fn`` wraps a logits function so it runs every orientation of the
dihedral group (4 rotations × optional horizontal flip = 8 views, or the
4-view rotation subgroup), maps each view's logits back to the input frame,
and averages class probabilities. Averaging over the FULL group makes the
wrapped predictor exactly equivariant: predicting a flipped tile gives the
flipped prediction (tested in tests/test_tta.py).

Views run through ``lax.map`` so peak activation memory stays at one batch
regardless of the view count.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

__all__ = ["DIHEDRAL", "ROTATIONS", "apply_view", "invert_view", "make_tta_fn"]

# (k, flip): rotate by k*90° counter-clockwise over (H, W), then optionally
# flip along W. The inverse undoes in reverse order.
ROTATIONS: List[Tuple[int, bool]] = [(k, False) for k in range(4)]
DIHEDRAL: List[Tuple[int, bool]] = ROTATIONS + [(k, True) for k in range(4)]


def apply_view(x: jnp.ndarray, k: int, flip: bool) -> jnp.ndarray:
    """Transform an NHWC (or NHW...) batch into view (k, flip)."""
    x = jnp.rot90(x, k, axes=(1, 2))
    if flip:
        x = jnp.flip(x, axis=2)
    return x


def invert_view(y: jnp.ndarray, k: int, flip: bool) -> jnp.ndarray:
    """Map view-(k, flip) outputs back to the input frame."""
    if flip:
        y = jnp.flip(y, axis=2)
    return jnp.rot90(y, -k, axes=(1, 2))


def make_tta_fn(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    views: int = 8,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Wrap ``logits_fn(img_nhwc) -> logits_nhwc`` with ``views``-fold TTA.

    ``views`` is 8 (full dihedral group — matches the reference's train-time
    HFlip⊕VFlip⊕Rot90 augmentation orbit) or 4 (rotations only). Returns a
    function producing the MEAN SOFTMAX PROBABILITIES over all views in the
    input frame; callers argmax as usual. Requires square spatial dims (the
    model must accept rot90'd inputs — true for H == W).
    """
    if views == 8:
        group = DIHEDRAL
    elif views == 4:
        group = ROTATIONS
    else:
        raise ValueError(f"views must be 4 or 8, got {views}")

    def tta(img: jnp.ndarray) -> jnp.ndarray:
        if img.shape[1] != img.shape[2]:
            raise ValueError(
                f"TTA needs square tiles (rot90 views), got {img.shape}"
            )
        # static unroll: each view's forward chains through the accumulator,
        # so only one view's activations are live at a time; the rot90/flip
        # remaps fuse into the adjacent convs
        acc = None
        for k, f in group:
            probs = jax.nn.softmax(logits_fn(apply_view(img, k, f)), axis=-1)
            inv = invert_view(probs, k, f)
            acc = inv if acc is None else acc + inv
        return acc / len(group)

    return tta
