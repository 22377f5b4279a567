"""Compound-loss suite for dead-tree segmentation.

JAX re-implementations, with identical numerics (EPS placement, idc class
filtering, reduction order), of the reference loss library:

- boundary-loss suite (/root/reference/deadtrees/loss/losses.py:181-291):
  CrossEntropy, GeneralizedDice, DiceLoss, SurfaceLoss/BoundaryLoss, FocalLoss
- alternative GDL used for the "GDICE" config (/root/reference/deadtrees/loss/gdl.py:6-27)
- Generalized Wasserstein Dice Loss (/root/reference/deadtrees/loss/gwdl.py:18-253)

All functions take channel-LAST tensors: ``probs`` is softmax output
(B, H, W, K) and ``target`` is one-hot (B, H, W, K). Since every reduction is
a global or per-class sum, values match the reference's channel-first math
exactly. Losses are plain callables (dataclass-style objects with static
config), safe to close over inside ``jax.jit``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-10


def _take_idc(x: jnp.ndarray, idc: Tuple[int, ...]) -> jnp.ndarray:
    """Filter the class (last) axis with static indices (reference's `idc`).

    Contiguous index runs use a plain slice: an index-array gather here
    differentiates into a scatter-add that XLA lowers as a serial `while`
    over (B, H, W, K) — measured ~9 ms/step of the bs-128 train backward
    (PERF.md r3). Slices transpose to pad ops instead.
    """
    lo, hi = min(idc), max(idc)
    if tuple(idc) == tuple(range(lo, hi + 1)):
        return x[..., lo : hi + 1]
    return x[..., jnp.asarray(idc)]


class CrossEntropy:
    """Masked cross-entropy (reference losses.py:181-196)."""

    def __init__(self, *, idc: Sequence[int]):
        self.idc = tuple(idc)

    def __call__(self, probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        log_p = jnp.log(_take_idc(probs, self.idc).astype(jnp.float32) + 1e-10)
        mask = _take_idc(target, self.idc).astype(jnp.float32)
        loss = -jnp.sum(mask * log_p)
        return loss / (jnp.sum(mask) + 1e-10)


class GeneralizedDice:
    """Boundary-loss-repo GDL variant (reference losses.py:199-223).

    Per-sample inverse-squared-volume class weights; kept for parity although
    the reference's "GDICE" config uses :class:`GeneralizedDiceLoss` below.
    """

    def __init__(self, *, idc: Sequence[int]):
        self.idc = tuple(idc)

    def __call__(self, probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pc = _take_idc(probs, self.idc).astype(jnp.float32)
        tc = _take_idc(target, self.idc).astype(jnp.float32)

        # sums over spatial dims -> (B, K)
        w = 1.0 / (jnp.sum(tc, axis=(1, 2)) ** 2 + EPS)
        intersection = w * jnp.sum(pc * tc, axis=(1, 2))
        union = w * (jnp.sum(pc, axis=(1, 2)) + jnp.sum(tc, axis=(1, 2)))

        divided = 1.0 - 2.0 * (jnp.sum(intersection, axis=1) + EPS) / (
            jnp.sum(union, axis=1) + EPS
        )
        return jnp.mean(divided)


class GeneralizedDiceLoss:
    """The GDL actually used for the "GDICE" loss config (reference gdl.py:6-27).

    Class weights are the inverse squared class volume summed over the whole
    batch; the final ratio folds the batch in too (no per-sample mean).
    """

    def __call__(self, probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        inp = probs.astype(jnp.float32)
        targ = target.astype(jnp.float32)

        # sums over (B, H, W) -> (K,)
        w = 1.0 / (jnp.sum(targ, axis=(0, 1, 2)) ** 2 + 1e-9)
        numerator = jnp.sum(w * jnp.sum(targ * inp, axis=(0, 1, 2)))
        denominator = jnp.sum(w * jnp.sum(targ + inp, axis=(0, 1, 2)))

        dice = 2.0 * (numerator + 1e-9) / (denominator + 1e-9)
        return 1.0 - dice


class DiceLoss:
    """Plain per-(batch, class) dice loss (reference losses.py:226-247)."""

    def __init__(self, *, idc: Sequence[int]):
        self.idc = tuple(idc)

    def __call__(self, probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pc = _take_idc(probs, self.idc).astype(jnp.float32)
        tc = _take_idc(target, self.idc).astype(jnp.float32)

        intersection = jnp.sum(pc * tc, axis=(1, 2))  # (B, K)
        union = jnp.sum(pc, axis=(1, 2)) + jnp.sum(tc, axis=(1, 2))

        divided = 1.0 - (2.0 * intersection + EPS) / (union + EPS)
        return jnp.mean(divided)


class SurfaceLoss:
    """Boundary (surface) loss (reference losses.py:250-267).

    ``dist_maps`` are the signed distance maps from
    :func:`deadtrees_tpu.losses.functional.one_hot2dist`.
    """

    def __init__(self, *, idc: Sequence[int]):
        self.idc = tuple(idc)

    def __call__(self, probs: jnp.ndarray, dist_maps: jnp.ndarray) -> jnp.ndarray:
        pc = _take_idc(probs, self.idc).astype(jnp.float32)
        dc = _take_idc(dist_maps, self.idc).astype(jnp.float32)
        return jnp.mean(pc * dc)


BoundaryLoss = SurfaceLoss


class FocalLoss:
    """Multi-class focal loss (reference losses.py:273-291)."""

    def __init__(self, *, idc: Sequence[int], gamma: float = 2.0):
        self.idc = tuple(idc)
        self.gamma = gamma

    def __call__(self, probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        masked_probs = _take_idc(probs, self.idc)
        log_p = jnp.log(masked_probs + EPS)
        mask = _take_idc(target, self.idc).astype(jnp.float32)

        w = (1.0 - masked_probs) ** self.gamma
        loss = -jnp.sum(w * mask * log_p)
        return loss / (jnp.sum(mask) + EPS)


class GeneralizedWassersteinDiceLoss:
    """Generalized Wasserstein Dice Loss (reference gwdl.py:18-253).

    Takes LOGITS (B, H, W, K) and integer targets (B, H, W) like the
    reference's forward (softmax applied internally, gwdl.py:106). Supports
    the 'default' (alpha = 1 for foreground, 0 for background) and 'GDL'
    weighting modes.
    """

    def __init__(self, dist_matrix, weighting_mode: str = "default", reduction: str = "mean"):
        if weighting_mode not in ("default", "GDL"):
            raise ValueError(f"weighting_mode must be 'default' or 'GDL', got {weighting_mode}")
        m = np.asarray(dist_matrix, dtype=np.float32)
        if m.max() != 1.0:
            m = m / m.max()
        self.M = jnp.asarray(m)
        self.num_classes = m.shape[0]
        self.alpha_mode = weighting_mode
        self.reduction = reduction

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        epsilon = float(np.spacing(1))
        b = logits.shape[0]
        k = logits.shape[-1]

        flat_logits = logits.reshape(b, -1, k)  # (B, S, K)
        flat_target = target.reshape(b, -1).astype(jnp.int32)  # (B, S)

        probs = jax.nn.softmax(flat_logits, axis=-1)

        # Wasserstein distance map (gwdl.py:140-185): per voxel, the row of M
        # selected by the true class, dotted with the predicted distribution.
        m_rows = self.M[flat_target]  # (B, S, K)
        wass_dist_map = jnp.sum(m_rows * probs, axis=-1)  # (B, S)

        one_hot_t = jax.nn.one_hot(flat_target, self.num_classes)  # (B, S, K)
        if self.alpha_mode == "GDL":
            volumes = jnp.sum(one_hot_t, axis=1)  # (B, K)
            alpha = 1.0 / (volumes + 1.0)
        else:
            alpha = jnp.ones((b, self.num_classes)).at[:, 0].set(0.0)

        alpha_per_voxel = jnp.take_along_axis(
            alpha[:, None, :].repeat(flat_target.shape[1], axis=1),
            flat_target[..., None],
            axis=-1,
        )[..., 0]  # (B, S)

        true_pos = jnp.sum(alpha_per_voxel * (1.0 - wass_dist_map), axis=1)  # (B,)
        if self.alpha_mode == "GDL":
            denom = jnp.sum(alpha_per_voxel * (2.0 - wass_dist_map), axis=1)
        else:
            all_error = jnp.sum(wass_dist_map, axis=1)
            denom = 2.0 * true_pos + all_error

        wass_dice = (2.0 * true_pos + epsilon) / (denom + epsilon)
        loss = 1.0 - wass_dice

        if self.reduction == "sum":
            return jnp.sum(loss)
        if self.reduction == "none":
            return loss
        return jnp.mean(loss)
