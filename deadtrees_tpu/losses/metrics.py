"""Segmentation metrics.

- :func:`fscore` mirrors ``segmentation_models_pytorch.utils.metrics.Fscore``
  as used by the reference model (/root/reference/deadtrees/network/segmodel.py:145-149):
  global (not per-class) F-beta over thresholded probabilities with an
  optional channel-exclusion list (``ignore_channels=[0]`` drops background).
- :func:`dice_score` mirrors MONAI's ``DiceMetric`` (per-batch-item,
  per-class dice with NaN for empty ground-truth classes, nan-mean
  reduction), the oracle used by the reference golden tests
  (/root/reference/tests/test_dice_metric.py:27-72).
- :func:`confusion_matrix` mirrors ``torchmetrics.functional.confusion_matrix``
  with optional ``normalize='true'`` (segmodel.py:300-309).

All functions take channel-last tensors (B, H, W, K) and are jittable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def _threshold(x: jnp.ndarray, threshold: Optional[float]) -> jnp.ndarray:
    if threshold is None:
        return x
    return (x > threshold).astype(x.dtype)


def _take_channels(
    x: jnp.ndarray, num_classes: int, ignore_channels: Optional[Sequence[int]]
) -> jnp.ndarray:
    if not ignore_channels:
        return x
    keep = tuple(i for i in range(num_classes) if i not in set(ignore_channels))
    lo, hi = min(keep), max(keep)
    if keep == tuple(range(lo, hi + 1)):  # contiguous: slice, not gather
        return x[..., lo : hi + 1]
    return x[..., jnp.asarray(keep)]


def fscore(
    probs: jnp.ndarray,
    target: jnp.ndarray,
    *,
    beta: float = 1.0,
    eps: float = 1e-7,
    threshold: Optional[float] = 0.5,
    ignore_channels: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Global F-beta score over a batch of (B, H, W, K) probabilities.

    Matches smp's functional ``f_score``: threshold -> drop ignored channels
    -> single global tp/fp/fn over all remaining elements.
    """
    k = probs.shape[-1]
    pr = _threshold(probs.astype(jnp.float32), threshold)
    pr = _take_channels(pr, k, ignore_channels)
    gt = _take_channels(target.astype(jnp.float32), k, ignore_channels)

    tp = jnp.sum(gt * pr)
    fp = jnp.sum(pr) - tp
    fn = jnp.sum(gt) - tp

    b2 = beta**2
    return ((1 + b2) * tp + eps) / ((1 + b2) * tp + b2 * fn + fp + eps)


def dice_score(
    pred_one_hot: jnp.ndarray,
    target_one_hot: jnp.ndarray,
    *,
    include_background: bool = True,
) -> jnp.ndarray:
    """MONAI-style mean dice over (B, H, W, K) one-hot tensors.

    Per (batch, class) dice 2|p∩t| / (|p| + |t|); classes absent from BOTH
    the ground truth and the prediction contribute NaN and are excluded from
    the mean (nan-mean), matching MONAI's ``DiceMetric(reduction="mean")``.
    """
    p = pred_one_hot.astype(jnp.float32)
    t = target_one_hot.astype(jnp.float32)
    if not include_background:
        p = p[..., 1:]
        t = t[..., 1:]

    inter = jnp.sum(p * t, axis=(1, 2))  # (B, K)
    denom = jnp.sum(p, axis=(1, 2)) + jnp.sum(t, axis=(1, 2))

    dice = jnp.where(denom > 0, 2.0 * inter / denom, jnp.nan)
    # MONAI marks classes with empty ground truth as NaN even if denom > 0
    gt_empty = jnp.sum(t, axis=(1, 2)) == 0
    dice = jnp.where(gt_empty, jnp.nan, dice)
    return jnp.nanmean(dice)


def confusion_matrix(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    num_classes: int,
    normalize: Optional[str] = None,
) -> jnp.ndarray:
    """Confusion matrix over integer label arrays of any (equal) shape.

    ``cm[i, j]`` counts pixels with true class i predicted as class j.
    ``normalize='true'`` row-normalizes over the true class (torchmetrics
    semantics); rows with zero support become all-zero (torchmetrics yields
    NaN there, which the reference only ever feeds to plotting).
    """
    t = target.reshape(-1).astype(jnp.int32)
    p = pred.reshape(-1).astype(jnp.int32)
    idx = t * num_classes + p
    cm = jnp.bincount(idx, length=num_classes * num_classes).reshape(
        num_classes, num_classes
    )
    if normalize is None:
        return cm
    if normalize == "true":
        row = jnp.sum(cm, axis=1, keepdims=True)
        return jnp.where(row > 0, cm / jnp.maximum(row, 1), 0.0)
    raise ValueError(f"Unsupported normalize mode: {normalize}")


def masked_confusion_matrix(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    num_classes: int,
    normalize: Optional[str] = None,
) -> jnp.ndarray:
    """Confusion matrix restricted to pixels where ``mask == 1``.

    Jit-friendly equivalent of the reference's boolean-index subsetting by
    the forest land-use layer (segmodel.py:296-309): instead of a dynamic
    gather, masked-out pixels are scattered into a scratch bin and dropped.
    """
    t = target.reshape(-1).astype(jnp.int32)
    p = pred.reshape(-1).astype(jnp.int32)
    m = mask.reshape(-1) == 1
    idx = jnp.where(m, t * num_classes + p, num_classes * num_classes)
    cm = jnp.bincount(idx, length=num_classes * num_classes + 1)[:-1].reshape(
        num_classes, num_classes
    )
    if normalize is None:
        return cm
    if normalize == "true":
        row = jnp.sum(cm, axis=1, keepdims=True)
        return jnp.where(row > 0, cm / jnp.maximum(row, 1), 0.0)
    raise ValueError(f"Unsupported normalize mode: {normalize}")
