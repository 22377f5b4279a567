"""Representation conversions for segmentation targets.

TPU-native counterparts of the utilities in the reference boundary-loss
library (/root/reference/deadtrees/loss/losses.py:114-178): one-hot encoding,
argmax decoding, and the signed-distance-map transform used by the boundary
loss. All functions use channel-LAST layout (B, H, W, K) — the natural layout
for TPU convolutions — and are fully jittable; the exact Euclidean distance
transform is computed on device with parallel scans instead of scipy's
sequential C implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e12  # "infinity" for squared pixel distances; > (2*8192)**2


def class2one_hot(seg: jnp.ndarray, K: int) -> jnp.ndarray:
    """Integer mask (B, H, W) -> one-hot (B, H, W, K).

    Counterpart of ``class2one_hot`` (reference losses.py:124-141), which
    produces (B, K, H, W); we use channel-last.
    """
    return jax.nn.one_hot(seg, K, dtype=jnp.float32)


def probs2class(probs: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, K) probabilities -> (B, H, W) class indices.

    Counterpart of ``probs2class`` (reference losses.py:114-121).
    """
    return jnp.argmax(probs, axis=-1)


def probs2one_hot(probs: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, K) probabilities -> hard one-hot of the argmax.

    Counterpart of ``probs2one_hot`` (reference losses.py:148-156).
    """
    return class2one_hot(probs2class(probs), probs.shape[-1])


def _nearest_true_1d_sq(mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Per-pixel distance (in pixels, not squared) to the nearest True element
    along ``axis``. Pixels in columns with no True element get sqrt(_BIG).

    Implemented with two associative scans (cummax of seed indices forward,
    and the mirrored pass backward) — log-depth and fully parallel on TPU,
    unlike the sequential two-pointer sweep a CPU implementation would use.
    """
    n = mask.shape[axis]
    idx_shape = [1] * mask.ndim
    idx_shape[axis] = n
    idx = jax.lax.broadcasted_iota(jnp.float32, tuple(idx_shape), axis)
    idx = jnp.broadcast_to(idx, mask.shape)

    seed_fwd = jnp.where(mask, idx, -_BIG)
    nearest_before = jax.lax.associative_scan(jnp.maximum, seed_fwd, axis=axis)
    d_before = idx - nearest_before

    seed_bwd = jnp.where(mask, idx, 2 * _BIG)
    nearest_after = jax.lax.associative_scan(
        jnp.minimum, seed_bwd, axis=axis, reverse=True
    )
    d_after = nearest_after - idx

    return jnp.minimum(d_before, d_after)


def edt(mask: jnp.ndarray) -> jnp.ndarray:
    """Exact Euclidean distance to the nearest True pixel of a 2D boolean mask.

    Equivalent to ``scipy.ndimage.distance_transform_edt(~mask)`` — i.e. the
    distance from every pixel to the nearest True pixel (0 on True pixels).
    Pixels of an all-False mask get a large finite value.

    Algorithm: exact two-phase EDT. Phase 1 computes per-column vertical
    distances G with parallel scans; phase 2 takes, for each row, the lower
    envelope min_x' ((x - x')^2 + G[y, x']^2) as a dense broadcast min — an
    O(W^2) formulation that maps onto the TPU VPU far better than the
    sequential Felzenszwalb envelope algorithm.
    """
    h, w = mask.shape
    g = _nearest_true_1d_sq(mask, axis=0)  # (H, W) vertical distance
    g2 = jnp.minimum(g * g, _BIG)
    return jnp.sqrt(_row_envelope_min(g2))


def _row_envelope_min(g2: jnp.ndarray) -> jnp.ndarray:
    """d2[y, x] = min_x' ((x - x')² + g2[y, x']), chunked over row blocks.

    The dense formulation materializes an (H, W, W') intermediate — fine at
    256² (~200 MB for K=3) but ~1.6 GB at 512², which would OOM a 16 GB
    chip during distmap-enabled eval. Processing row blocks of R rows under
    ``lax.map`` bounds the live intermediate at R·W·W' floats (≤ 64 MB)
    while keeping each block a dense VPU-friendly broadcast-min.
    """
    h, w = g2.shape
    x = jax.lax.broadcasted_iota(jnp.float32, (w, w), 0)
    xp = jax.lax.broadcasted_iota(jnp.float32, (w, w), 1)
    dx2 = (x - xp) ** 2  # (W, W')

    # R·W·W' ≤ 16M floats (64 MB); at least 8 rows per block
    chunk = int(min(h, max(8, (16 * 2**20) // (w * w))))
    if h % chunk == 0 and h // chunk > 1:
        blocks = g2.reshape(h // chunk, chunk, w)
        d2 = jax.lax.map(
            lambda b: jnp.min(dx2[None, :, :] + b[:, None, :], axis=-1),
            blocks,
        )
        return d2.reshape(h, w)
    return jnp.min(dx2[None, :, :] + g2[:, None, :], axis=-1)


def one_hot2dist(seg: jnp.ndarray) -> jnp.ndarray:
    """Signed distance map for the boundary loss.

    Counterpart of ``one_hot2dist`` (reference losses.py:159-178) with
    resolution=[1, 1]: for each class k with posmask = seg[..., k] > 0,

        res_k = edt_to_pos * negmask - (edt_to_neg - 1) * posmask

    (positive outside the class region, negative inside, zero map for classes
    absent from the tile). Input/output are channel-last (H, W, K).
    """
    seg = jnp.asarray(seg)
    pos = seg > 0.5  # (H, W, K)

    def per_class(p):
        any_pos = jnp.any(p)
        neg = ~p
        d_out = edt(p) * neg.astype(jnp.float32)
        d_in = (edt(neg) - 1.0) * p.astype(jnp.float32)
        res = d_out - d_in
        return jnp.where(any_pos, res, jnp.zeros_like(res))

    return jax.vmap(per_class, in_axes=2, out_axes=2)(pos)


def batch_one_hot2dist(seg: jnp.ndarray) -> jnp.ndarray:
    """Batched ``one_hot2dist``: (B, H, W, K) -> (B, H, W, K).

    Sequential over the batch (``lax.map``), parallel over classes inside:
    the row-envelope min materializes an (H, W, W') intermediate per class,
    so vmapping the batch would need B×K×H×W×W′ floats of HBM; mapping
    bounds it at K×H×W×W′ (~200 MB for K=3 at 256²) while still saturating
    the VPU.
    """
    return jax.lax.map(one_hot2dist, seg)
