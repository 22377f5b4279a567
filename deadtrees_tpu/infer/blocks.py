"""Block (un)tiling math: scene ↔ subtile batches.

Counterpart of ``make_blocks_vectorized`` / ``unmake_blocks_vectorized``
(/root/reference/deadtrees/utils/data_handling.py:9-34). Two API flavors:

- ``*_chw``: byte-for-byte the reference semantics ((C, H, W) → (N, C, d, d)
  and (N, d, d) → (H, W)) for golden-parity tests;
- ``*_nhwc``: the TPU-native layout used by the jitted sliding-window
  predictor ((H, W, C) → (N, d, d, C)); both are pure reshape/transpose, so
  under jit they compile to layout changes XLA fuses into neighbors — the
  on-device replacement for the reference's host-side numpy stitch.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_blocks_chw(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """(C, H, W) → (N, C, d, d), rows-of-subtiles order (data_handling.py:9-19)."""
    p, m, n = x.shape
    return (
        x.reshape(-1, m // d, d, n // d, d)
        .transpose(1, 3, 0, 2, 4)
        .reshape(-1, p, d, d)
    )


def unmake_blocks_chw(x: jnp.ndarray, d: int, m: int, n: int) -> jnp.ndarray:
    """(N, d, d) → (m, n) (data_handling.py:22-34)."""
    return (
        jnp.concatenate(list(x))
        .reshape(m // d, n // d, d, d)
        .transpose(0, 2, 1, 3)
        .reshape(m, n)
    )


def make_blocks_nhwc(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """(H, W, C) → (N, d, d, C), same subtile order as the chw variant."""
    m, n, c = x.shape
    return (
        x.reshape(m // d, d, n // d, d, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, d, d, c)
    )


def unmake_blocks_nhwc(x: jnp.ndarray, m: int, n: int) -> jnp.ndarray:
    """(N, d, d) or (N, d, d, C) → (m, n[, C])."""
    if x.ndim == 3:
        nb, d, _ = x.shape
        return (
            x.reshape(m // d, n // d, d, d).transpose(0, 2, 1, 3).reshape(m, n)
        )
    nb, d, _, c = x.shape
    return (
        x.reshape(m // d, n // d, d, d, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(m, n, c)
    )
