"""Fused Pallas augmentation kernel: dihedral + color jitter + normalize.

The reference's per-sample albumentations hot path
(/root/reference/deadtrees/data/deadtreedata.py:132-146) costs one CPU pass
per op per sample on DataLoader workers. The XLA version in
data/augment.py already fuses the arithmetic; this Pallas kernel goes one
step further and performs the WHOLE per-sample transform in a single VMEM
round-trip per image:

    uint8 (H, W, C) block → rot90(k) → hflip/vflip → v*alpha + beta*mean
    → clip(0,255) → floor → (x - 255m)/(255s) → f32 out

Per-sample parameters (flip flags, rotation k, alpha, beta, image mean)
ride in SMEM; the grid is one program per sample, so geometric selects are
predicated VMEM moves rather than 4 materialized rotation copies of the
batch (the XLA fallback's trade-off).

On non-TPU backends the kernel runs in interpreter mode (tests) — the
public entry :func:`augment_pallas` is numerically identical to
``data.augment.augment_batch``'s image path and is selected there via
``use_pallas=True``.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _augment_kernel(scalar_ref, norm_ref, img_ref, out_ref):
    """One sample per program: scalar_ref (1, 6) SMEM holds
    [flip_h, flip_v, rot_k, alpha, beta, img_mean]; norm_ref (2, C) SMEM
    holds the normalization constants [255*mean; 255*std]."""
    flip_h = scalar_ref[0, 0] > 0.5
    flip_v = scalar_ref[0, 1] > 0.5
    rot_k = scalar_ref[0, 2].astype(jnp.int32)
    alpha = scalar_ref[0, 3]
    beta = scalar_ref[0, 4]
    img_mean = scalar_ref[0, 5]

    x = img_ref[0].astype(jnp.float32)  # (H, W, C)

    # albumentations order: OneOf(flip) FIRST, then RandomRotate90
    x = jnp.where(flip_h, jnp.flip(x, axis=1), x)
    x = jnp.where(flip_v, jnp.flip(x, axis=0), x)
    # rot90 by k (counter-clockwise, numpy convention); H == W required
    x = jax.lax.switch(
        rot_k,
        [
            lambda v: v,
            lambda v: jnp.flip(jnp.swapaxes(v, 0, 1), axis=0),
            lambda v: jnp.flip(jnp.flip(v, axis=0), axis=1),
            lambda v: jnp.flip(jnp.swapaxes(v, 0, 1), axis=1),
        ],
        x,
    )

    # albumentations uint8 LUT brightness/contrast (brightness_by_max=False)
    x = jnp.floor(jnp.clip(x * alpha + beta * img_mean, 0.0, 255.0))

    # Normalize: (v - 255*mean) / (255*std), constants from SMEM
    c = x.shape[-1]
    for ch in range(c):  # static unroll over the 4 bands
        out_ref[0, :, :, ch] = (x[:, :, ch] - norm_ref[0, ch]) / norm_ref[1, ch]


@functools.partial(jax.jit, static_argnames=("mean", "std", "interpret"))
def augment_pallas(
    image_u8: jnp.ndarray,  # (B, H, W, C) uint8
    flip_h: jnp.ndarray,  # (B,) bool
    flip_v: jnp.ndarray,  # (B,) bool
    rot_k: jnp.ndarray,  # (B,) int
    alpha: jnp.ndarray,  # (B,) float
    beta: jnp.ndarray,  # (B,) float
    *,
    mean: Tuple[float, ...],
    std: Tuple[float, ...],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused per-sample augmentation; returns normalized f32 batch."""
    b, h, w, c = image_u8.shape
    assert h == w, "rot90 in-kernel requires square tiles"
    mean = tuple(mean)[:c]
    std = tuple(std)[:c]

    # per-image mean over pixels+bands for brightness_by_max=False —
    # one cheap fused reduction, prepended to the scalar table
    img_mean = jnp.mean(image_u8.astype(jnp.float32), axis=(1, 2, 3))
    scalars = jnp.stack(
        [
            flip_h.astype(jnp.float32),
            flip_v.astype(jnp.float32),
            rot_k.astype(jnp.float32),
            alpha.astype(jnp.float32),
            beta.astype(jnp.float32),
            img_mean,
        ],
        axis=1,
    )  # (B, 6)

    norm = jnp.stack(
        [jnp.asarray(mean, jnp.float32) * 255.0, jnp.asarray(std, jnp.float32) * 255.0]
    )  # (2, C)

    return pl.pallas_call(
        _augment_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        interpret=interpret,
    )(scalars, norm, image_u8)
