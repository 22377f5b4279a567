"""Fused Pallas augmentation kernel: color jitter + normalize in one pass.

The reference's per-sample albumentations hot path
(/root/reference/deadtrees/data/deadtreedata.py:132-146) costs one CPU pass
per op per sample on DataLoader workers. Here the arithmetic chain runs as
ONE VMEM round trip per image on device:

    uint8 (H, W, C) block → v*alpha + beta*mean → clip(0,255) → floor →
    (x - 255m)/(255s) → f32 out

Geometry (flips/rot90) stays in XLA: pure layout permutations XLA handles
natively, and this attachment's Mosaic has no `rev` lowering. Per-sample
alpha/beta/image-mean ride in SMEM; one program per sample.

On non-TPU backends the kernel runs in interpreter mode (tests) — the
public entry :func:`augment_pallas` is numerically identical to
``data.augment.augment_batch``'s color+normalize path and is selected
there via ``use_pallas=True``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _augment_kernel(scalar_ref, norm_ref, img_ref, out_ref):
    """One sample per program. Blocks are 2D (H, W*C) — with channels folded
    into lanes the kernel is lane-dense (a (H, W, 4) block would be
    lane-padded 32x in VMEM and OOM). scalar_ref (B, 4) SMEM holds
    per-sample [alpha, beta, img_mean, _], rows indexed by program id;
    norm_ref (2, W*C) VMEM holds the per-channel normalization constants
    tiled across lanes ([255*mean; 255*std] repeated W times).

    Geometry (flips/rot90) happens in XLA BEFORE this kernel: Mosaic has no
    `rev` lowering, and XLA handles pure layout permutations well anyway —
    the fusion win is the arithmetic chain, done in one VMEM round trip."""
    b = pl.program_id(0)
    alpha = scalar_ref[b, 0]
    beta = scalar_ref[b, 1]
    img_mean = scalar_ref[b, 2]

    # Mosaic lacks a direct uint8->f32 cast; hop through int32
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)  # (H, W*C)

    # albumentations uint8 LUT brightness/contrast (brightness_by_max=False)
    x = jnp.floor(jnp.clip(x * alpha + beta * img_mean, 0.0, 255.0))

    # Normalize: (v - 255*mean) / (255*std), channel constants lane-tiled
    out_ref[0] = (x - norm_ref[0]) / norm_ref[1]


@functools.partial(jax.jit, static_argnames=("mean", "std", "interpret"))
def augment_pallas(
    image_u8: jnp.ndarray,  # (B, H, W, C) uint8, ALREADY flipped/rotated
    alpha: jnp.ndarray,  # (B,) float
    beta: jnp.ndarray,  # (B,) float
    *,
    mean: Tuple[float, ...],
    std: Tuple[float, ...],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused per-sample color jitter + normalize; returns f32 batch."""
    b, h, w, c = image_u8.shape
    mean = tuple(mean)[:c]
    std = tuple(std)[:c]

    # per-image mean over pixels+bands for brightness_by_max=False —
    # one cheap fused reduction, prepended to the scalar table
    img_mean = jnp.mean(image_u8.astype(jnp.float32), axis=(1, 2, 3))
    scalars = jnp.stack(
        [
            alpha.astype(jnp.float32),
            beta.astype(jnp.float32),
            img_mean,
            jnp.zeros_like(img_mean),  # pad to 4 cols (even SMEM row)
        ],
        axis=1,
    )  # (B, 4)

    # channels folded into lanes: (B, H, W*C); per-channel constants tiled
    wc = w * c
    img2d = image_u8.reshape(b, h, wc)
    norm = jnp.stack(
        [
            jnp.tile(jnp.asarray(mean, jnp.float32) * 255.0, w),
            jnp.tile(jnp.asarray(std, jnp.float32) * 255.0, w),
        ]
    )  # (2, W*C)

    out = pl.pallas_call(
        _augment_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wc), jnp.float32),
        interpret=interpret,
    )(scalars, norm, img2d)
    return out.reshape(b, h, w, c)
