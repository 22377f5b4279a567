"""Pallas depthwise convolution in the batch-in-lanes layout.

Profiling the b5 flagship at bs=128/512² (round 2, PERF.md) shows
depthwise convolutions are ~50% of device time (334 GFLOP of dw per
batch-128 call). This kernel computes dw as k² shift-FMAs on
(H, W, C, B) blocks — the LOGICAL transpose of the NHWC activation, which
is a free bitcast because XLA stores NHWC activations batch-in-lanes
({0,3,2,1}); halo rows come from overlapping `pl.Element` windows.

MEASURED OUTCOME (v5e, bs=128): parity with XLA, not a win — 1.0× at
(512², C32, k3), 0.5× at (32², C1056, k5). Root cause: k=3 depthwise is
HBM-BANDWIDTH-bound (18 FLOP per 4 B moved ⇒ ~2.4 TF/s ceiling at
540 GB/s), and XLA's dw emitters already run at 55-75% of that ceiling.
A standalone dw kernel therefore cannot beat XLA materially; the wins
come from FUSION — removing the expand/dw intermediate round-trips
entirely (ops/fused_block.py). This module stays as the tested layout/
tiling primitive that kernel builds on, and as a documented negative
result; the model code keeps XLA's dw (``force="xla"`` is the default on
non-TPU backends, and auto mode measured no regression either way).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, w_ref, out_ref, *, ks: int, th: int, hh: int,
               acc_dtype=jnp.float32):
    """One (TH+pad, W, TC, B) window → (TH, W, TC, B) dw output.

    Halo rows come from overlapping `pl.Element` windows on the H-padded
    input. The image-edge zeros ARE the conv's SAME padding (the kernel
    input is the conv input, so no masking is needed — unlike the fused
    block kernel, where the dw operand is computed in-kernel). W edges are
    padded in VMEM; the bf16 window converts per-slice inside the FMA.
    """
    del hh
    halo = ks // 2
    x = x_ref[...]  # (TH+pad, W, TC, B), input dtype
    w = x.shape[1]

    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))

    wt = w_ref[...].astype(acc_dtype)
    acc = jnp.zeros((th, w) + x.shape[2:], acc_dtype)
    for dy in range(ks):
        for dx in range(ks):
            acc = acc + xp[dy : dy + th, dx : dx + w].astype(acc_dtype) * wt[dy, dx]
    out_ref[...] = acc.astype(out_ref.dtype)


def _pick_tiles(hh: int, ww: int, c: int, b: int, itemsize: int, pad: int):
    """(TH, TC): window + its padded copy (input dtype) + f32 acc + out
    under the ~16 MB Mosaic scoped-vmem stack, with headroom for Mosaic's
    own temporaries."""
    budget = 9 * 1024 * 1024
    for tc in (16, 8, 4, 2, 1):
        if c % tc:
            continue
        for th in (32, 16, 8):
            if hh % th or th % pad:
                continue
            n = (th + pad) * ww * tc * b
            m = th * ww * tc * b
            est = n * itemsize * 2 + m * (4 + itemsize)
            if est <= budget:
                return th, tc
    return None


def _dw_pallas(x_t: jnp.ndarray, kernel: jnp.ndarray, ks: int,
               interpret: bool, acc_dtype=jnp.float32) -> Optional[jnp.ndarray]:
    """(H, W, C, B) depthwise conv; returns None when no feasible tiling."""
    hh, ww, c, b = x_t.shape
    halo = ks // 2
    # Element windows must step in sublane-tile multiples of the SECOND
    # minor dim... H is a plain (non-tiled) dim here, so the only
    # constraint is the VMEM budget and divisibility.
    pad = 8 if x_t.dtype != jnp.bfloat16 else 16
    if pad < 2 * halo:
        pad = 2 * halo
    tiles = _pick_tiles(hh, ww, c, b, np.dtype(x_t.dtype).itemsize, pad)
    if tiles is None:
        return None
    th, tc = tiles
    n_h, n_c = hh // th, c // tc

    # (ks, ks, TC, 1): per-channel scalars broadcasting over B lanes
    wt = kernel.reshape(ks, ks, c, 1).astype(jnp.float32)

    xp = jnp.pad(x_t, ((halo, pad - halo), (0, 0), (0, 0), (0, 0)))

    return pl.pallas_call(
        functools.partial(_dw_kernel, ks=ks, th=th, hh=hh, acc_dtype=acc_dtype),
        grid=(n_h, n_c),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(th + pad), pl.Element(ww), pl.Element(tc),
                 pl.Element(b)),
                lambda i, j: (i * th, 0, j * tc, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((ks, ks, tc, 1), lambda i, j: (0, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, ww, tc, b), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hh, ww, c, b), x_t.dtype),
        interpret=interpret,
    )(xp, wt)


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def depthwise_conv2d(
    x: jnp.ndarray,  # (B, H, W, C)
    kernel: jnp.ndarray,  # (kh, kw, 1, C) flax/HWIO depthwise kernel
    *,
    strides: int = 1,
    force: Optional[str] = None,  # None (auto) | "pallas" | "xla"
    interpret: bool = False,
    acc_dtype=jnp.float32,
) -> jnp.ndarray:
    """Depthwise conv with SAME/k//2 padding; Pallas fast path on TPU.

    The logical transposes around the kernel are free: XLA stores NHWC
    activations batch-in-lanes, which is exactly the (H, W, C, B)
    row-major layout the kernel reads.
    """
    b, hh, ww, c = x.shape
    ks = int(kernel.shape[0])
    # default to XLA: the standalone kernel only matches XLA's dw (see
    # module docstring) — "pallas" is for tests and kernel development
    use = force or "xla"
    if (
        use == "pallas"
        and strides == 1
        and kernel.shape[0] == kernel.shape[1]
        and hh % 8 == 0
    ):
        x_t = jnp.transpose(x, (1, 2, 3, 0))
        out = _dw_pallas(x_t, kernel, ks, interpret, acc_dtype)
        if out is not None:
            return jnp.transpose(out, (3, 0, 1, 2))

    pad = ks // 2
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (strides, strides),
        [(pad, pad), (pad, pad)],
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
