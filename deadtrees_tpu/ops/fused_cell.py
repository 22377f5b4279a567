"""Fused NHWC inverted-residual for FAT decoder cells (C ≥ 64).

Round-3 profiling (PERF.md r3) overturned the r2 "small-cin" plan: the
flagship's device time concentrates in the dense-grid decoder's row-3/row-2
cells, whose concat inputs are 128-256 channels wide (reference
efficientunetplusplus/decoder.py:134-184 — skip widths grow with grid
depth). At those widths NHWC lanes are DENSE (C is a multiple of the
128-lane tile), so none of the small-C lane-padding pathologies of
r1's CHW kernels apply, and a straightforward per-(image, H-tile) grid has
chunky per-step work (the expand GEMM alone is ~10⁸ FLOP/step).

Two passes per block (the SE global pool forces the split):

  pass 1 (grid B×H-tiles): y = act(x·W1 + b1)        [1×1 expand, BN folded]
                           h = act(dw3×3(y) + b_dw)  [BN folded]
                           psum += Σ_pixels h        [cSE pool partials]
  (XLA, tiny):             gate = σ(W2·relu(W1·mean)) per (B, C)
  pass 2 (grid B×H-tiles): scse = h·gate + h·σ(h·w_sse)
                           out  = scse·W2 + b2 (+ x·Wsk + bsk | + x)

HBM traffic per block: read x (as overlap tiles), write h, read h, read
x, write out — the y/scse intermediates never round-trip HBM. The dw's
H halo comes from MATERIALIZED overlap tiles (`_overlap_tiles`, one
cheap XLA copy) so the kernel reads regular, double-buffered blocks;
overlapping `pl.Element` windows were tried first and measured equally
slow (PERF.md r3). Manual HBM DMA is not an option on this attachment
(crashes the remote compiler, PERF.md r1).

STATUS (r3, measured): at the production bs=128 this kernel LOSES to
XLA (0.71× at the x_3_3 geometry) — Pallas pins the channel axis to
the minor/lane dim, so e.g. 88-channel tensors pad to 128 lanes, while
XLA assigns batch-minor layouts (`{0,3,2,1}`, bs=128 fills the lanes
exactly) to these tensors and streams them pad-free. Kept as an
opt-in (`JaxInference(fused_decoder="nhwc")`) and as the record of why
layout freedom, not fusion, is the binding constraint here.

Inference only (BNs folded on host); exact-semantics parity with
``blocks.InvertedResidual`` is enforced by tests/test_fused_cell.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deadtrees_tpu.ops.fused_mbconv import FoldedBlockParams


def _overlap_tiles(x: jnp.ndarray, th: int, halo: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, nH, TH+2·halo, W, C): H-tiles WITH their halo
    rows materialized, so the kernel reads regular (pipelined) blocks.
    One cheap XLA copy — for concat-input cells this replaces the concat
    write the XLA path pays anyway. Overlapping `pl.Element` windows were
    measured 1.35× SLOWER than XLA at bs=128 (they defeat Pallas's block
    double-buffering; PERF.md r3)."""
    xpad = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    n = x.shape[1] // th
    tiles = [xpad[:, i * th : i * th + th + 2 * halo] for i in range(n)]
    return jnp.stack(tiles, axis=1)


def _p1_kernel(x_ref, w1_ref, b1_ref, dw_ref, bdw_ref, h_ref, psum_ref,
               *, act, ksize: int, total_h: int):
    """x tile (1, 1, TH+2·halo, W, Cin) from the overlap array; emits
    h (1, TH, W, Cm) and running cSE partial sums per image."""
    i = pl.program_id(1)
    th = h_ref.shape[1]
    w = h_ref.shape[2]
    cm = h_ref.shape[3]
    halo = ksize // 2

    x = x_ref[0, 0].astype(jnp.float32)  # (TH+2h, W, Cin)

    # 1×1 expand on the haloed tile: (R, W, Cin) · (Cin, Cm)
    y = jax.lax.dot_general(
        x, w1_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = act(y + b1_ref[...])

    # rows outside the real image must be ZERO in y-space (the dw conv's
    # zero padding applies to y, not x: halo rows would carry act(b1))
    grow = i * th - halo + jax.lax.broadcasted_iota(
        jnp.int32, (y.shape[0], 1, 1), 0
    )
    y = jnp.where((grow >= 0) & (grow < total_h), y, 0.0)

    # depthwise k×k: H shifts are outer-dim slices of the haloed tile,
    # W shifts are sublane-dim value slices of the W-zero-padded rows
    yp = jnp.pad(y, ((0, 0), (halo, halo), (0, 0)))
    acc = jnp.zeros((th, w, cm), jnp.float32)
    for dy in range(ksize):
        ys = yp[dy : dy + th]
        for dx in range(ksize):
            acc = acc + ys[:, dx : dx + w, :] * dw_ref[dy, dx]
    h = act(acc + bdw_ref[...])

    h_ref[0] = h.astype(h_ref.dtype)
    # cSE pool partials: accumulate into a revisited (8, Cm) block
    # (constant index map ⇒ the block lives in VMEM across the whole grid)
    first = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(first)
    def _():
        psum_ref[...] = jnp.zeros(psum_ref.shape, psum_ref.dtype)

    b = pl.program_id(0)
    sums = jnp.sum(h, axis=(0, 1))  # (Cm,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, cm), 0)
    psum_ref[b] = psum_ref[b] + jnp.where(rows == 0, sums[None, :], 0.0)


def _p2_kernel(h_ref, x_ref, gate_ref, ssew_ref, sseb_ref, w2_ref, b2_ref,
               wsk_ref, bsk_ref, out_ref, *, skip: str, halo: int):
    b = pl.program_id(0)
    th = out_ref.shape[1]
    h = h_ref[0].astype(jnp.float32)  # (TH, W, Cm)

    sse = jax.nn.sigmoid(
        jax.lax.dot_general(
            h, ssew_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + sseb_ref[0, 0]
    )  # (TH, W, 1)
    scse = h * gate_ref[b] + h * sse

    out = jax.lax.dot_general(
        scse, w2_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...]

    # x comes from the overlap array: drop the halo rows
    x = x_ref[0, 0, halo : halo + th].astype(jnp.float32)
    if skip == "conv":
        out = out + jax.lax.dot_general(
            x, wsk_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bsk_ref[...]
    else:  # identity
        out = out + x
    out_ref[0] = out.astype(out_ref.dtype)


def _pick_th(hh: int, ww: int, cin: int, cmid: int, halo: int) -> Optional[int]:
    """Largest H-tile whose VMEM stack fits: x window + y/acc f32 temps +
    h out, all at W×C lanes-dense. Budget ~10 MB of the 16 MB stack."""
    budget = 10 * 1024 * 1024
    for th in (64, 32, 16, 8, 4):
        if hh % th != 0:
            continue
        rows = th + 2 * halo
        est = 4 * ww * (
            rows * cin          # x window (f32 after cast)
            + 2 * rows * cmid   # y + padded copy
            + 2 * th * cmid     # acc + h
        )
        if est <= budget:
            return th
    return None


@functools.partial(
    jax.jit, static_argnames=("interpret", "activation", "ksize", "skip")
)
def fused_ir_fat(
    x: jnp.ndarray,  # (B, H, W, C_in) — lanes-dense for C_in ≥ 128
    fp: FoldedBlockParams,
    *,
    interpret: bool = False,
    activation: str = "hswish",
    ksize: int = 3,
    skip: str = "auto",  # "auto" | "identity" | "conv"
) -> jnp.ndarray:
    """Fused InvertedResidual forward for fat cells; NHWC in/out.

    Matches ``blocks.InvertedResidual`` with train=False (BNs folded),
    expansion_ratio=1, squeeze_ratio=1 (the production decoder config).
    """
    bsz, hh, ww, cin = x.shape
    cmid = fp.w1.shape[1]
    cout = fp.w2.shape[1]
    act = {"hswish": jax.nn.hard_swish, "silu": jax.nn.silu}[activation]
    halo = ksize // 2
    if skip == "auto":
        skip = "conv" if fp.wsk is not None else "identity"

    th = _pick_th(hh, ww, cin, cmid, halo)
    if th is None:
        raise ValueError(f"no VMEM-feasible H-tile for {x.shape}->{cmid}")
    n_tiles = hh // th

    xov = _overlap_tiles(x, th, halo)  # (B, nH, TH+2h, W, Cin)
    rows = th + 2 * halo

    row = lambda v: v.reshape(1, 1, -1)  # (1, 1, C) biases  # noqa: E731

    h, psums = pl.pallas_call(
        functools.partial(_p1_kernel, act=act, ksize=ksize, total_h=hh),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, rows, ww, cin), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 (Cin, Cm)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 (1, 1, Cm)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw (k, k, 1, Cm)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bdw (1, 1, Cm)
        ],
        out_specs=[
            pl.BlockSpec((1, th, ww, cmid), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, 8, cmid), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hh, ww, cmid), x.dtype),
            jax.ShapeDtypeStruct((bsz, 8, cmid), jnp.float32),
        ],
        interpret=interpret,
    )(
        xov, fp.w1, row(fp.b1), fp.dw.reshape(ksize, ksize, 1, cmid),
        row(fp.b_dw),
    )

    pooled = psums[:, 0, :] / (hh * ww)  # (B, Cm)
    z = jnp.maximum(pooled @ fp.cse_w1 + fp.cse_b1, 0.0)
    gate = jax.nn.sigmoid(z @ fp.cse_w2 + fp.cse_b2)  # (B, Cm)

    if skip == "conv":
        wsk, bsk = fp.wsk, row(fp.bsk)
    else:
        wsk = jnp.zeros((cin, cout), jnp.float32)
        bsk = jnp.zeros((1, 1, cout), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_p2_kernel, skip=skip, halo=halo),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, th, ww, cmid), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, ww, cin), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate (B, 1, 1, Cm)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sse_w (Cm, 1)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sse_b (1, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 (Cm, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 (1, 1, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wsk (Cin, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bsk (1, 1, Cout)
        ],
        out_specs=pl.BlockSpec(
            (1, th, ww, cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hh, ww, cout), x.dtype),
        interpret=interpret,
    )(
        h, xov, gate.reshape(bsz, 1, 1, cmid), fp.sse_w,
        fp.sse_b.reshape(1, 1), fp.w2, row(fp.b2), wsk, bsk,
    )
    return out
