"""Probe: combined expand+skip 1x1 conv vs two separate convs.

In every dense-grid IR1 cell (expansion_ratio=1) the expand conv
(Conv_0, in->mid) and the skip-projection conv (Conv_3, in->features)
read the SAME concat input as two separate full HBM passes (PERF.md r3
roofline table: x_0_3 expand ~8.6 GB + skip 4.85 GB at 80-95%% of
stream rate — both already at the per-op wall, so the only lever is
reading the input ONCE). Combining them into one conv whose kernel is
the output-axis concat [W0 | W3] halves the input reads — IF XLA:TPU
multi-output-fuses the sliced BN/activation epilogues instead of
materializing the raw (mid+features) output and re-reading it.

This probe measures exactly that at the x_0_3 geometry of the 512^2
bs=128 inference program (concat 256ch at 256^2 spatial):

  A) separate:  h = hswish(bn0(conv0(x)));  s = bn3(conv3(x))
  B) combined:  y = conv_c(x); h = hswish(bn0(y[..:mid])); s = bn3(y[mid:])

both reduced to a scalar so the tunnel's output marshalling doesn't
pollute the numbers (PERF.md r2 measurement correction).

MEASURED (r3, v5e, vmem=65536 defaults):

    separate: 15.05 ms/call
    combined: 21.58 ms/call   (0.70x — LOSS)

CONCLUSION (route closed): XLA:TPU does NOT multi-output-fuse the two
sliced epilogues — the combined conv materializes the full
(mid+features)-wide output to HBM and re-reads it for each slice, so
the one saved input pass is repaid ~1.9x in extra output traffic. Same
failure mode as the int8 requantize epilogues (probe_int8_conv.py):
conv epilogue fusion on this toolchain is single-consumer only.
DEADTREES_COMBINED_EXPAND_SKIP stays opt-in/off; the separate convs are
already at 80-95% of stream rate (PERF.md r3 roofline table).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""

import jax
import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.core.tpu_opts import tpu_compiler_options


def bn_hswish(y, scale, bias):
    return jax.nn.hard_swish(y * scale + bias)


def conv1x1(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    B, H, CIN, MID, FEAT = 128, 256, 256, 256, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, H, CIN)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k0 = jnp.asarray(rng.normal(0, 0.05, (1, 1, CIN, MID)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k3 = jnp.asarray(rng.normal(0, 0.05, (1, 1, CIN, FEAT)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    s0 = jnp.asarray(rng.normal(1, 0.1, (MID,)).astype(np.float32)).astype(jnp.bfloat16)
    b0 = jnp.zeros((MID,), jnp.bfloat16)
    s3 = jnp.asarray(rng.normal(1, 0.1, (FEAT,)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    b3 = jnp.zeros((FEAT,), jnp.bfloat16)

    opts = tpu_compiler_options()

    # downstream consumers kept realistic: h and s both collapse to one
    # scalar so nothing crosses the tunnel.
    def separate_raw(x, k0, k3, s0, b0, s3, b3):
        h = bn_hswish(conv1x1(x, k0), s0, b0)
        s = conv1x1(x, k3) * s3 + b3
        return jnp.sum(h.astype(jnp.float32)) + jnp.sum(s.astype(jnp.float32))

    def combined_raw(x, k0, k3, s0, b0, s3, b3):
        kc = jnp.concatenate([k0, k3], axis=-1)
        y = conv1x1(x, kc)
        h = bn_hswish(y[..., :MID], s0, b0)
        s = y[..., MID:] * s3 + b3
        return jnp.sum(h.astype(jnp.float32)) + jnp.sum(s.astype(jnp.float32))

    kw = {"compiler_options": opts} if opts else {}
    separate = jax.jit(separate_raw, **kw)
    combined = jax.jit(combined_raw, **kw)

    args = (x, k0, k3, s0, b0, s3, b3)
    for name, fn in [("separate", separate), ("combined", combined)]:
        out = np.asarray(fn(*args))  # compile + drain
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        np.asarray(r)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {ms:.2f} ms/call (scalar={out:.1f})", flush=True)


if __name__ == "__main__":
    main()
