"""Probe: depthwise-conv throughput vs channel count on XLA:TPU.

PERF.md r3 roofline table: at bs=128/256² the dw emitter runs at 538
GB/s for C=256 but only 246 GB/s for C=184 and 316 GB/s for C=136 —
i.e. the two middle dense-grid cells (x_1_3, x_2_3) leave ~22 ms/call
on the table purely from a channel-count-dependent emitter slowdown.

If the slowdown is a layout/tiling cliff, padding the IR1 mid width up
to the next fast multiple (extra zero-weight expand outputs) could net
a win despite moving more bytes: C=184→256 moves 1.39× the bytes, so
it wins iff the padded rate is >1.39× the unpadded rate.

This probe measures isolated dw(k=3, stride 1) + bias at the exact
geometry of the hot cells for a ladder of channel counts, each reduced
to a scalar (tunnel rule: outputs are not free, PERF.md r2).

MEASURED (r3, two runs covering the ladder; nominal GB/s on the 2·bytes
convention — the scalar-reduced output never reaches HBM, so absolute
rates are ~2× optimistic, but every rung shares the bias):

    C= 88:  8.46 ms   349 GB/s
    C=128:  5.58 ms   770 GB/s   <- fast emitter
    C=136: 13.25 ms   344 GB/s
    C=160: 14.88 ms   361 GB/s
    C=192: 17.22 ms   374 GB/s
    C=256:  9.94 ms   864 GB/s   <- fast emitter

CONCLUSION (route closed): the fast depthwise emitter
(EmitDepthwiseInputBatchInSublanes) engages ONLY at exact multiples of
128 lanes — 192 is NOT a fast point, so there is no cheap pad target
for the 184/136-channel cells: the nearest fast width is 256, whose
+39-88% extra bytes across the whole mid-chain were already analyzed
to cancel the dw win (PERF.md r3 roofline floor, "documented, not
landed"). Zero-pad routing stays un-landed.
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


def main():
    B, H = 128, 256
    opts = tpu_compiler_options()
    kw = {"compiler_options": opts} if opts else {}

    def dw_raw(x, k, b):
        y = jax.lax.conv_general_dilated(
            x,
            k,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )
        return jnp.sum((y + b).astype(jnp.float32))

    dw = jax.jit(dw_raw, **kw)
    rng = np.random.default_rng(0)

    print(f"dw k3 s1 bs={B} {H}x{H}, bf16, scalar-reduced", flush=True)
    # full ladder; each rung is a fresh remote compile (~8 min each on a
    # cold cache) — trim the tuple when re-probing a specific width.
    for C in (88, 128, 136, 160, 184, 192, 224, 256):
        x = jnp.asarray(
            rng.normal(0, 1, (B, H, H, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            rng.normal(0, 0.2, (3, 3, 1, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        b = jnp.zeros((C,), jnp.bfloat16)
        np.asarray(dw(x, k, b))  # compile + drain
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            r = dw(x, k, b)
        np.asarray(r)
        ms = (time.perf_counter() - t0) / iters * 1e3
        gb = 2 * B * H * H * C * 2 / 1e9  # bf16 in + out
        print(f"C={C:4d}: {ms:7.2f} ms  {gb / ms * 1e3:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
