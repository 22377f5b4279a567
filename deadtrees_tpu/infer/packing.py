"""2-bit packed class maps — the serving wire format for ≤4-class outputs.

A (B, H, W) uint8 class map with 3 classes carries 6 wasted bits per
pixel. Packing 4 pixels/byte on device cuts device→host transfer and
network payloads 4× (the reference ships full uint8 PNG masks,
deployment/server.py:111-128; scenes here are 8192² = 64 MB unpacked).
Pack runs inside the jitted program (cheap VPU shifts); unpack is a host
numpy op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack2(classmap: jnp.ndarray) -> jnp.ndarray:
    """(..., W) uint8 class ids < 4 → (..., ceil(W/4)) uint8, 4 px/byte
    (little-endian within the byte: pixel i → bits 2i..2i+1)."""
    w = classmap.shape[-1]
    pad = (-w) % 4
    if pad:
        classmap = jnp.pad(classmap, [(0, 0)] * (classmap.ndim - 1) + [(0, pad)])
    x = classmap.reshape(classmap.shape[:-1] + (-1, 4)).astype(jnp.uint8)
    shifts = jnp.asarray([0, 2, 4, 6], jnp.uint8)
    return jnp.bitwise_or.reduce(x << shifts, axis=-1).astype(jnp.uint8)


def unpack2(packed: np.ndarray, width: int) -> np.ndarray:
    """Inverse of :func:`pack2` on host: (..., W/4) uint8 → (..., width)."""
    p = np.asarray(packed, np.uint8)
    out = np.stack(
        [(p >> s) & 0b11 for s in (0, 2, 4, 6)], axis=-1
    ).reshape(p.shape[:-1] + (-1,))
    return out[..., :width]
