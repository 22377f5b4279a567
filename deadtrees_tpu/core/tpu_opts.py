"""Default XLA:TPU compiler options for the hot compiled programs.

The round-3 flag sweep (scripts/sweep_xla_flags.py, PERF.md r3) measured
``xla_tpu_scoped_vmem_limit_kib=65536`` as a ~10% throughput win on the
flagship inference program (300.5 -> 331.0 tiles512/s at bs=128/512²) —
a larger scoped-VMEM budget lets XLA keep more fusion operands resident
instead of round-tripping them through HBM. Other candidates
(latency-hiding scheduler, rwb-fusion off, aggressive loop-fusion layout)
measured neutral and are not applied.

These names are TPU-only: libtpu validates them at compile time and other
backends reject them, so :func:`tpu_compiler_options` returns ``None``
unless the default backend is a TPU. Override via the
``DEADTREES_XLA_OPTS`` env var: empty string disables, otherwise a
comma-separated ``key=value`` list replaces the defaults.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULTS = {
    # measured +10% on the flagship bs=128 programs (PERF.md r3 flag sweep)
    "xla_tpu_scoped_vmem_limit_kib": 65536,
}


def _parse(raw: str) -> dict:
    out = {}
    for item in raw.split(","):
        item = item.strip()
        if not item:
            continue
        key, _, val = item.partition("=")
        if val.lower() in ("true", "false"):
            out[key] = val.lower() == "true"
        else:
            try:
                out[key] = int(val)
            except ValueError:
                try:
                    out[key] = float(val)
                except ValueError:
                    out[key] = val
    return out


def tpu_compiler_options() -> Optional[dict]:
    """Compiler options for ``jax.jit(..., compiler_options=...)``.

    ``None`` on non-TPU backends (the flags would fail validation there).
    Calling this initializes the JAX backend, so use it inside the
    step/engine builders — which already run after backend selection —
    not at import time.
    """
    raw = os.environ.get("DEADTREES_XLA_OPTS")
    if raw is not None:
        opts = _parse(raw)
        return opts or None
    import jax

    if jax.default_backend() != "tpu":
        return None
    return dict(_DEFAULTS)
