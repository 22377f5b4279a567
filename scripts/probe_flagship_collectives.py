#!/usr/bin/env python
"""Collective structure of the FLAGSHIP train step (VERDICT r3 item 3a).

tests/test_collective_structure.py proves the data-parallel train step
communicates via all-reduce only — on a small unet/resnet18. This probe
runs the same HLO inspection at the model-of-record geometry
(efficientunet++ / timm-efficientnet-b5, decoder 256..16) at tiny spatial
dims on the 8-device virtual CPU mesh, so the claim covers the flagship.
The CPU compile of the b5 fwd+bwd program takes ~10-15 min — hence a
probe script with a committed PROOFS record
(PROOFS/flagship_collectives_r4.json) plus an env-gated slow test
(DEADTREES_FLAGSHIP_HLO=1) rather than a default-suite test.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/probe_flagship_collectives.py
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

COLLECTIVE_KINDS = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute"
    r"|reduce-scatter|collective-broadcast|ragged-all-to-all)\b"
)


def probe(out_path: Path) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deadtrees_tpu.models import create_model, init_model
    from deadtrees_tpu.parallel import create_mesh
    from deadtrees_tpu.train import (
        OptimizerConfig,
        TrainState,
        build_loss,
        make_optimizer,
        make_train_step,
    )

    t0 = time.time()
    model = create_model(
        "efficientunet++", "timm-efficientnet-b5", in_channels=4, classes=3,
        decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    mesh = create_mesh()
    n_dev = int(mesh.devices.size)

    tx = make_optimizer(OptimizerConfig(steps_per_epoch=1))
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    loss = build_loss(["GDICE", "FOCAL", "BOUNDARY"], 3)
    step = make_train_step(model, loss, num_classes=3)

    rng = np.random.default_rng(0)
    data = NamedSharding(mesh, P("data"))
    batch = {
        "image": jax.device_put(
            rng.normal(size=(n_dev, 32, 32, 4)).astype(np.float32), data),
        "mask": jax.device_put(
            rng.integers(0, 3, (n_dev, 32, 32)).astype(np.int32), data),
        "distmap": jax.device_put(
            rng.normal(size=(n_dev, 32, 32, 3)).astype(np.float32), data),
    }
    state = jax.device_put(state, NamedSharding(mesh, P()))

    t1 = time.time()
    compiled = step.lower(state, batch, jnp.int32(0)).compile()
    compile_s = time.time() - t1
    txt = compiled.as_text()
    kinds = sorted(set(COLLECTIVE_KINDS.findall(txt)))
    n_sites = len(re.findall(r"all-reduce(?:-start)?\(", txt))

    report = {
        "model": "efficientunet++/timm-efficientnet-b5 dec(256,128,64,32,16)",
        "devices": n_dev,
        "spatial": 32,
        "collective_kinds": kinds,
        "all_reduce_sites": n_sites,
        "hlo_chars": len(txt),
        "compile_s": round(compile_s, 1),
        "total_s": round(time.time() - t0, 1),
        "claim_holds": kinds == ["all-reduce"],
    }
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    out = REPO / "PROOFS" / "flagship_collectives_r4.json"
    report = probe(out)
    sys.exit(0 if report["claim_holds"] else 1)
