"""Worker for the multi-process data-parallel tests (not a test itself).

Usage: python tests/multiproc_worker.py <pid> <nprocs> <port> <outfile>
           [devices_per_proc]

Each process owns ``devices_per_proc`` fake CPU devices (default 1),
joins a localhost jax.distributed cluster, feeds its process-local slice
of a deterministic global batch through parallel.shard_batch
(make_array_from_process_local_data on >1 processes), and runs ONE
data-parallel train step. The parent test compares the resulting metrics
against a single-process 8-device run of the same global batch.

History: on the round-3 host image, jax 0.9's Gloo CPU collectives
deadlocked in cross-process rendezvous whenever a process owned more than
one host-platform device (``GetKeyValue() timed out with key:
cpu:gloo/...``), so only the 1-device shape ran. The round-4 probe
(scripts/probe_multidevice_distributed.py, PROOFS/
multidevice_distributed_probe.json) shows 2 procs x 4 devices passing on
the current image — so the production pod shape (N local devices x M
processes) is now exercised directly by
tests/test_multiprocess.py::test_two_process_multidevice_*.
"""

import json
import os
import sys

_n_dev = sys.argv[5] if len(sys.argv) > 5 else "1"
# Append to (not overwrite) any caller/CI-provided XLA flags.
_inherited = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    f"{_inherited} --xla_force_host_platform_device_count={_n_dev}".strip()
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    outfile = sys.argv[4]

    n_dev = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.local_devices()) == n_dev
    assert len(jax.devices()) == nprocs * n_dev

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import jax.numpy as jnp

    from deadtrees_tpu.models import create_model, init_model
    from deadtrees_tpu.parallel import create_mesh, replicate, shard_batch
    from deadtrees_tpu.train import (
        OptimizerConfig,
        TrainState,
        build_loss,
        make_optimizer,
        make_train_step,
    )

    mesh = create_mesh()  # all global devices (one per process)
    model = create_model(
        "unet", "resnet18", in_channels=4, classes=3,
        decoder_channels=(16, 16, 8, 8, 8), dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    tx = make_optimizer(OptimizerConfig(steps_per_epoch=1))
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    state = replicate(state, mesh)
    loss = build_loss(["GDICE", "FOCAL", "BOUNDARY"], 3)
    step = make_train_step(model, loss, num_classes=3)

    rng = np.random.default_rng(0)
    n, local = 8, 8 // nprocs
    full = {
        "image": rng.normal(size=(n, 32, 32, 4)).astype(np.float32),
        "mask": rng.integers(0, 3, size=(n, 32, 32)).astype(np.int32),
        "distmap": rng.normal(size=(n, 32, 32, 3)).astype(np.float32),
    }
    local_batch = {k: v[pid * local : (pid + 1) * local] for k, v in full.items()}
    batch = shard_batch(local_batch, mesh)

    state, metrics = step(state, batch, jnp.int32(0))
    out = {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}
    if pid == 0:
        with open(outfile, "w") as f:
            json.dump(out, f)
    print(f"proc {pid}: {out}")


if __name__ == "__main__":
    main()
