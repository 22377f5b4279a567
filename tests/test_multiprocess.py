"""2-process data-parallel training step over localhost jax.distributed.

VERDICT r1 item 6's acceptance: a 2-process CPU-backend run showing the
process-local input path (shard_batch → make_array_from_process_local_data)
produces the same step results as the single-process 8-device run.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_metrics():
    from deadtrees_tpu.models import create_model, init_model
    from deadtrees_tpu.parallel import create_mesh, replicate, shard_batch
    from deadtrees_tpu.train import (
        OptimizerConfig,
        TrainState,
        build_loss,
        make_optimizer,
        make_train_step,
    )

    mesh = create_mesh()
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
    batch = shard_batch(
        {
            "image": rng.normal(size=(8, 32, 32, 4)).astype(np.float32),
            "mask": rng.integers(0, 3, size=(8, 32, 32)).astype(np.int32),
            "distmap": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        },
        mesh,
    )
    _, metrics = step(state, batch, jnp.int32(0))
    return {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}


def _run_workers(tmp_path, nprocs: int, devices_per_proc: int,
                 _attempt: int = 0) -> dict:
    out = tmp_path / f"metrics_{_attempt}.json"
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multiproc_worker.py"),
             str(pid), str(nprocs), str(port), str(out),
             str(devices_per_proc)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nprocs)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, lg in zip(procs, logs):
        if p.returncode != 0:
            if "distributed" in lg.lower() and "unavailable" in lg.lower():
                pytest.skip(f"jax.distributed unavailable here: {lg[-300:]}")
            # rendezvous under heavy host contention (full-suite runs
            # sharing the 1-core host with compiles) can flake; one retry
            # with a fresh port separates that from a real regression
            if _attempt == 0:
                return _run_workers(tmp_path, nprocs, devices_per_proc,
                                    _attempt=1)
            raise AssertionError(f"worker failed rc={p.returncode}:\n{lg[-2000:]}")
    return json.loads(out.read_text())


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    multi = _run_workers(tmp_path, nprocs=2, devices_per_proc=1)
    single = _single_process_metrics()
    for k, v in single.items():
        assert abs(multi[k] - v) < 1e-4, (k, multi[k], v)


@pytest.mark.slow
def test_two_process_multidevice_step_matches_single_process(tmp_path):
    """The production pod shape: N local devices x M processes (VERDICT r3
    item 3b). 2 procs x 4 CPU devices each = the same 8-device global mesh
    as the single-process run; metrics must match. (The round-3 Gloo
    multi-device deadlock no longer reproduces on this image — see
    scripts/probe_multidevice_distributed.py for the transport probe.)"""
    multi = _run_workers(tmp_path, nprocs=2, devices_per_proc=4)
    single = _single_process_metrics()
    for k, v in single.items():
        assert abs(multi[k] - v) < 1e-4, (k, multi[k], v)
