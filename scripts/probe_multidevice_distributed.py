#!/usr/bin/env python
"""Probe: multi-process jax.distributed with >1 device per process.

The production pod shape is N local devices × M processes; the repo's
2-process CPU test (tests/test_multiprocess.py) runs 1 device per process
because jax 0.9's Gloo CPU collectives deadlock in cross-process
rendezvous whenever a process owns more than one host-platform device
(ROADMAP "Environment constraints"; multiproc_worker.py docstring has the
minimal repro). VERDICT r3 item 3b asks to probe the alternative
transports and capture the outcome either way.

Variants tried (each with a hard timeout):

- ``gloo``        — the default CPU collectives backend;
- ``gloo-lo``     — Gloo pinned to the loopback interface
                    (GLOO_SOCKET_IFNAME=lo — rules out interface-pick
                    flakiness in the rendezvous);
- ``mpi``         — jax_cpu_collectives_implementation=mpi (requires a
                    working MPI; expected unavailable in this image).

Each variant spawns ``--procs`` workers (this script re-executed with a
``worker`` argv role), every worker owning ``--devices-per-proc`` fake CPU
devices; the workers run a cross-process psum over a known global array
and a data-parallel train step. A variant passes when every worker exits
0 and the psum matches.

Writes PROOFS/multidevice_distributed_probe.json with per-variant status
(ok / timeout / error + log tail). tests/test_multiprocess.py consumes
this: if any variant works it asserts step parity through it; otherwise
it records the captured failure as the documented blocker.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

VARIANTS = ("gloo", "gloo-lo", "mpi")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# ---------------------------------------------------------------------------
# worker role
# ---------------------------------------------------------------------------

def worker(variant: str, pid: int, nprocs: int, n_dev: int, port: str,
           outfile: str) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_dev}"
    )
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    if variant == "gloo-lo":
        os.environ["GLOO_SOCKET_IFNAME"] = "lo"

    import jax

    jax.config.update("jax_platforms", "cpu")
    if variant == "mpi":
        jax.config.update("jax_cpu_collectives_implementation", "mpi")

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.local_devices()) == n_dev

    sys.path.insert(0, str(REPO))
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deadtrees_tpu.parallel import create_mesh

    mesh = create_mesh()  # all global devices
    total = nprocs * n_dev

    # cross-process psum over a known global array: global[i] = i
    local = np.arange(pid * n_dev, (pid + 1) * n_dev, dtype=np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (total,)
    )
    # jnp.sum over the data-sharded array: the partitioner inserts the
    # cross-process all-reduce (the transport under probe)
    total_sum = float(jax.jit(jnp.sum)(arr))
    expect = float(sum(range(total)))
    assert total_sum == expect, (total_sum, expect)

    if pid == 0:
        Path(outfile).write_text(json.dumps({"sum": total_sum, "expect": expect}))
    print(f"worker {pid} ({variant}): psum {total_sum} == {expect} OK")


# ---------------------------------------------------------------------------
# driver role
# ---------------------------------------------------------------------------

def run_variant(variant: str, procs: int, n_dev: int, timeout: float,
                workdir: Path) -> dict:
    port = _free_port()
    out = workdir / f"{variant}.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    children = [
        subprocess.Popen(
            [sys.executable, __file__, "worker", variant, str(pid),
             str(procs), str(n_dev), str(port), str(out)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(procs)
    ]
    t0 = time.time()
    logs = []
    status = "ok"
    for p in children:
        remaining = max(1.0, timeout - (time.time() - t0))
        try:
            logs.append(p.communicate(timeout=remaining)[0])
        except subprocess.TimeoutExpired:
            status = "timeout"
            p.kill()
            logs.append(p.communicate()[0])
    if status == "ok" and any(p.returncode != 0 for p in children):
        status = "error"
    if status == "ok" and not out.exists():
        status = "error"
    tail = "\n---\n".join(lg[-800:] for lg in logs)
    return {
        "variant": variant,
        "status": status,
        "elapsed_s": round(time.time() - t0, 1),
        "log_tail": tail,
    }


def main(argv=None) -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
               int(sys.argv[5]), sys.argv[6], sys.argv[7])
        return 0

    import argparse
    import tempfile

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--timeout", type=float, default=180.0)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument("--out", type=Path,
                    default=REPO / "PROOFS" / "multidevice_distributed_probe.json")
    args = ap.parse_args(argv)

    results = []
    with tempfile.TemporaryDirectory() as td:
        for variant in args.variants:
            print(f"probing {variant}: {args.procs} procs x "
                  f"{args.devices_per_proc} devices, timeout {args.timeout}s")
            r = run_variant(variant, args.procs, args.devices_per_proc,
                            args.timeout, Path(td))
            print(f"  -> {r['status']} ({r['elapsed_s']}s)")
            results.append(r)

    report = {
        "shape": f"{args.procs} procs x {args.devices_per_proc} devices",
        "jax_version": __import__("jax").__version__,
        "working_variants": [r["variant"] for r in results if r["status"] == "ok"],
        "results": results,
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items() if k != "results"},
                     indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
