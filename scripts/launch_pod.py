#!/usr/bin/env python
"""Multi-host TPU-pod launcher: the SLURM-srun analogue.

The reference fans out across nodes with SLURM
(/root/reference/sweep_slurm.py:38-56, start-agent.sh); on TPU pods the
coordination plane is ``jax.distributed`` (SURVEY.md §5.8). This launcher
starts the same command on every worker of a pod slice and injects the
process-env needed for ``deadtrees_tpu.parallel.distributed_init``:

    # on a Cloud TPU pod (one VM per host), via gcloud:
    python scripts/launch_pod.py --tpu my-pod --zone us-central2-b \
        -- python run.py model=default

    # or with an explicit host list over ssh:
    python scripts/launch_pod.py --hosts h1 h2 h3 h4 \
        --coordinator h1:8476 -- python run.py model=default

``--print`` emits the exact per-worker command lines (gcloud invocation,
or one ssh line per host with the coordinator env) without executing —
the dry-run mode tests assert on (tests/test_launch_pod.py).

Single-host multi-chip needs no launcher: `python run.py` sees all local
chips via the mesh directly.
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
from typing import List, Tuple


def build_gcloud_command(tpu: str, zone: str, cmd_str: str) -> List[str]:
    """gcloud tpu-vm fan-out: one ssh to every worker (--worker=all);
    JAX auto-discovers the pod's coordination topology."""
    gcloud = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", tpu,
        "--worker=all", f"--command={cmd_str}",
    ]
    if zone:
        gcloud.insert(6, f"--zone={zone}")
    return gcloud


def build_ssh_commands(
    hosts: List[str], coordinator: str, cmd_str: str
) -> List[Tuple[str, List[str]]]:
    """Explicit host list: one ssh per host carrying the jax.distributed
    env (coordinator address, world size, this host's process id) that
    deadtrees_tpu.parallel.distributed_init consumes."""
    out = []
    for rank, host in enumerate(hosts):
        env = (
            f"JAX_COORDINATOR_ADDRESS={coordinator} "
            f"JAX_NUM_PROCESSES={len(hosts)} JAX_PROCESS_ID={rank}"
        )
        out.append((host, ["ssh", host, f"{env} {cmd_str}"]))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", help="Cloud TPU name (uses gcloud ssh --worker=all)")
    ap.add_argument("--zone", default=None)
    ap.add_argument("--hosts", nargs="+", help="explicit ssh host list")
    ap.add_argument("--coordinator", default=None, help="host:port of process 0")
    ap.add_argument("--print", dest="dry_run", action="store_true",
                    help="print the per-worker commands without executing")
    ap.add_argument("cmd", nargs=argparse.REMAINDER, help="-- command to run")
    args = ap.parse_args(argv)

    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use: launch_pod.py ... -- python run.py ...)")
    cmd_str = " ".join(shlex.quote(c) for c in cmd)

    if args.tpu:
        gcloud = build_gcloud_command(args.tpu, args.zone, cmd_str)
        if args.dry_run:
            print(" ".join(shlex.quote(c) for c in gcloud))
            return 0
        return subprocess.run(gcloud).returncode

    if not args.hosts:
        ap.error("need --tpu or --hosts")
    coordinator = args.coordinator or f"{args.hosts[0]}:8476"
    launches = build_ssh_commands(args.hosts, coordinator, cmd_str)
    if args.dry_run:
        for _host, line in launches:
            print(" ".join(shlex.quote(c) for c in line))
        return 0
    procs = [subprocess.Popen(line) for _host, line in launches]
    codes = [p.wait() for p in procs]
    return max(codes)


if __name__ == "__main__":
    sys.exit(main())
