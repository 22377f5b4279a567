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

Single-host multi-chip needs no launcher: `python run.py` sees all local
chips via the mesh directly.
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
from typing import List


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", help="Cloud TPU name (uses gcloud ssh --worker=all)")
    ap.add_argument("--zone", default=None)
    ap.add_argument("--hosts", nargs="+", help="explicit ssh host list")
    ap.add_argument("--coordinator", default=None, help="host:port of process 0")
    ap.add_argument("cmd", nargs=argparse.REMAINDER, help="-- command to run")
    args = ap.parse_args()

    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use: launch_pod.py ... -- python run.py ...)")
    cmd_str = " ".join(shlex.quote(c) for c in cmd)

    if args.tpu:
        # gcloud fans out to every worker; JAX auto-discovers coordination
        gcloud = [
            "gcloud", "compute", "tpus", "tpu-vm", "ssh", args.tpu,
            "--worker=all", f"--command={cmd_str}",
        ]
        if args.zone:
            gcloud.insert(6, f"--zone={args.zone}")
        sys.exit(subprocess.run(gcloud).returncode)

    if not args.hosts:
        ap.error("need --tpu or --hosts")
    coordinator = args.coordinator or f"{args.hosts[0]}:8476"
    procs: List[subprocess.Popen] = []
    for rank, host in enumerate(args.hosts):
        env = (
            f"JAX_COORDINATOR_ADDRESS={coordinator} "
            f"JAX_NUM_PROCESSES={len(args.hosts)} JAX_PROCESS_ID={rank}"
        )
        procs.append(
            subprocess.Popen(["ssh", host, f"{env} {cmd_str}"])
        )
    codes = [p.wait() for p in procs]
    sys.exit(max(codes))


if __name__ == "__main__":
    main()
