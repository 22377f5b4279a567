#!/usr/bin/env python
"""Hyperparameter-sweep runner: job-level parallelism over TPU slices.

Counterpart of the reference's sweep orchestration (SURVEY.md §2.2
job-level parallelism): W&B grid sweep + one SLURM agent per node
(/root/reference/sweep_slurm.py:22-56, sweep.yaml:1-33, start-agent.sh).
Here the grid is expanded locally from the same sweep.yaml surface and runs
are dispatched either

- sequentially on this host (``--launcher local``, the single-agent case),
- one subprocess per command template (``--launcher slurm`` emits ``srun``
  lines, ``--launcher print`` just prints them for pod schedulers) — the
  coordination plane is the filesystem (one results.jsonl), not a W&B
  server, since this environment has no egress,
- through a real W&B sweep server when wandb is importable
  (``--launcher wandb``): ``wandb.sweep(sweep.yaml)`` + an in-process
  ``wandb.agent`` loop, the reference's exact coordination plane
  (sweep_slurm.py:36-56, start-agent.sh:3-4). Multiple hosts join the
  same sweep by passing ``--sweep-id`` — one agent per host, the SLURM
  fan-out shape.

Each run invokes ``run.py <overrides>`` and records the optimized metric;
the best configuration is reported at the end (the reference's sweep
objective is the return value of train(), train.py:116-139).
"""

from __future__ import annotations

import argparse
import itertools
import json
import subprocess
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def expand_grid(params: dict):
    keys, values = [], []
    for k, spec in params.items():
        keys.append(k)
        values.append(spec["values"] if isinstance(spec, dict) else [spec])
    for combo in itertools.product(*values):
        yield dict(zip(keys, combo))


def _parse_metric(stdout: str):
    """The objective is the last float line of the run's stdout (the
    reference's train() return value, train.py:116-139)."""
    for line in reversed(stdout.strip().splitlines() or [""]):
        try:
            return float(line.strip())
        except ValueError:
            continue
    return None


def run_wandb_sweep(cfg: dict, args, metric: str) -> None:
    """W&B-server coordination plane (reference sweep_slurm.py:36-56):
    create the sweep from the same sweep.yaml document (it IS the W&B
    sweep format) and run an agent loop in this process. The agent pulls
    each configuration from the server, launches ``program`` as a
    subprocess with Hydra-style overrides, and logs the objective back."""
    import wandb

    program = cfg.get("program", "run.py")
    sweep_id = args.sweep_id or wandb.sweep(
        cfg, project=args.project, entity=args.entity
    )
    print(f"wandb sweep: {sweep_id}")

    def agent_run():
        run = wandb.init()
        combo = dict(run.config)
        overrides = [f"{k}={v}" for k, v in combo.items()] + list(args.extra)
        overrides.append(f"optimized_metric={metric}")
        proc = subprocess.run(
            [sys.executable, program, *overrides],
            capture_output=True, text=True,
        )
        value = _parse_metric(proc.stdout)
        if value is not None:
            run.log({metric: value})
        run.finish(exit_code=proc.returncode)

    wandb.agent(sweep_id, function=agent_run, count=args.count)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("sweep_config", type=Path, nargs="?", default=Path("sweep.yaml"))
    parser.add_argument("--launcher", choices=["local", "slurm", "print", "wandb"],
                        default="local")
    parser.add_argument("--results", type=Path, default=Path("sweep_results.jsonl"))
    parser.add_argument("--extra", nargs="*", default=[], help="extra overrides for every run")
    parser.add_argument("--project", default="deadtrees-tpu",
                        help="W&B project for --launcher wandb")
    parser.add_argument("--entity", default=None,
                        help="W&B entity for --launcher wandb")
    parser.add_argument("--sweep-id", default=None,
                        help="join an existing W&B sweep instead of creating "
                             "one (per-host agents, the SLURM fan-out shape)")
    parser.add_argument("--count", type=int, default=None,
                        help="max runs this wandb agent executes")
    parser.add_argument(
        "--from-config", metavar="NAME", default=None,
        help="load the search space from configs/hparams_search/NAME.yaml "
        "(the Hydra-style hparams_search group) instead of sweep.yaml",
    )
    args = parser.parse_args()

    if args.from_config:
        group = Path(__file__).resolve().parents[1] / "configs" / "hparams_search"
        doc = yaml.safe_load((group / f"{args.from_config}.yaml").read_text())
        cfg = doc.get("hparams_search", doc)
    else:
        cfg = yaml.safe_load(args.sweep_config.read_text())
    program = cfg.get("program", "run.py")
    metric = cfg.get("metric", {}).get("name", "val/dice")
    goal = cfg.get("metric", {}).get("goal", "maximize")

    if args.launcher == "wandb":
        try:
            import wandb  # noqa: F401
        except ImportError:
            sys.exit(
                "--launcher wandb needs the wandb package; use the default "
                "filesystem launcher in egress-free environments"
            )
        run_wandb_sweep(cfg, args, metric)
        return

    combos = list(expand_grid(cfg.get("parameters", {})))
    print(f"sweep: {len(combos)} configurations, metric {metric} ({goal})")

    results = []
    for i, combo in enumerate(combos):
        overrides = [f"{k}={v}" for k, v in combo.items()] + list(args.extra)
        overrides.append(f"optimized_metric={metric}")
        cmd = [sys.executable, program, *overrides]
        if args.launcher == "print":
            print(" ".join(cmd))
            continue
        if args.launcher == "slurm":
            cmd = ["srun", "--nodes=1", "--ntasks=1", *cmd]
        print(f"[{i + 1}/{len(combos)}] {' '.join(overrides)}")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        value = _parse_metric(proc.stdout)
        rec = {"overrides": overrides, "value": value, "returncode": proc.returncode}
        results.append(rec)
        with open(args.results, "a") as f:
            f.write(json.dumps(rec) + "\n")

    scored = [r for r in results if r["value"] is not None]
    if scored:
        best = (max if goal == "maximize" else min)(scored, key=lambda r: r["value"])
        print(f"BEST {metric}={best['value']}: {' '.join(best['overrides'])}")


if __name__ == "__main__":
    main()
