#!/usr/bin/env python
"""Data-pipeline runner: the `dvc repro` analogue.

Executes the stage graph in pipeline.yaml (mirroring the reference's
/root/reference/dvc.yaml:6-163) with content-based change detection: a
stage re-runs only when a dependency's fingerprint (mtime+size manifest)
changed since its last successful run (state in .pipeline_state.json).
Supports ``foreach`` expansion over the years list, {param} interpolation,
and ``requires:`` guards for external tools (gdal_retile.py).

    python scripts/pipeline.py                 # repro everything
    python scripts/pipeline.py createmasks     # one stage (+deps NOT forced)
    python scripts/pipeline.py --years 2019    # limit foreach stages
    python scripts/pipeline.py --force --dry-run
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import subprocess
import sys
from pathlib import Path
from typing import Dict, List

import yaml

ROOT = Path(__file__).resolve().parents[1]
STATE_FILE = ROOT / ".pipeline_state.json"


def fingerprint(path: Path) -> str:
    """Cheap content stamp: mtime+size manifest hash (directories walk)."""
    h = hashlib.sha256()
    if not path.exists():
        return "missing"
    files = [path] if path.is_file() else sorted(path.rglob("*"))
    for f in files:
        if f.is_file():
            st = f.stat()
            h.update(f"{f}|{st.st_mtime_ns}|{st.st_size}".encode())
    return h.hexdigest()[:16]


def interpolate(text: str, params: Dict, item=None) -> str:
    out = text
    if item is not None:
        out = out.replace("{item}", str(item))
    for k, v in params.items():
        if not isinstance(v, (list, dict)):
            out = out.replace("{" + k + "}", str(v))
    return out


def expand_stages(cfg: Dict, years: List[int]) -> List[Dict]:
    params = dict(cfg.get("params", {}))
    if years:
        params["years"] = years
    jobs = []
    for name, spec in cfg["stages"].items():
        items = params.get(spec["foreach"]) if "foreach" in spec else [None]
        for item in items:
            jobs.append(
                {
                    "name": f"{name}@{item}" if item is not None else name,
                    "stage": name,
                    "cmd": interpolate(" ".join(spec["cmd"].split()), params, item),
                    "deps": [
                        interpolate(d, params, item) for d in spec.get("deps", [])
                    ],
                    "outs": [
                        interpolate(o, params, item) for o in spec.get("outs", [])
                    ],
                    "requires": spec.get("requires"),
                }
            )
    return jobs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="*", help="stage names (default: all)")
    ap.add_argument("--years", type=int, nargs="+", default=None)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--pipeline", type=Path, default=ROOT / "pipeline.yaml")
    args = ap.parse_args()

    cfg = yaml.safe_load(args.pipeline.read_text())
    jobs = expand_stages(cfg, args.years)
    if args.stages:
        jobs = [j for j in jobs if j["stage"] in args.stages]

    state = json.loads(STATE_FILE.read_text()) if STATE_FILE.exists() else {}

    for job in jobs:
        if job["requires"] and shutil.which(job["requires"]) is None:
            print(f"SKIP {job['name']}: requires {job['requires']} (not installed)")
            continue
        dep_missing = [d for d in job["deps"] if not (ROOT / d).exists()]
        if dep_missing:
            print(f"SKIP {job['name']}: missing deps {dep_missing}")
            continue
        stamp = "|".join(fingerprint(ROOT / d) for d in job["deps"])
        outs_exist = all((ROOT / o).exists() for o in job["outs"])
        if not args.force and outs_exist and state.get(job["name"]) == stamp:
            print(f"OK   {job['name']} (unchanged)")
            continue
        print(f"RUN  {job['name']}: {job['cmd']}")
        if args.dry_run:
            continue
        proc = subprocess.run(job["cmd"], shell=True, cwd=ROOT)
        if proc.returncode != 0:
            print(f"FAIL {job['name']} (exit {proc.returncode})")
            sys.exit(proc.returncode)
        state[job["name"]] = stamp
        STATE_FILE.write_text(json.dumps(state, indent=2))


if __name__ == "__main__":
    main()
