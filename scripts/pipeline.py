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

Artifact versioning (the DVC remote/lock half — core/artifacts.py):
successful stages record their outputs' sha256 in ``pipeline.lock`` (the
``dvc.lock`` analogue, /root/reference/dvc.lock:9-18), and

    python scripts/pipeline.py push [PATH ...]   # outs -> content cache
    python scripts/pipeline.py pull [PATH ...]   # restore from cache

sync artifacts with a content-addressed cache directory (--cache /
$DEADTREES_CACHE_DIR — a mounted bucket path plays the reference's S3
remote, .dvc/config:1-11). Default paths: every stage out.
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
sys.path.insert(0, str(ROOT))
STATE_FILE = ROOT / ".pipeline_state.json"
LOCK_FILE = ROOT / "pipeline.lock"


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


def _out_record(path: Path) -> Dict:
    """dvc.lock-style out entry: sha256 for files; for directories a
    manifest hash over the per-file content hashes (DVC's .dir semantic)."""
    from deadtrees_tpu.core.artifacts import hash_file

    if path.is_file():
        return {"path": str(path.relative_to(ROOT)),
                "sha256": hash_file(path), "size": path.stat().st_size}
    files = sorted(p for p in path.rglob("*") if p.is_file()
                   and not p.name.endswith(".dtpu"))
    h = hashlib.sha256()
    total = 0
    entries = []
    for f in files:
        fh = hash_file(f)
        h.update(f"{f.relative_to(path)}:{fh}\n".encode())
        total += f.stat().st_size
        entries.append({"path": str(f.relative_to(path)), "sha256": fh,
                        "size": f.stat().st_size})
    # Per-file records make `pipeline.py pull` work on a fresh host where
    # the directory (and the .dtpu pointers inside it) doesn't exist yet —
    # DVC's committed-.dir-manifest semantic, carried in the lock instead.
    return {"path": str(path.relative_to(ROOT)), "sha256": h.hexdigest(),
            "size": total, "nfiles": len(files), "dir": True,
            "files": entries}


def write_lock_entry(job: Dict, stamp: str) -> None:
    lock = json.loads(LOCK_FILE.read_text()) if LOCK_FILE.exists() else {}
    lock[job["name"]] = {
        "cmd": job["cmd"],
        "deps_stamp": stamp,
        "outs": [
            _out_record(ROOT / o) for o in job["outs"] if (ROOT / o).exists()
        ],
    }
    LOCK_FILE.write_text(json.dumps(lock, indent=1, sort_keys=True))


def _collect_files(paths: List[Path]) -> List[Path]:
    out: List[Path] = []
    for p in paths:
        if p.is_file() and not p.name.endswith(".dtpu"):
            out.append(p)
        elif p.is_dir():
            out.extend(
                f for f in sorted(p.rglob("*"))
                if f.is_file() and not f.name.endswith(".dtpu")
            )
    return out


def _pointers_from_lock(target: Path) -> List[Path]:
    """Materialize ``.dtpu`` pointers for a missing out from pipeline.lock.

    On a fresh host the artifacts (and the pointers that live next to them)
    don't exist; the lock's per-out records carry enough (sha256/size, and
    per-file entries for directory outs) to recreate the pointers so
    ``ArtifactCache.pull`` can restore the blobs — DVC's checkout-from-lock
    semantic (reference keeps this in dvc.lock / .dvc files).
    """
    import json as _json

    if not LOCK_FILE.exists():
        return []
    lock = _json.loads(LOCK_FILE.read_text())
    try:
        rel = str(target.relative_to(ROOT))
    except ValueError:
        rel = str(target)
    made: List[Path] = []

    def _write(artifact: Path, sha256: str, size: int) -> None:
        from deadtrees_tpu.core.artifacts import pointer_path as _pp

        ptr = _pp(artifact)
        if ptr.exists():
            return
        artifact.parent.mkdir(parents=True, exist_ok=True)
        ptr.write_text(_json.dumps(
            {"sha256": sha256, "size": size, "path": artifact.name,
             "from": "pipeline.lock"}, indent=1) + "\n")
        made.append(ptr)

    for entry in lock.values():
        for out in entry.get("outs", []):
            if out.get("path") != rel:
                continue
            if out.get("dir"):
                for f in out.get("files", []):
                    _write(ROOT / rel / f["path"], f["sha256"], f["size"])
            else:
                _write(ROOT / rel, out["sha256"], out["size"])
    if made:
        print(f"pull: recreated {len(made)} pointer(s) for {rel} "
              "from pipeline.lock")
    return made


def sync_command(cmd: str, paths: List[str], cache_dir: Path,
                 cfg: Dict, years) -> int:
    """``push``/``pull`` against the content-addressed cache."""
    import os

    from deadtrees_tpu.core.artifacts import ArtifactCache, pointer_path

    if not paths:  # default: every stage out
        paths = sorted({o for j in expand_stages(cfg, years) for o in j["outs"]})
    targets = [ROOT / p if not Path(p).is_absolute() else Path(p)
               for p in paths]
    cache = ArtifactCache(cache_dir)
    if cmd == "push":
        files = _collect_files([t for t in targets if t.exists()])
        if not files:
            print("push: no artifacts found")
            return 0
        results = cache.push(files)
        n_up = sum(r["uploaded"] for r in results)
        print(f"pushed {len(results)} artifacts ({n_up} new) -> {cache_dir}")
        return 0
    # pull: restore from pointers (next to missing/present artifacts)
    pointers = []
    for t in targets:
        if t.is_dir():
            pointers.extend(sorted(t.rglob("*.dtpu")))
        else:
            p = pointer_path(t)
            if p.exists():
                pointers.append(p)
        if not pointers or all(not str(p).startswith(str(t)) for p in pointers):
            # Fresh host: no pointers on disk for this out. Materialize them
            # from the committed pipeline.lock (per-file records for dirs).
            pointers.extend(_pointers_from_lock(t))
    if not pointers:
        print("pull: no .dtpu pointers found for the requested paths "
              "(none on disk, none recoverable from pipeline.lock)")
        return 1
    results = cache.pull(pointers)
    n_restored = sum(r["restored"] for r in results)
    print(f"pulled {len(results)} artifacts ({n_restored} restored)")
    return 0


def main() -> None:
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="*",
                    help="stage names (default: all); or 'push'/'pull' "
                         "followed by artifact paths")
    ap.add_argument("--years", type=int, nargs="+", default=None)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--no-lock", action="store_true",
                    help="skip pipeline.lock content hashing after stages")
    ap.add_argument("--cache", type=Path,
                    default=Path(os.environ.get("DEADTREES_CACHE_DIR",
                                                ROOT / ".dtpu_cache")))
    ap.add_argument("--pipeline", type=Path, default=ROOT / "pipeline.yaml")
    args = ap.parse_args()

    cfg = yaml.safe_load(args.pipeline.read_text())

    if args.stages and args.stages[0] in ("push", "pull"):
        sys.exit(sync_command(args.stages[0], args.stages[1:], args.cache,
                              cfg, args.years))

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
        if not args.no_lock:
            write_lock_entry(job, stamp)


if __name__ == "__main__":
    main()
