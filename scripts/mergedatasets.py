#!/usr/bin/env python
"""Combine per-year shard directories into one train/val/test dataset.

Same job as /root/reference/scripts/mergedatasets.py:12-62: each input
directory holds one acquisition year's tar shards; every year is split by
the dataset fractions and its shards land in ``outdir/{train,val,test}``
under a year-tagged name so samples from all years mix at train time.

Differences from the reference: a dry-run mode, ``--link`` to hardlink
instead of copying (shards are large), and explicit failure messages per
directory instead of a bare exit.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.data.config import DATASET_CONFIG  # noqa: E402
from deadtrees_tpu.data.shards import split_shards  # noqa: E402

SPLITS = ("train", "val", "test")


def year_of(directory: Path) -> str:
    """A 4-digit year somewhere in the directory path tags its shards."""
    match = re.search(r"(?<!\d)(\d{4})(?!\d)", str(directory))
    if not match:
        raise ValueError(f"cannot find a 4-digit year in {directory}")
    return match.group(1)


def tagged_name(shard: Path, year: str) -> str:
    """``train-balanced-000007.tar`` → ``train-balanced-2019-000007.tar``:
    the year slots in before the trailing shard counter."""
    stem, suffix = shard.stem, shard.suffix
    m = re.search(r"-(\d{6,})$", stem)
    if m:
        return f"{stem[: m.start()]}-{year}-{m.group(1)}{suffix}"
    return f"{stem}-{year}{suffix}"


def plan_moves(
    indirs: List[Path], outdir: Path, fractions: List[float]
) -> Iterator[Tuple[Path, Path]]:
    """Yield (source shard, destination) pairs for every year directory."""
    years = [year_of(d) for d in indirs]
    dupes = {y for y in years if years.count(y) > 1}
    if dupes:
        raise ValueError(
            f"duplicate year tag(s) {sorted(dupes)} across input directories "
            f"{[str(d) for d in indirs]}: destination names would collide and "
            "silently overwrite shards. Rename the directories so each "
            "resolves to a distinct year."
        )
    seen: dict = {}
    for indir, year in zip(indirs, years):
        shards = sorted(indir.glob("*.tar"))
        if not shards:
            raise ValueError(f"no .tar shards in {indir}")
        per_split = split_shards([str(s) for s in shards], fractions)
        for split, members in zip(SPLITS, per_split):
            for shard in members or []:
                shard = Path(shard)
                dst = outdir / split / tagged_name(shard, year)
                if dst in seen:
                    raise ValueError(
                        f"destination collision: {seen[dst]} and {shard} "
                        f"both map to {dst}"
                    )
                seen[dst] = shard
                yield shard, dst


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("indirs", type=Path, nargs="+",
                    help="per-year shard directories (>= 2)")
    ap.add_argument("--outdir", type=Path, default=Path("data/dataset"))
    ap.add_argument("--link", action="store_true",
                    help="hardlink instead of copying")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    if len(args.indirs) < 2:
        ap.error("need at least two input directories (one per year)")

    moves = list(
        plan_moves(args.indirs, args.outdir, list(DATASET_CONFIG.fractions))
    )
    for split in SPLITS:
        (args.outdir / split).mkdir(parents=True, exist_ok=True)

    for src, dst in moves:
        if args.dry_run:
            print(f"{src} -> {dst}")
        elif args.link:
            if dst.exists():
                dst.unlink()
            os.link(src, dst)
        else:
            shutil.copyfile(src, dst)

    n = {s: sum(1 for _, d in moves if d.parent.name == s) for s in SPLITS}
    print(f"merged {len(moves)} shards into {args.outdir} "
          f"(train={n['train']} val={n['val']} test={n['test']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
