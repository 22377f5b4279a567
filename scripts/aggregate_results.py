#!/usr/bin/env python
"""Aggregate per-tile dead-tree fractions within the forest mask.

Port of /root/reference/scripts/aggregate_results.py:27-123: for each year,
pair predicted tiles with their forest-mask (lu) tiles, compute the conifer
and broadleaf dead fraction over forest pixels for tiles with ≥limit% forest
cover, and write per-year results: ``aggregated_{year}.csv`` plus
``aggregated_{year}.shp`` (tile bounding boxes with conifer/broadleaf/total
attributes — same schema the reference emits via geopandas.to_file,
written by the first-party writer in deadtrees_tpu.geo.shapefile).
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass
from functools import partial
from multiprocessing import Pool
from pathlib import Path
from typing import Optional, Tuple


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
    img = read_geotiff(tile)
    a = img.data.squeeze()
    b = read_geotiff(forest_tile).data.squeeze()

    if (b.sum() / b.size) * 100 < limit:
        return Result(tile=tile.stem, bounds=img.bounds,
                      conifer=None, broadleaf=None)
    forest = b.sum()
    res = []
    for c in (1, 2):
        dead = int(((a == c) & (b == 1)).sum())
        res.append((dead / forest) * 100)
    return Result(tile=tile.stem, bounds=img.bounds,
                  conifer=res[0], broadleaf=res[1])


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

        kept = [r for r in results if r.total is not None]
        rows = [
            {
                "tile": r.tile,
                "conifer": r.conifer,
                "broadleaf": r.broadleaf,
                "total": r.total,
            }
            for r in kept
        ]
        out = Path(f"aggregated_{year}.csv")
        pd.DataFrame(rows).to_csv(out, index=False)
        print(f"wrote {out} ({len(rows)} tiles)")

        # yearly shapefile with the reference's schema: conifer/broadleaf/
        # total attributes on the tile's bounding box
        # (/root/reference/scripts/aggregate_results.py:44-54,116-123)
        shp_records = [
            {
                "rings": [[(x1, y1), (x1, y2), (x2, y2), (x2, y1)]],
                "attributes": {
                    "conifer": r.conifer,
                    "broadleaf": r.broadleaf,
                    "total": r.total,
                },
            }
            for r in kept
            if r.bounds is not None
            for (x1, y1, x2, y2) in [r.bounds]
        ]
        if shp_records:
            from deadtrees_tpu.geo.shapefile import write_shapefile

            write_shapefile(Path(f"aggregated_{year}"), shp_records)
            print(f"wrote aggregated_{year}.shp ({len(shp_records)} polygons)")
        else:
            print(f"no georeferenced tiles for {year}; shapefile skipped")


if __name__ == "__main__":
    main()
