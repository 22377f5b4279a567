#!/usr/bin/env python
"""Per-year predicted-tile class pixel counts → ``predicted.stats.csv``.

Port of /root/reference/scripts/computestats_inference.py:16-79: for every
predicted tile count pixels per class, compute dead area in m² at the
0.2000223 m pixel resolution, outer-join years on tile id.
"""

from __future__ import annotations

import argparse
import sys
from functools import partial, reduce
from multiprocessing import Pool
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.infer.geotiff import read_geotiff  # noqa: E402

WORKERS = 16
CLASSES = [0, 1, 2]
# exact factors from the reference (computestats_inference.py:57-58)
PX_X = 0.200022269188281
PX_Y = 0.200022454940277


def process_tile(tile: Path, *, year: int) -> dict:
    data = read_geotiff(tile).data.squeeze()
    unique, counts = np.unique(data, return_counts=True)
    row = {f"cl_{int(u)}": int(c) for u, c in zip(unique, counts)}
    for c in CLASSES:
        row.setdefault(f"cl_{c}", 0)
    row["total"] = int(data.size)
    row["tile"] = tile.stem.replace(f"ortho_ms_{year}_EPSG3044_", "")
    return row


def main() -> None:
    import pandas as pd

    parser = argparse.ArgumentParser()
    parser.add_argument("datapath", type=Path, nargs="+")
    parser.add_argument("--years", type=int, nargs="+", default=[2017, 2018, 2019, 2020])
    args = parser.parse_args()

    dfs = []
    for year in args.years:
        inpath = next(
            (d for d in args.datapath if f"predicted.{year}" in str(d)), None
        )
        if not inpath:
            raise NotImplementedError(f"no datapath for predicted.{year}")
        print(f"Processing year: {year}...")
        tiles = sorted(inpath.glob("*.tif"))
        if not tiles:
            raise SystemExit(f"no predicted tiles (*.tif) in {inpath}")
        with Pool(WORKERS) as pool:
            results = pool.map(partial(process_tile, year=year), tiles, chunksize=1)
        df = pd.DataFrame(results)
        df["deadarea_m2"] = ((df["cl_1"] + df["cl_2"]) * PX_X * PX_Y).round(1)
        dfs.append(df)

    dfs = [df.add_suffix(f"_{y}") for df, y in zip(dfs, args.years)]
    dfs = [df.rename(columns={f"tile_{y}": "tile"}) for df, y in zip(dfs, args.years)]
    dfall = reduce(lambda x, y: pd.merge(x, y, on=["tile"], how="outer"), dfs)
    dfall = dfall.rename(columns={f"total_{args.years[0]}": "total"})
    dfall = dfall[dfall.columns.drop(list(dfall.filter(regex="total_")))]
    cols = list(dfall)
    cols.insert(0, cols.pop(cols.index("total")))
    cols.insert(0, cols.pop(cols.index("tile")))
    dfall = dfall.loc[:, cols].convert_dtypes()
    out = args.datapath[0].parent / "predicted.stats.csv"
    dfall.to_csv(out, index=False)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
