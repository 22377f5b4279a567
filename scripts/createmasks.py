#!/usr/bin/env python
"""Rasterize ground-truth shapefiles into per-tile mask GeoTIFFs.

Port of /root/reference/scripts/createmasks.py:155-194, dependency-free
(pure-python shapefile reader + PIL rasterizer replace geopandas/rioxarray):

1. tile grid from gdal_retile's ``locations.csv`` (filename;x1;x2;y1;y2,
   createmasks.py:57-65);
2. drop no-data tiles — band 1 entirely 0/255 — in parallel
   (createmasks.py:27-54);
3. select tiles intersecting ground-truth polygons (createmasks.py:68-78);
4. per tile, burn class masks: multiclass (conifer=1, broadleaf=2, argmax
   over per-class masks, createmasks.py:112-136) or ``--simple`` binary
   (also used for the CORINE forest-mask ``lu`` layer, dvc.yaml:62-79);
5. write mask tiles mirroring the image tiles' georeferencing tags.
"""

from __future__ import annotations

import argparse
import csv
import sys
from functools import partial
from multiprocessing import Pool
from pathlib import Path
from typing import Dict, List

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.geo import bbox_intersects, rasterize, read_shapefile  # noqa: E402
from deadtrees_tpu.infer.geotiff import read_geotiff, write_geotiff  # noqa: E402


def load_tile_grid(path: Path) -> List[Dict]:
    """locations.csv (filename;x1;x2;y1;y2) → [{'filename', 'bounds'}]."""
    tiles = []
    with open(path) as f:
        for row in csv.reader(f, delimiter=";"):
            if len(row) < 5:
                continue
            name, x1, x2, y1, y2 = row[0], *map(float, row[1:5])
            tiles.append(
                {
                    "filename": name,
                    # normalized (xmin, ymin, xmax, ymax)
                    "bounds": (min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)),
                }
            )
    return tiles


def _identify_empty(tile_path: Path) -> bool:
    """True when tile has data (reference _identify_empty, createmasks.py:27-34)."""
    band1 = read_geotiff(tile_path).data[..., 0]
    return not np.isin(band1, [0, 255]).all()


def _mask_tile(
    tile: Dict,
    *,
    polygons: List[Dict],
    inpath: Path,
    outpath: Path,
    simple: bool,
) -> int:
    img = read_geotiff(inpath / tile["filename"])
    size = img.data.shape[:2]
    bounds = tile["bounds"]

    selection = [
        p for p in polygons if p["bbox"] and bbox_intersects(p["bbox"], bounds)
    ]
    if simple:
        mask = rasterize(selection, bounds, size)
    else:
        # classes: 0 background, 1 coniferous, 2 broadleaf — argmax over
        # per-class binary masks (createmasks.py:115-136)
        layers = [np.zeros(size, np.uint8)]
        for c in (1, 2):
            sel_c = [
                p
                for p in selection
                if int(float(p["attributes"].get("type") or
                             p["attributes"].get("Type") or 0)) == c
            ]
            layers.append(
                rasterize(sel_c, bounds, size) if sel_c else np.zeros(size, np.uint8)
            )
        mask = np.argmax(np.stack(layers), axis=0).astype(np.uint8)

    write_geotiff(outpath / tile["filename"], mask, img.geo)
    return int(np.count_nonzero(mask))


def create_masks(
    indir: Path, outdir: Path, shpfile: Path, workers: int, simple: bool
) -> None:
    polygons = read_shapefile(shpfile)

    tiles = load_tile_grid(indir / "locations.csv")
    tile_paths = [indir / t["filename"] for t in tiles]
    existing = [(t, p) for t, p in zip(tiles, tile_paths) if p.exists()]
    print(f"WORKERS: {workers}")
    if workers > 1:
        with Pool(workers) as pool:
            has_data = pool.map(_identify_empty, [p for _, p in existing], chunksize=1)
    else:
        has_data = [_identify_empty(p) for _, p in existing]
    tiles = [t for (t, _), ok in zip(existing, has_data) if ok]
    print(f"len2: {len(tiles)}")

    # tiles intersecting ground truth (split_groundtruth_data_by_tiles)
    tiles_train = [
        t
        for t in tiles
        if any(
            p["bbox"] and bbox_intersects(p["bbox"], t["bounds"]) for p in polygons
        )
    ]

    fn = partial(
        _mask_tile, polygons=polygons, inpath=indir, outpath=outdir, simple=simple
    )
    if workers > 1:
        with Pool(workers) as pool:
            pool.map(fn, tiles_train, chunksize=1)
    else:
        for t in tiles_train:
            fn(t)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("indir", type=Path)
    parser.add_argument("outdir", type=Path)
    parser.add_argument("shpfile", type=Path)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--simple", action="store_true", default=False)
    args = parser.parse_args()

    args.outdir.mkdir(parents=True, exist_ok=True)
    create_masks(args.indir, args.outdir, args.shpfile, args.workers, args.simple)


if __name__ == "__main__":
    main()
