#!/usr/bin/env python
"""Retile orthophotos into fixed-size tiles + locations.csv.

First-party analogue of the ``gdal_retile.py`` stage that starts the
reference's pipeline (/root/reference/dvc.yaml:14-21):

    python scripts/retile.py data/raw/ortho_ms_2019_EPSG3044.tif \
        --targetDir data/processed.images.2019 --ps 2048

With rasterio installed, reads are windowed (country-scale orthophotos
stream); the PIL fallback materializes each scene (demo scale).
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.geo.retile import retile  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("sources", nargs="+", type=Path,
                        help="orthophoto GeoTIFF(s) to retile")
    parser.add_argument("--targetDir", type=Path, required=True)
    parser.add_argument("--ps", type=int, default=2048,
                        help="tile pixel size (default 2048, params.yaml)")
    parser.add_argument("--csv", default="locations.csv",
                        help="grid CSV name appended under targetDir")
    parser.add_argument("--compress", default="LZW", choices=["LZW", "NONE"])
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    total = 0
    for i, src in enumerate(args.sources):
        records = retile(
            src, args.targetDir,
            tile_size=args.ps, csv_name=args.csv, compress=args.compress,
            append_csv=i > 0,  # fresh CSV for the run, append across sources
        )
        total += len(records)
    print(f"wrote {total} tiles to {args.targetDir} (+ {args.csv})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
