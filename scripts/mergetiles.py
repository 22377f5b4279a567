#!/usr/bin/env python
"""Merge predicted tiles into one georeferenced mosaic.

First-party analogue of the ``gdal_merge.py`` call that ends the
reference's inference stage (/root/reference/dvc.yaml:134-146):

    python scripts/mergetiles.py data/predicted.2019 \
        -o data/predicted_mosaic_2019.tif

Inputs are files and/or directories (directories expand via --pattern).
Later tiles win on overlap, matching gdal_merge.
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.geo.mosaic import merge_tiles  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("inputs", nargs="+", type=Path,
                        help="predicted tile files and/or directories")
    parser.add_argument("-o", "--outpath", type=Path, required=True)
    parser.add_argument("--pattern", default="*.tif",
                        help="glob for directory inputs (default: *.tif)")
    parser.add_argument("--compress", default="LZW",
                        choices=["LZW", "NONE"])
    parser.add_argument("--nodata", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    summary = merge_tiles(
        args.inputs, args.outpath,
        pattern=args.pattern, compress=args.compress, nodata=args.nodata,
    )
    print(
        f"wrote {args.outpath}: {summary['tiles']} tiles -> "
        f"{summary['height']}x{summary['width']} px, bounds={summary['bounds']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
