#!/usr/bin/env python
"""Merge per-year shard directories into train/val/test folders.

Port of /root/reference/scripts/mergedatasets.py:12-62: split each year's
shards by the dataset fractions [.7, .2, .1], copy into
``outdir/{train,val,test}`` renaming shards with the year infix
(``train-000001.tar`` → ``train-2019-000001.tar``).
"""

from __future__ import annotations

import argparse
import re
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.data.config import DATASET_CONFIG  # noqa: E402
from deadtrees_tpu.data.shards import split_shards  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("indirs", type=Path, nargs="+")
    parser.add_argument("--outdir", type=Path, default=Path("data/dataset"))
    args = parser.parse_args()

    args.outdir.mkdir(parents=True, exist_ok=True)

    if len(args.indirs) < 2:
        print("At least two indirs are required!\n")
        parser.print_help()
        sys.exit(1)

    years = [re.search(r"\d{4}", str(d)) for d in args.indirs]
    years_extracted = [y.group() for y in years if y]
    if len(years_extracted) != len(args.indirs):
        print("Extracting year info from indirs failed!\n")
        parser.print_help()
        sys.exit(1)

    for sub in ("train", "val", "test"):
        (args.outdir / sub).mkdir(parents=True, exist_ok=True)

    for year, indir in zip(years_extracted, args.indirs):

        def copy_to_dst(files, subdir):
            for infile in files or []:
                infile = Path(infile)
                f = infile.name.split("-0")
                outfile = args.outdir / subdir / f"{f[0]}-{year}-0{f[1]}"
                shutil.copyfile(str(infile), str(outfile))

        train_files, val_files, test_files = split_shards(
            sorted(indir.glob("*.tar")), list(DATASET_CONFIG.fractions)
        )
        copy_to_dst(train_files, "train")
        copy_to_dst(val_files, "val")
        copy_to_dst(test_files, "test")


if __name__ == "__main__":
    main()
