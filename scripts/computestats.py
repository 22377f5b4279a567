#!/usr/bin/env python
"""Channel statistics over the dataset (two-pass mean then std).

Port of /root/reference/scripts/computestats.py:57-180: subsample tiles
(--frac), skip incomplete/empty tiles (all values ∈ {0,1} in band 1), split
into 256² subtiles, skip all-black/all-white subtiles, accumulate per-channel
mean then std over pixels scaled to [0,1], write
``processed.images.stats.json``. Works on tar shards or a directory of tifs.
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.data.tar import image_decoder, iter_tar_samples  # noqa: E402

def _iter_images(tar_files, tif_files, selection):
    """Yield (H, W, 4) uint8 arrays from shards or plain tifs."""
    if len(tar_files) > len(tif_files):
        idx = 0
        wanted = set(selection.tolist())
        for tar in tar_files:
            for sample in iter_tar_samples(str(tar)):
                if idx in wanted:
                    yield image_decoder(sample["rgbn.tif"])
                idx += 1
    else:
        from PIL import Image

        files = [tif_files[i] for i in selection]
        for f in files:
            with Image.open(f) as img:
                yield np.asarray(img.convert("RGBA"))


def _subtiles(data: np.ndarray, tile_size: int = 256):
    h, w = data.shape[:2]
    if h != w:
        return  # incomplete tile
    if np.isin(data[..., 0], [0, 1]).all():
        return  # empty tile
    d = min(tile_size, h)
    for y in range(0, h - d + 1, d):
        for x in range(0, w - d + 1, d):
            sub = data[y : y + d, x : x + d]
            if sub.min() == sub.max():
                continue  # all-black/white subtile
            yield sub


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("datapath", type=Path, nargs="+")
    parser.add_argument("--frac", type=float, default=1.0)
    parser.add_argument("--tile-size", type=int, default=256)
    parser.add_argument("--out", type=Path, default=Path("processed.images.stats.json"))
    args = parser.parse_args()

    np.random.seed(42)
    print("Using fixed random seed!")

    tar_files = sorted(itertools.chain(*[p.glob("*.tar") for p in args.datapath]))
    tif_files = sorted(itertools.chain(*[p.glob("*.tif") for p in args.datapath]))

    n_files = max(len(tif_files), 1) if len(tif_files) >= len(tar_files) else None
    if len(tar_files) > len(tif_files):
        # count samples cheaply from tar headers
        n_files = sum(1 for t in tar_files for _ in iter_tar_samples(str(t)))
    subset = int(round(args.frac * n_files, 0))
    selection = np.random.choice(range(n_files), size=subset, replace=False)

    print("\nCalculating STATS")
    print("\nCalculating MEAN")
    total = np.zeros(4, np.float64)
    count = 0
    for data in _iter_images(tar_files, tif_files, selection):
        for sub in _subtiles(data, args.tile_size):
            total += sub.reshape(-1, 4).mean(axis=0) / 255.0
            count += 1
    mean = total / max(count, 1)

    print("\nCalculating STD")
    sq = np.zeros(4, np.float64)
    for data in _iter_images(tar_files, tif_files, selection):
        for sub in _subtiles(data, args.tile_size):
            x = sub.reshape(-1, 4) / 255.0
            sq += ((x - mean) ** 2).mean(axis=0)
    std = np.sqrt(sq / max(count, 1))

    stats = {"mean": mean.tolist(), "std": std.tolist(), "subtiles": count}
    args.out.write_text(json.dumps(stats, indent=2))
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
