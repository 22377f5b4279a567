"""Tiny synthetic dataset for the example walkthroughs.

Writes webdataset-style tar shards with the exact member layout
`scripts/createdataset.py` produces (and the reference's
scripts/createdataset.py:437-447 defines): per sample a 4-band
``<key>.rgbn.tif``, a ``<key>.mask.tif``, a ``<key>.lu.tif`` and a
``<key>.txt`` deadwood-fraction sidecar. The imagery is random — the
point of the examples is the mechanics, not the model quality.
"""

from __future__ import annotations

import io
import tarfile
from pathlib import Path

import numpy as np


def write_synthetic_shard(path: Path, n: int, size: int = 32, seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tf:

        def add(name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        def tiff(arr: np.ndarray, mode: str) -> bytes:
            buf = io.BytesIO()
            Image.fromarray(arr, mode=mode).save(buf, format="TIFF")
            return buf.getvalue()

        for i in range(n):
            key = f"sample_{i:04d}"
            rgbn = rng.integers(0, 255, (size, size, 4), dtype=np.uint8)
            mask = rng.integers(0, 3, (size, size), dtype=np.uint8)
            lu = rng.integers(0, 2, (size, size), dtype=np.uint8)
            add(f"{key}.rgbn.tif", tiff(rgbn, "RGBA"))
            add(f"{key}.mask.tif", tiff(mask, "L"))
            add(f"{key}.lu.tif", tiff(lu, "L"))
            add(f"{key}.txt", f"{mask.astype(bool).mean() * 100:.2f}".encode())


def make_dataset(root: Path, shards: int = 4, samples: int = 8, size: int = 32) -> Path:
    root.mkdir(parents=True, exist_ok=True)
    for i in range(shards):
        write_synthetic_shard(root / f"train-{i:06d}.tar", samples, size=size, seed=i)
    return root
