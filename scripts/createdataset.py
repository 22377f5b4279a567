#!/usr/bin/env python
"""Build training datasets: 2048² tiles → 256² subtile samples in tar shards.

Port of /root/reference/scripts/createdataset.py:197-460 with identical
dataset semantics, dependency-free (PIL + numpy + multiprocessing replace
rioxarray/webdataset/psutil):

1. split every (image, mask, lu) tile triple into tile_size² samples
   {rgbn.tif, mask.tif, lu.tif, txt=dead-frac%}, dropping constant
   (empty/padding) subtiles, into ``train-%06d.tar`` shards (SHARDSIZE=32);
2. re-shard dead-tree samples (frac>0) into balanced shards preserving the
   mean dead-pixel fraction per shard (utils split_df), padding the last
   shard with duplicates when >50% full, dropping incomplete shards
   (createdataset.py:336-376);
3. sample OVERSAMPLE_FACTOR× random non-deadtree subtiles into
   ``train-randomsamples-*`` shards with all-zero masks
   (createdataset.py:378-432);
4. interleave balanced+random 1:1 into ``train-combo-*`` shards of double
   size (createdataset.py:434-452), then clean up intermediates.
"""

from __future__ import annotations

import argparse
import io
import random
import sys
import tarfile
import tempfile
from functools import partial
from multiprocessing import Pool
from pathlib import Path
from typing import Iterable, List, Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from deadtrees_tpu.data.balance import split_df  # noqa: E402
from deadtrees_tpu.data.shardwriter import ShardWriter  # noqa: E402
from deadtrees_tpu.data.tar import iter_tar_samples  # noqa: E402

random.seed(42)

SHARDSIZE = 32
OVERSAMPLE_FACTOR = 2


class Extractor:
    """Extract (N, d, d, C) subtiles from one tile, zero-padding ragged tiles
    (reference Extractor, createdataset.py:53-74 — NHWC here)."""

    def __init__(self, *, tile_size: int = 256, source_dim: int = 2048):
        self.tile_size = tile_size
        self.source_dim = source_dim

    def __call__(self, arr: Optional[np.ndarray], *, n_bands: int) -> np.ndarray:
        if arr is None:
            data = np.zeros((self.source_dim, self.source_dim, n_bands), np.uint8)
        else:
            if arr.ndim == 2:
                arr = arr[..., None]
            if arr.shape[:2] != (self.source_dim, self.source_dim):
                data = np.zeros(
                    (self.source_dim, self.source_dim, arr.shape[-1]), arr.dtype
                )
                data[: arr.shape[0], : arr.shape[1]] = arr
            else:
                data = arr
        d = self.tile_size
        m = self.source_dim
        c = data.shape[-1]
        return (
            data.reshape(m // d, d, m // d, d, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1, d, d, c)
        )


def _read_tile(path: Optional[Path]) -> Optional[np.ndarray]:
    if path is None:
        return None
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img)


def _split_tile(
    paths: Tuple[Path, Optional[Path], Optional[Path]],
    *,
    source_dim: int,
    tile_size: int,
    format: str,
    valid_subtiles: Optional[Iterable[str]] = None,
) -> List[dict]:
    """One tile triple → list of sample dicts (createdataset.py:77-158)."""
    from PIL import Image

    image, mask, lu = paths
    extract = Extractor(tile_size=tile_size, source_dim=source_dim)

    img_arr = _read_tile(image)
    if img_arr is not None and img_arr.shape[-1] != 4:
        # force RGBN/RGBA 4-band layout
        img_arr = np.dstack([img_arr[..., :3], img_arr[..., -1:]])
    sub_rgbn = extract(img_arr, n_bands=4)
    sub_mask = extract(_read_tile(mask), n_bands=1)
    sub_lu = (
        extract(_read_tile(lu), n_bands=1)
        if lu
        else extract(None, n_bands=1) + 1  # all-one lu when absent
    )

    suffix = {"TIFF": "tif", "PNG": "png"}[format]
    valid = set(valid_subtiles) if valid_subtiles is not None else None

    samples = []
    for i in range(sub_rgbn.shape[0]):
        name = f"{image.stem}_{i:03}"
        if np.min(sub_rgbn[i]) == np.max(sub_rgbn[i]):
            continue  # constant subtile: padding / nodata
        if valid is not None and name not in valid:
            continue

        def encode(a: np.ndarray, mode: str) -> bytes:
            buf = io.BytesIO()
            Image.fromarray(a, mode).save(buf, format=format)
            return buf.getvalue()

        frac = round(
            float(np.count_nonzero(sub_mask[i])) / (tile_size * tile_size) * 100, 2
        )
        samples.append(
            {
                "__key__": name,
                f"rgbn.{suffix}": encode(sub_rgbn[i], "RGBA"),
                f"mask.{suffix}": encode(sub_mask[i].squeeze(-1), "L"),
                f"lu.{suffix}": encode(sub_lu[i].squeeze(-1), "L"),
                "txt": str(frac),
            }
        )
    return samples


def split_tiles(
    images, masks, lus, workers: int, shardpattern: str, **kwargs
) -> List[Tuple[str, str, str]]:
    """Parallel subtile split + shard write (createdataset.py:161-194)."""
    valid_subtiles = kwargs.get("valid_subtiles")
    stats = []
    fn = partial(_split_tile, **kwargs)
    triples = list(zip(images, masks, lus))
    with ShardWriter(shardpattern, maxcount=SHARDSIZE) as sink:
        if workers > 1:
            with Pool(workers) as pool:
                results = pool.map(fn, triples, chunksize=1)
        else:
            results = [fn(t) for t in triples]
        for tile_samples in results:
            for sample in tile_samples:
                if valid_subtiles:
                    if sample["__key__"] in set(valid_subtiles):
                        sink.write(sample)
                        stats.append((sample["__key__"], sample["txt"], "1"))
                else:
                    if float(sample["txt"]) > 0:
                        sink.write(sample)
                        stats.append((sample["__key__"], sample["txt"], "1"))
                    else:
                        stats.append((sample["__key__"], sample["txt"], "0"))
    return stats


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("image_dir", type=Path)
    parser.add_argument("mask_dir", type=Path)
    parser.add_argument("lu_dir", type=Path)
    parser.add_argument("outdir", type=Path)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--source_dim", type=int, default=2048)
    parser.add_argument("--tile_size", type=int, default=256)
    parser.add_argument("--format", default="TIFF", choices=["PNG", "TIFF"])
    parser.add_argument("--tmp-dir", dest="tmp_dir", type=Path, default=None)
    parser.add_argument("--subdir", dest="sub_dir", default="train")
    parser.add_argument("--stats", dest="stats_file", type=Path, default=Path("stats.csv"))
    args = parser.parse_args()

    import pandas as pd

    args.outdir.mkdir(parents=True, exist_ok=True)
    (args.outdir / args.sub_dir).mkdir(parents=True, exist_ok=True)
    if args.tmp_dir:
        args.tmp_dir.mkdir(parents=True, exist_ok=True)

    suffix = {"TIFF": "tif", "PNG": "png"}[args.format]

    images = sorted(args.image_dir.glob("*.tif"))
    masks = sorted(args.mask_dir.glob("*.tif"))
    lus = sorted(args.lu_dir.glob("*.tif"))
    image_names = {i.name for i in images}
    mask_names = {i.name for i in masks}
    lu_names = {i.name for i in lus}
    common = image_names & mask_names & lu_names
    train_images = sorted(i for i in images if i.name in common)
    train_masks = sorted(i for i in masks if i.name in common)
    train_lus = sorted(i for i in lus if i.name in common)

    cfg = dict(source_dim=args.source_dim, tile_size=args.tile_size, format=args.format)

    subtile_stats = split_tiles(
        train_images, train_masks, train_lus, args.workers,
        str(args.outdir / args.sub_dir / "train-%06d.tar"), **cfg,
    )

    with open(args.outdir / args.stats_file, "w") as fout:
        fout.write("tile,frac,status\n")
        for fname, frac, status in subtile_stats:
            fout.write(f"{fname},{frac},{status}\n")

    # --- balanced re-shard (createdataset.py:336-376) ----------------------
    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmpdir:
        for tf_name in sorted((args.outdir / args.sub_dir).glob("train-00*.tar")):
            with tarfile.open(tf_name) as tf:
                tf.extractall(tmpdir)

        df = pd.read_csv(args.outdir / args.stats_file)
        df = df[df.status > 0]
        n_valid = len(df)
        splits = split_df(df, SHARDSIZE)

        if SHARDSIZE // 2 < len(splits[-1]) < SHARDSIZE:
            n_missing = SHARDSIZE - len(splits[-1])
            splits[-1].extend(np.random.choice(splits[-1], size=n_missing).tolist())
        splits = [x for x in splits if len(x) == SHARDSIZE]
        assert len(splits) > 0, "Something went wrong"

        for s_cnt, s in enumerate(splits):
            with tarfile.open(
                args.outdir / args.sub_dir / f"train-balanced-{s_cnt:06}.tar", "w"
            ) as dst:
                random.shuffle(s)
                for i in s:
                    for part in (f"mask.{suffix}", f"lu.{suffix}", f"rgbn.{suffix}", "txt"):
                        dst.add(f"{tmpdir}/{i}.{part}", f"{i}.{part}")

    # --- random negatives (createdataset.py:378-432) -----------------------
    n_subtiles = (args.source_dim // args.tile_size) ** 2
    all_subtiles = set()
    for image_name in image_names:
        all_subtiles.update(
            f"{Path(image_name).stem}_{c:03}" for c in range(n_subtiles)
        )
    used = {x[0] for x in subtile_stats if int(x[2]) == 1}
    n_samples = min(n_valid * OVERSAMPLE_FACTOR, len(all_subtiles - used))
    random_subtiles = random.sample(sorted(all_subtiles - used), n_samples)
    random_tiles = sorted({x[:-4] for x in random_subtiles})

    all_images = sorted(args.image_dir.glob("*.tif"))
    random_images = [x for x in all_images if x.stem in random_tiles]
    random_images_names = {i.name for i in random_images}
    random_lus = [i for i in lus if i.name in random_images_names]
    if len(random_lus) != len(random_images):
        random_lus = [None] * len(random_images)

    cfg_rnd = dict(**cfg, valid_subtiles=random_subtiles)
    subtile_stats_rnd = split_tiles(
        random_images, [None] * len(random_images), random_lus, args.workers,
        str(args.outdir / args.sub_dir / "train-randomsamples-%06d.tar"), **cfg_rnd,
    )

    stats_file_rnd = Path(args.stats_file.stem + "_rnd.csv")
    with open(args.outdir / stats_file_rnd, "w") as fout:
        fout.write("tile,frac,status\n")
        for fname, frac, status in subtile_stats_rnd:
            fout.write(f"{fname},{frac},{status}\n")

    # --- combo interleave (createdataset.py:434-452) ------------------------
    balanced = sorted((args.outdir / args.sub_dir).glob("train-balanced*"))
    rnd = sorted((args.outdir / args.sub_dir).glob("train-random*"))[: len(balanced)]

    with ShardWriter(
        str(args.outdir / args.sub_dir / "train-combo-%06d.tar"),
        maxcount=SHARDSIZE * 2,
    ) as sink:
        for shard_a, shard_b in zip(balanced, rnd):
            for sa, sb in zip(iter_tar_samples(str(shard_a)), iter_tar_samples(str(shard_b))):
                sink.write(sa)
                sink.write(sb)

    for pattern in ("train-random*", "train-balanced*", "train-0*"):
        for filename in (args.outdir / args.sub_dir).glob(pattern):
            filename.unlink()


if __name__ == "__main__":
    main()
