"""Tar-shard sample streaming (the WebDataset-format reader).

The reference stores samples as groups of files inside plain tar shards
(``{key}.rgbn.tif``, ``{key}.mask.tif``, ``{key}.lu.tif``, ``{key}.txt``)
written by ``wds.ShardWriter`` (/root/reference/scripts/createdataset.py:161-194)
and read back with ``wds.WebDataset`` (deadtreedata.py:263-288). This module
is a dependency-free reader of that exact on-disk format:

- :func:`iter_tar_samples` streams key-grouped dicts of raw bytes from one
  shard (webdataset convention: sample key = path up to the FIRST dot,
  suffix = the rest);
- :func:`decode_sample` replicates ``sample_decoder`` (deadtreedata.py:107-125):
  RGBA-converted 4-band image, L-converted masks, txt → {file, frac};
- :class:`ShardSampleStream` iterates many shards with buffered shuffling
  (``.shuffle(n)`` semantics) and epoch reshuffling of shard order.

IO and PIL decode are host-side by design — the accelerator never touches
bytes; decoded uint8 arrays go straight into the device prefetch queue
(see pipeline.py).
"""

from __future__ import annotations

import contextlib
import io
import os
import random
import re
import tarfile
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_BRACE_RANGE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def is_remote_shard(url: str) -> bool:
    """True for shard sources that are streams, not local files: ``pipe:CMD``
    (WebDataset convention — the command's stdout is the tar stream, e.g.
    ``pipe:gsutil cat gs://bucket/shard.tar``) and http(s) URLs."""
    return str(url).startswith(("pipe:", "http://", "https://"))


def expand_shard_urls(spec: str) -> List[str]:
    """WebDataset-style brace expansion: ``shard-{000000..000123}.tar`` →
    124 urls with the range's zero padding. Specs without a ``{a..b}``
    range pass through as a one-element list."""
    m = _BRACE_RANGE.search(spec)
    if m is None:
        return [spec]
    lo, hi = int(m.group(1)), int(m.group(2))
    width = len(m.group(1))
    head, tail = spec[: m.start()], spec[m.end() :]
    return [f"{head}{i:0{width}d}{tail}" for i in range(lo, hi + 1)]


@contextlib.contextmanager
def open_shard(url: str):
    """Open a shard source as a tarfile: local path (random access), or a
    sequential stream for ``pipe:`` / http(s) sources (``mode="r|*"``).

    The reference reads the same sources through WebDataset's url opener
    (deadtreedata.py:263; its tests exercise ``pipe:`` URLs). A ``pipe:``
    command that exits non-zero after a CLEANLY exhausted stream raises —
    a silently truncated object-store read must not look like a short
    shard. Abandoning the stream early (shuffle-buffer close, error paths)
    kills the child instead of waiting on it.
    """
    url = str(url)
    if url.startswith("pipe:"):
        import subprocess

        proc = subprocess.Popen(
            url[len("pipe:"):], shell=True, stdout=subprocess.PIPE
        )
        exhausted = False
        try:
            with tarfile.open(fileobj=proc.stdout, mode="r|*") as tf:
                yield tf
            exhausted = True
        finally:
            if exhausted:
                proc.stdout.close()
                rc = proc.wait()
                if rc != 0:
                    raise RuntimeError(
                        f"shard pipe command failed (exit {rc}): {url}"
                    )
            else:
                proc.kill()
                proc.wait()
    elif url.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(url) as resp:
            with tarfile.open(fileobj=resp, mode="r|*") as tf:
                yield tf
    else:
        with tarfile.open(url, "r") as tf:
            yield tf


def cache_shard(url: str, cache_dir) -> str:
    """Materialize a remote shard (pipe:/http) into ``cache_dir`` once and
    return the local path; local paths pass through. Later epochs — and the
    C++ native tar-index/decode fast path, which needs a real file — then
    skip the network entirely (WebDataset's url cache analogue). Downloads
    land atomically (tmp + rename), so concurrent streams at worst fetch
    twice, never read a torn file. A pipe command's non-zero exit discards
    the download."""
    from pathlib import Path

    if not is_remote_shard(url):
        return str(url)
    import hashlib

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    base = url.rstrip("/").rsplit("/", 1)[-1].rsplit(" ", 1)[-1] or "shard.tar"
    if not base.endswith(".tar"):
        base += ".tar"
    tag = hashlib.sha1(url.encode()).hexdigest()[:10]
    local = cache_dir / f"{tag}-{base}"
    if local.exists():
        return str(local)
    tmp = local.with_suffix(local.suffix + f".tmp{os.getpid()}")
    try:
        with open(tmp, "wb") as out:
            if url.startswith("pipe:"):
                import subprocess

                proc = subprocess.Popen(
                    url[len("pipe:"):], shell=True, stdout=out
                )
                rc = proc.wait()
                if rc != 0:
                    raise RuntimeError(
                        f"shard pipe command failed (exit {rc}): {url}"
                    )
            else:
                import shutil
                import urllib.request

                with urllib.request.urlopen(url) as resp:
                    shutil.copyfileobj(resp, out)
        tmp.replace(local)  # atomic publish
    finally:
        tmp.unlink(missing_ok=True)
    return str(local)


def iter_tar_samples(path: str) -> Iterator[Dict[str, bytes]]:
    """Stream samples (dicts of raw bytes keyed by suffix) from a tar shard.

    Adds ``__key__`` like webdataset. Files are grouped by prefix; group
    boundaries follow tar order (consecutive members with equal prefix),
    which is how ShardWriter lays them out. ``path`` may be a local file,
    a ``pipe:CMD`` source, or an http(s) URL (see :func:`open_shard`).
    """
    current_key: Optional[str] = None
    sample: Dict[str, bytes] = {}
    with open_shard(path) as tf:
        for member in tf:
            if not member.isfile():
                continue
            name = member.name
            if name.startswith("./"):
                name = name[2:]
            if "." not in name:
                continue
            key, suffix = name.split(".", 1)
            if key != current_key:
                if current_key is not None and sample:
                    sample["__key__"] = current_key.encode()
                    yield sample
                current_key = key
                sample = {}
            f = tf.extractfile(member)
            if f is not None:
                sample[suffix] = f.read()
        if current_key is not None and sample:
            sample["__key__"] = current_key.encode()
            yield sample


def image_decoder(data: bytes) -> np.ndarray:
    """4-band image decode (reference image_decoder, deadtreedata.py:91-96)."""
    from PIL import Image

    with io.BytesIO(data) as stream:
        img = Image.open(stream)
        img.load()
        img = img.convert("RGBA")
    return np.asarray(img)


def mask_decoder(data: bytes) -> np.ndarray:
    """Single-band mask decode (reference mask_decoder, deadtreedata.py:99-104)."""
    from PIL import Image

    with io.BytesIO(data) as stream:
        img = Image.open(stream)
        img.load()
        img = img.convert("L")
    return np.asarray(img)


def decode_sample(
    sample: Dict[str, bytes],
    img_suffix: str = "rgbn.tif",
    msk_suffix: str = "mask.tif",
    lu_suffix: str = "lu.tif",
) -> Dict:
    """Decode one raw sample (reference sample_decoder, deadtreedata.py:107-125).

    Returns dict with 'image' (H, W, 4) uint8, optional 'mask'/'lu' (H, W)
    uint8, and 'stats' {file, frac}.
    """
    assert img_suffix in sample, "Wrong image suffix provided"
    out: Dict = {"image": image_decoder(sample[img_suffix])}
    if "txt" in sample:
        out["stats"] = {
            "file": sample["__key__"].decode(),
            "frac": float(sample["txt"]),
        }
    if msk_suffix in sample:
        out["mask"] = mask_decoder(sample[msk_suffix])
    if lu_suffix in sample:
        out["lu"] = mask_decoder(sample[lu_suffix])
    return out


class ShardSampleStream:
    """Iterate decoded samples over a list of shards, optionally forever.

    ``shuffle`` is the webdataset-style buffered shuffle size (0 = off);
    shard order reshuffles each epoch when shuffling is on.

    ``raw=True`` defers image decode: samples come out as
    ``{"__raw__": {suffix: bytes}}`` markers that
    :func:`materialize_samples` turns into decoded samples later. Used by
    the multi-host eval path, where every process streams the full batch
    sequence (identical iteration order = deadlock-proof) but only decodes
    its own slice.
    """

    def __init__(
        self,
        shards: Sequence[str],
        *,
        shuffle: int = 0,
        seed: int = 0,
        loop: bool = False,
        raw: bool = False,
        cache_dir: Optional[str] = None,
    ):
        self.shards = [str(s) for s in shards]
        self.shuffle = shuffle
        self.loop = loop
        self.raw = raw
        self.cache_dir = cache_dir
        self._rng = random.Random(seed)

    def _resolve(self, shard: str) -> str:
        """Remote shards materialize into ``cache_dir`` on first touch
        (epoch 1 pays the download; every later epoch — and the native
        C++ fast path — reads the local file)."""
        if self.cache_dir is not None:
            return cache_shard(shard, self.cache_dir)
        return shard

    def __iter__(self) -> Iterator[Dict]:
        while True:
            shards = list(self.shards)
            if self.shuffle:
                self._rng.shuffle(shards)
            buf: List[Dict] = []
            for shard in shards:
                for raw in iter_tar_samples(self._resolve(shard)):
                    sample = {"__raw__": raw} if self.raw else decode_sample(raw)
                    if self.shuffle <= 1:
                        yield sample
                        continue
                    buf.append(sample)
                    if len(buf) >= self.shuffle:
                        idx = self._rng.randrange(len(buf))
                        buf[idx], buf[-1] = buf[-1], buf[idx]
                        yield buf.pop()
            self._rng.shuffle(buf)
            yield from buf
            if not self.loop:
                return


def count_shard_samples(path: str) -> int:
    """Sample count of one shard — the reference probes this by iterating the
    first shard at setup (deadtreedata.py:258); here it only parses tar
    headers, no decode."""
    return sum(1 for _ in iter_tar_samples(path))


class NativeShardSampleStream(ShardSampleStream):
    """C++-backed stream: native tar indexing + thread-pool TIFF decode
    (native/deadtrees_io.cpp via data/native.py). Whole shards decode as
    contiguous batches off the Python hot path; per-sample dicts are views.
    Falls back to the PIL path per shard on any decode error."""

    def __init__(self, *args, n_threads: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_threads = n_threads

    def _iter_shard(self, shard: str) -> Iterator[Dict]:
        from deadtrees_tpu.data import native

        if is_remote_shard(shard):
            # pipe:/http sources are sequential streams — no local file for
            # the C++ tar index to mmap; stream through the Python reader
            for raw in iter_tar_samples(shard):
                yield {"__raw__": raw} if self.raw else decode_sample(raw)
            return
        try:
            samples = native.index_shard_samples(shard)
            keys = list(samples)
            # decode dims from the first rgbn member
            first = samples[keys[0]]["rgbn.tif"]
            with open(shard, "rb") as f:
                f.seek(first[0])
                probe = native.tiff_decode(f.read(first[1]))
            h, w = probe.shape[:2]
            if self.raw:
                # defer decode: carry (shard, extents, dims); stats are a
                # few bytes — read them now so materialization stays pure
                # decode work
                with open(shard, "rb") as f:
                    for k in keys:
                        out = {"__native__": (shard, samples[k], (h, w))}
                        if "txt" in samples[k]:
                            off, size = samples[k]["txt"]
                            f.seek(off)
                            out["stats"] = {
                                "file": k, "frac": float(f.read(size))
                            }
                        yield out
                return
            rgbn = native.decode_batch(
                shard, [samples[k]["rgbn.tif"] for k in keys], (h, w, 4),
                n_threads=self.n_threads,
            )
            masks = lus = None
            if "mask.tif" in samples[keys[0]]:
                masks = native.decode_batch(
                    shard, [samples[k]["mask.tif"] for k in keys], (h, w, 1),
                    n_threads=self.n_threads,
                )
            if "lu.tif" in samples[keys[0]]:
                lus = native.decode_batch(
                    shard, [samples[k]["lu.tif"] for k in keys], (h, w, 1),
                    n_threads=self.n_threads,
                )
            with open(shard, "rb") as f:
                for i, k in enumerate(keys):
                    out: Dict = {"image": rgbn[i]}
                    if masks is not None:
                        out["mask"] = masks[i, ..., 0]
                    if lus is not None:
                        out["lu"] = lus[i, ..., 0]
                    if "txt" in samples[k]:
                        off, size = samples[k]["txt"]
                        f.seek(off)
                        out["stats"] = {"file": k, "frac": float(f.read(size))}
                    yield out
        except Exception:  # pragma: no cover - corrupted/unsupported shard
            for raw in iter_tar_samples(shard):
                yield {"__raw__": raw} if self.raw else decode_sample(raw)

    def __iter__(self) -> Iterator[Dict]:
        import random as _random

        while True:
            shards = list(self.shards)
            if self.shuffle:
                self._rng.shuffle(shards)
            buf: List[Dict] = []
            for shard in shards:
                for sample in self._iter_shard(self._resolve(shard)):
                    if self.shuffle <= 1:
                        yield sample
                        continue
                    buf.append(sample)
                    if len(buf) >= self.shuffle:
                        idx = self._rng.randrange(len(buf))
                        buf[idx], buf[-1] = buf[-1], buf[idx]
                        yield buf.pop()
            self._rng.shuffle(buf)
            yield from buf
            if not self.loop:
                return


def make_sample_stream(
    shards, *, shuffle: int = 0, seed: int = 0, loop: bool = False,
    prefer_native: bool = True, n_threads: int = 4, raw: bool = False,
    cache_dir: Optional[str] = None,
) -> ShardSampleStream:
    """Factory: native stream when the C++ library is built, else Python."""
    if prefer_native:
        try:
            from deadtrees_tpu.data import native

            if native.available():
                return NativeShardSampleStream(
                    shards, shuffle=shuffle, seed=seed, loop=loop,
                    n_threads=n_threads, raw=raw, cache_dir=cache_dir,
                )
        except Exception:  # pragma: no cover
            pass
    return ShardSampleStream(
        shards, shuffle=shuffle, seed=seed, loop=loop, raw=raw,
        cache_dir=cache_dir,
    )


def materialize_samples(
    samples: List[Dict], *, n_threads: int = 4
) -> List[Dict]:
    """Decode a list of raw-marker samples (see ``ShardSampleStream(raw=)``).

    ``__raw__`` markers go through :func:`decode_sample`; ``__native__``
    markers are grouped by shard and batch-decoded through the C++ thread
    pool (one ``decode_batch`` per member suffix per shard). Samples that
    are already decoded pass through unchanged. Output order matches input.
    """
    out: List[Optional[Dict]] = [None] * len(samples)
    by_shard: Dict[str, List[int]] = {}
    for i, s in enumerate(samples):
        if "__raw__" in s:
            out[i] = decode_sample(s["__raw__"])
        elif "__native__" in s:
            by_shard.setdefault(s["__native__"][0], []).append(i)
        else:
            out[i] = s

    for shard, idxs in by_shard.items():
        from deadtrees_tpu.data import native

        h, w = samples[idxs[0]]["__native__"][2]
        entries = [samples[i]["__native__"][1] for i in idxs]
        try:
            rgbn = native.decode_batch(
                shard, [e["rgbn.tif"] for e in entries], (h, w, 4),
                n_threads=n_threads,
            )
            masks = lus = None
            if "mask.tif" in entries[0]:
                masks = native.decode_batch(
                    shard, [e["mask.tif"] for e in entries], (h, w, 1),
                    n_threads=n_threads,
                )
            if "lu.tif" in entries[0]:
                lus = native.decode_batch(
                    shard, [e["lu.tif"] for e in entries], (h, w, 1),
                    n_threads=n_threads,
                )
        except Exception:
            # unsupported/corrupted members: PIL per member, like the
            # non-raw native stream's per-shard fallback — a bad shard must
            # degrade, not truncate the epoch (which would desync hosts)
            with open(shard, "rb") as f:

                def read(extent):
                    f.seek(extent[0])
                    return f.read(extent[1])

                for j, i in enumerate(idxs):
                    decoded = {"image": image_decoder(read(entries[j]["rgbn.tif"]))}
                    if "mask.tif" in entries[j]:
                        decoded["mask"] = mask_decoder(read(entries[j]["mask.tif"]))
                    if "lu.tif" in entries[j]:
                        decoded["lu"] = mask_decoder(read(entries[j]["lu.tif"]))
                    if "stats" in samples[i]:
                        decoded["stats"] = samples[i]["stats"]
                    out[i] = decoded
            continue
        for j, i in enumerate(idxs):
            decoded: Dict = {"image": rgbn[j]}
            if masks is not None:
                decoded["mask"] = masks[j, ..., 0]
            if lus is not None:
                decoded["lu"] = lus[j, ..., 0]
            if "stats" in samples[i]:
                decoded["stats"] = samples[i]["stats"]
            out[i] = decoded
    return out  # type: ignore[return-value]
