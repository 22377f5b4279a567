"""Input pipeline: shards → host decode → device prefetch → on-device augment.

TPU-native redesign of ``DeadtreesDataModule``
(/root/reference/deadtrees/data/deadtreedata.py:192-405). The reference's
shape — WebDataset streams, buffered shuffle, main+extra dataset mixing,
per-sample CPU augmentation + scipy EDT in DataLoader workers — becomes:

- host THREADS stream + decode tar samples (tar.py) and assemble uint8
  numpy batches (decode is the only CPU work left);
- batches are device_put asynchronously (double-buffered prefetch queue);
- augmentation + normalization run batched ON DEVICE (augment.py);
- the boundary-loss distance maps are computed ON DEVICE from the augmented
  masks (losses/functional.py EDT) — the reference's single biggest CPU
  hotspot (deadtreedata.py:182-187) moved to the accelerator;
- "extra" negative datasets are mixed by concatenating host batches before
  upload, with main batch size reduced by the extra amounts
  (deadtreedata.py:348-370 + segmodel.py create_combined_batch:43-54).

Multi-host: train shards are assigned disjointly per process; eval streams
the same RAW batch sequence on every process (identical pacing/termination
— deadlock-proof with zero coordination) while each process decodes only
its slice of every global batch (tar.py materialize_samples), so eval
decode work is O(1) in process_count.

Reference behaviors preserved: shard splitting incl. the single-directory
vs train/val/test layout switch (deadtreedata.py:207-212, 247-255), epoch
length ``len(shards) * shard_size // batch_size`` (deadtreedata.py:273),
shard-size probe from the first shard (deadtreedata.py:258 — but via tar
headers only, not a full decode pass), class collapse for 2-class setups
(deadtreedata.py:179-180), channel truncation (deadtreedata.py:176).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.data.augment import augment_batch
from deadtrees_tpu.data.config import DATASET_CONFIG
from deadtrees_tpu.data.shards import discover_shards, split_shards
from deadtrees_tpu.data.tar import (
    ShardSampleStream,
    count_shard_samples,
    make_sample_stream,
    materialize_samples,
)
from deadtrees_tpu.losses.functional import batch_one_hot2dist, class2one_hot


@dataclasses.dataclass
class DataConfig:
    data_dir: Union[str, List[str]]  # one dir (split by fractions) or [train, val, test]
    pattern: str = "*.tar"
    batch_size: int = 32
    pattern_extra: Optional[List[str]] = None
    batch_size_extra: Optional[List[int]] = None
    shuffle_buffer: int = 128
    num_workers: int = 2  # host decode threads per stream
    prefetch: int = 2  # batches in flight to device
    in_channels: int = 4
    classes: int = 3
    distmap: bool = True
    split_fractions: Sequence[float] = DATASET_CONFIG.fractions
    seed: int = 0
    use_native: bool = True  # C++ tar/TIFF fast path when built
    # local materialization dir for REMOTE shards (pipe:/http): epoch 1
    # streams the download into the cache, later epochs (and the native
    # decoder) read the local file (tar.cache_shard)
    cache_dir: Optional[str] = None
    # multi-host input sharding (SURVEY.md §5.8): each process reads only
    # its shard subset and contributes a process-local slice of the global
    # batch. Defaults resolve to jax.process_index()/process_count().
    process_index: Optional[int] = None
    process_count: Optional[int] = None


def _stack_samples(
    samples: List[Dict], *, in_channels: int, classes: int
) -> Dict[str, np.ndarray]:
    """Assemble decoded samples into one uint8 host batch."""
    imgs = np.stack([s["image"][..., :in_channels] for s in samples])
    batch: Dict[str, np.ndarray] = {"image": imgs}
    if "mask" in samples[0]:
        masks = np.stack([s["mask"] for s in samples]).astype(np.int32)
        if classes == 2:
            masks[masks > 1] = 1  # deadtreedata.py:179-180
        batch["mask"] = masks
    if "lu" in samples[0]:
        batch["lu"] = np.stack([s["lu"] for s in samples]).astype(np.int32)
    batch["files"] = [s.get("stats", {}).get("file", "") for s in samples]
    return batch


class _BatchProducer:
    """Background thread turning a sample stream into a queue of host batches.

    ``slice_range=(a, b)`` is the multi-host eval mode: the stream yields
    RAW (undecoded) samples, the producer still consumes ``batch_size`` of
    them per step — identical pacing and termination on every host — but
    only positions [a, b) of each batch are decoded and emitted. a == b
    yields empty-marker ``{}`` batches (this host's slice lives in another
    stream part). Decode work per host drops to slice/batch_size of the
    r2 design, which decoded the full batch everywhere (O(process_count)
    duplication).
    """

    def __init__(
        self,
        stream: ShardSampleStream,
        batch_size: int,
        cfg: DataConfig,
        slice_range: Optional[Tuple[int, int]] = None,
    ):
        self.stream = stream
        self.batch_size = batch_size
        self.cfg = cfg
        self.slice_range = slice_range
        self.q: "queue.Queue" = queue.Queue(maxsize=cfg.prefetch + 1)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _make_batch(self, buf: List[Dict]) -> Dict:
        if self.slice_range is not None:
            a, b = self.slice_range
            buf = materialize_samples(
                buf[a:b], n_threads=self.cfg.num_workers
            )
            if not buf:
                return {}
        return _stack_samples(
            buf, in_channels=self.cfg.in_channels, classes=self.cfg.classes
        )

    def _run(self):
        buf: List[Dict] = []
        try:
            for sample in self.stream:
                if self._stop.is_set():
                    return
                buf.append(sample)
                if len(buf) == self.batch_size:
                    self.q.put(self._make_batch(buf))
                    buf = []
            # drop partial batches (.batched(bs, partial=False), deadtreedata.py:351)
        except BaseException as e:  # surface on the consumer thread: a
            # silently truncated epoch would desync multi-host collectives
            self.q.put(e)
        finally:
            self.q.put(None)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        while True:
            item = self.q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def stop(self):
        self._stop.set()


class DeadtreesDataModule:
    """Shards → ready-to-train device batches."""

    def __init__(self, config: DataConfig):
        self.cfg = config
        if isinstance(config.data_dir, (list, tuple)):
            self.data_shards = [
                [str(p) for p in discover_shards(d, config.pattern)]
                for d in config.data_dir
            ]
            self.layout = "train/val/test"
        else:
            self.data_shards = [
                str(p) for p in discover_shards(config.data_dir, config.pattern)
            ]
            self.layout = "single_directory"

        self.data_shards_extra: List[List[str]] = []
        if config.pattern_extra:
            if self.layout == "train/val/test":
                raise ValueError(
                    "Combining pattern_extra with train/val/test layout not allowed"
                )
            if not config.batch_size_extra or len(config.batch_size_extra) != len(
                config.pattern_extra
            ):
                raise ValueError(
                    "Len of <pattern_extra> and <batch_size_extra> don't match"
                )
            from deadtrees_tpu.data.tar import is_remote_shard

            for p in config.pattern_extra:
                if is_remote_shard(p):
                    # extra datasets may be remote specs of their own
                    self.data_shards_extra.append(
                        [str(x) for x in discover_shards(p, "")]
                    )
                elif isinstance(config.data_dir, str) and is_remote_shard(
                    config.data_dir
                ):
                    raise ValueError(
                        "with a remote data_dir, pattern_extra entries must be "
                        "full remote shard specs (pipe:/http), not glob patterns"
                    )
                else:
                    self.data_shards_extra.append(
                        [str(x) for x in discover_shards(config.data_dir, p)]
                    )

        self._setup_done = False

    def setup(self) -> None:
        cfg = self.cfg
        if self.layout == "single_directory":
            train_shards, valid_shards, test_shards = split_shards(
                self.data_shards, list(cfg.split_fractions)
            )
        else:
            train_shards, valid_shards, test_shards = self.data_shards

        self.train_shards = train_shards
        self.valid_shards = valid_shards
        self.test_shards = test_shards

        # multi-host: disjoint round-robin train-shard assignment; every
        # process keeps the full val/test lists (identical metrics on all
        # hosts) and contributes its slice of each eval batch instead.
        pi, pc = self.process_index, self.process_count
        self.train_shards_local = list(train_shards[pi::pc])
        if pc > 1 and not self.train_shards_local:
            raise ValueError(
                f"process {pi}/{pc} got no train shards "
                f"({len(train_shards)} total) — need >= one shard per host"
            )

        probe = train_shards[0]
        if self.cfg.cache_dir is not None:
            # prime the cache: the probe download is then reused by epoch 1
            from deadtrees_tpu.data.tar import cache_shard

            probe = cache_shard(probe, self.cfg.cache_dir)
        self.shard_size = count_shard_samples(probe)

        self.extra_train_shards: List[List[str]] = []
        self.extra_valid_shards: List[List[str]] = []
        for shards in self.data_shards_extra:
            train_frac = len(train_shards) / (len(train_shards) + len(valid_shards))
            ex_train, ex_val, _ = split_shards(shards, [train_frac, 1 - train_frac])
            self.extra_train_shards.append(ex_train)
            self.extra_valid_shards.append(ex_val)

        self._setup_done = True

    # -- multi-host geometry -------------------------------------------------
    @property
    def process_index(self) -> int:
        if self.cfg.process_index is not None:
            return int(self.cfg.process_index)
        return jax.process_index()

    @property
    def process_count(self) -> int:
        if self.cfg.process_count is not None:
            return int(self.cfg.process_count)
        return jax.process_count()

    @property
    def local_batch_size(self) -> int:
        """Per-process batch size; the global batch is assembled from these
        (jax.make_array_from_process_local_data in parallel.shard_batch)."""
        pc = self.process_count
        if self.cfg.batch_size % pc:
            raise ValueError(
                f"batch_size {self.cfg.batch_size} not divisible by "
                f"process_count {pc}"
            )
        return self.cfg.batch_size // pc

    # -- epoch lengths (deadtreedata.py:273 semantics) ---------------------
    @property
    def main_batch_size(self) -> int:
        extra = sum(self.cfg.batch_size_extra or [])
        return self.cfg.batch_size - extra

    @property
    def steps_per_epoch(self) -> int:
        """Steps every process can take: bounded by the SMALLEST per-process
        shard assignment so multi-host collectives never deadlock on an
        uneven tail epoch."""
        pc = self.process_count
        if pc == 1:
            return len(self.train_shards) * self.shard_size // self.cfg.batch_size
        min_local = min(
            len(self.train_shards[p::pc]) for p in range(pc)
        )
        return min_local * self.shard_size // self.local_batch_size

    # -- device-side finishing --------------------------------------------
    def _finish_batch(
        self, rng: jax.Array, host_batch: Dict, *, train: bool
    ) -> Dict[str, jnp.ndarray]:
        out = augment_batch(
            rng,
            jnp.asarray(host_batch["image"]),
            jnp.asarray(host_batch["mask"]) if "mask" in host_batch else None,
            jnp.asarray(host_batch["lu"]) if "lu" in host_batch else None,
            train=train,
        )
        if self.cfg.distmap and "mask" in out:
            one_hot = class2one_hot(out["mask"], self.cfg.classes)
            out["distmap"] = batch_one_hot2dist(one_hot)
        out["files"] = host_batch["files"]
        return out

    def _combined_stream(
        self,
        main_shards: List[str],
        extra_shards: List[List[str]],
        *,
        shuffle: int,
        train: bool,
        loop: bool,
        rng: jax.Array,
        stream_seed: Optional[int] = None,
        batch_divisor: int = 1,
        local_slice: bool = False,
    ) -> Iterator[Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        # stream_seed varies per epoch for training (derived from the epoch
        # rng in train_batches) so shard order + buffered-shuffle draws
        # differ every epoch — the reference's WebDataset pipeline reshuffles
        # per epoch too; a constant seed would replay identical batches.
        seed = cfg.seed if stream_seed is None else stream_seed

        def div(n: int) -> int:
            if n % batch_divisor:
                raise ValueError(
                    f"batch component {n} not divisible by process_count "
                    f"{batch_divisor}"
                )
            return n // batch_divisor

        # multi-host eval: every process streams the same RAW batch sequence
        # (identical iteration order + termination = deadlock-proof, zero
        # coordination) but DECODES only its slice of each global batch —
        # the part producers emit local slices directly, so host decode
        # work is O(1) in process_count instead of O(process_count).
        # sizes of the concatenated batch parts: [main, *extras]. When the
        # caller passes no extra shards (e.g. test_batches), the main part
        # is the whole batch even if batch_size_extra is configured.
        part_sizes = [
            div(self.main_batch_size if extra_shards else cfg.batch_size)
        ] + [
            div(bs)
            for bs, _ in zip(cfg.batch_size_extra or [], extra_shards)
        ]
        slice_ranges: List[Optional[Tuple[int, int]]] = [None] * len(part_sizes)
        if local_slice:
            pi, n = self.process_index, self.local_batch_size
            lo, hi = pi * n, (pi + 1) * n
            off = 0
            for k, size in enumerate(part_sizes):
                a = min(max(lo - off, 0), size)
                b = min(max(hi - off, 0), size)
                slice_ranges[k] = (a, max(a, b))
                off += size

        main = _BatchProducer(
            make_sample_stream(
                main_shards, shuffle=shuffle, seed=seed, loop=loop,
                prefer_native=cfg.use_native, n_threads=cfg.num_workers,
                raw=local_slice, cache_dir=cfg.cache_dir,
            ),
            part_sizes[0],
            cfg,
            slice_range=slice_ranges[0],
        )
        extras = [
            _BatchProducer(
                make_sample_stream(
                    shards, shuffle=shuffle, seed=seed + 1 + i, loop=True,
                    prefer_native=cfg.use_native, n_threads=cfg.num_workers,
                    raw=local_slice, cache_dir=cfg.cache_dir,
                ),
                part_sizes[1 + i],
                cfg,
                slice_range=slice_ranges[1 + i],
            )
            for i, shards in enumerate(extra_shards)
        ]
        extra_iters = [iter(e) for e in extras]

        try:
            for host_batch in main:
                # concat main + extra host batches (create_combined_batch).
                # Under local_slice each part is already this host's slice;
                # {} marks a part whose samples all belong to other hosts.
                if extra_iters:
                    parts = [host_batch] + [next(it) for it in extra_iters]
                    parts = [p for p in parts if p]
                    host_batch = {
                        "image": np.concatenate([p["image"] for p in parts]),
                        "mask": np.concatenate([p["mask"] for p in parts]),
                        "files": sum((p["files"] for p in parts), []),
                    }
                    if "lu" in parts[0]:
                        host_batch["lu"] = np.concatenate(
                            [p.get("lu", np.zeros_like(p["mask"])) for p in parts]
                        )
                rng, sub = jax.random.split(rng)
                yield self._finish_batch(sub, host_batch, train=train)
        finally:
            main.stop()
            for e in extras:
                e.stop()

    def train_batches(
        self, rng: Optional[jax.Array] = None, *, loop: bool = False
    ) -> Iterator[Dict[str, jnp.ndarray]]:
        assert self._setup_done, "call setup() first"
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        rng = jax.random.fold_in(rng, self.process_index)
        seed_rng, rng = jax.random.split(rng)
        stream_seed = int(jax.random.randint(seed_rng, (), 0, 2**31 - 1))
        pc = self.process_count
        extra_local = [
            (shards[self.process_index::pc] or shards)
            for shards in self.extra_train_shards
        ]
        return self._combined_stream(
            self.train_shards_local,
            extra_local,
            shuffle=max(self.cfg.shuffle_buffer, self.shard_size),
            train=True,
            loop=loop,
            rng=rng,
            stream_seed=stream_seed,
            batch_divisor=pc,
        )

    def val_batches(self) -> Iterator[Dict[str, jnp.ndarray]]:
        assert self._setup_done, "call setup() first"
        return self._combined_stream(
            self.valid_shards,
            self.extra_valid_shards,
            shuffle=0,
            train=False,
            loop=False,
            rng=jax.random.PRNGKey(0),
            local_slice=self.process_count > 1,
        )

    def test_batches(self) -> Iterator[Dict[str, jnp.ndarray]]:
        assert self._setup_done, "call setup() first"
        if not self.test_shards:
            return iter(())
        return self._combined_stream(
            self.test_shards, [], shuffle=0, train=False, loop=False,
            rng=jax.random.PRNGKey(0),
            local_slice=self.process_count > 1,
        )
