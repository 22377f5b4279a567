"""Shard discovery and train/val/test splitting.

Port of ``split_shards`` (/root/reference/deadtrees/data/deadtreedata.py:47-88)
— pure host-side logic, reproduced with identical semantics including the
small-shard-count fixups (the "trying to fix this" branches) and the
two-fraction variant used for extra datasets.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def split_shards(
    original_list: Sequence, split_fractions: Sequence[float]
) -> List[Optional[List[str]]]:
    """Distribute shards into train/val(/test) lists by fractions.

    Matches the reference exactly: sort, round-to-nearest contiguous spans,
    then a fixup when any span lands empty (3-way: train gets all-but-2,
    val 1, test 1; 2-way: all-but-1 / 1), and a trailing ``None`` appended
    when only two fractions are given.
    """
    assert np.isclose(
        sum(split_fractions), 1.0
    ), f"Split fractions do not sum to 1: {sum(split_fractions)}"

    items = [str(x) for x in sorted(original_list)]

    sublists: List[List[str]] = []
    prev = 0
    for weight in split_fractions:
        nxt = prev + int(round(len(items) * weight, 0))
        sublists.append(items[prev:nxt])
        prev = nxt

    assert sum(len(x) for x in sublists) == len(items), "Split size mismatch"

    if not all(len(x) > 0 for x in sublists):
        logger.warning("Unexpected shard distribution encountered - trying to fix this")
        if len(split_fractions) == 3:
            if len(sublists[0]) > 2:
                sublists[0] = items[:-2]
                sublists[1] = items[-2:-1]
                sublists[2] = items[-1:]
            else:
                raise ValueError(
                    f"Not enough shards (#{len(items)}) for new distribution"
                )
        elif len(split_fractions) == 2:
            sublists[0] = items[:-1]
            sublists[1] = items[-1:]
        else:
            raise ValueError
        logger.warning(f"New shard split: {sublists}")

    out: List[Optional[List[str]]] = list(sublists)
    if len(out) != 3:
        logger.warning("No test shards specified")
        out.append(None)

    return out


def discover_shards(data_dir, pattern: str) -> List[Path]:
    """Sorted shard paths matching ``pattern`` (DataModule ctor,
    deadtreedata.py:207-212).

    ``data_dir`` may also be a REMOTE shard spec — ``pipe:CMD`` or an
    http(s) URL, optionally with a WebDataset brace range
    (``...-{000000..000123}.tar``) — in which case ``pattern`` is ignored
    and the expanded url list is returned (the reference reaches the same
    sources through WebDataset's url opener, deadtreedata.py:263)."""
    from deadtrees_tpu.data.tar import expand_shard_urls, is_remote_shard

    if isinstance(data_dir, str) and is_remote_shard(data_dir):
        return expand_shard_urls(data_dir)
    return sorted(Path(data_dir).glob(pattern))
