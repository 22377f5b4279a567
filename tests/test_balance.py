"""split_df shard balancing (reference tests/test_data_splitting.py:32-67
semantics): invalid sizes raise, zero-fraction tiles raise, totals are
preserved, partition count is ceil(n/size), and per-shard fraction sums
stay approximately equal on a skewed distribution.
"""

import math
from functools import reduce

import numpy as np
import pandas as pd
import pytest

from deadtrees_tpu.data.balance import split_df


def make_df(n=60, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "tile": [f"tile_{i:04d}" for i in range(n)],
            # heavy-tailed like real dead-pixel fractions
            "frac": rng.gamma(2.0, 1.5, size=n) + 1e-7,
        }
    )


@pytest.mark.parametrize("size", [0, 61, -3])
def test_invalid_shard_size_raises(size):
    with pytest.raises(ValueError, match="Shard size"):
        split_df(make_df(), size)


def test_tiles_without_deadtrees_raise():
    df = make_df()
    df.loc[5, "frac"] = 0.0
    with pytest.raises(ValueError, match="deadtrees"):
        split_df(df, 10)
    # ... unless the caller opts out (negatives-only shards)
    shards = split_df(df, 10, require_deadtrees=False)
    assert sum(len(s) for s in shards) == len(df)


def test_totals_and_partition_count():
    df = make_df()
    for size in (1, 7, 10, 60):
        shards = split_df(df, size)
        flat = reduce(lambda a, b: a + b, shards)
        assert len(flat) == len(df)
        assert len(set(flat)) == len(df)  # no tile duplicated or dropped
        assert len(shards) == math.ceil(len(df) / size)


def test_shard_fraction_sums_approx_equal():
    rng = np.random.default_rng(42)
    df = pd.DataFrame(
        {
            "tile": [f"tile_{i:04d}" for i in range(100)],
            # the reference test's distribution shape (gamma k=9, θ=0.5:
            # tight around the mean, like real shard fraction profiles)
            "frac": rng.gamma(9, 0.5, size=100) + 1e-7,
        }
    )
    shards = split_df(df, 10)  # 10 shards
    lookup = dict(zip(df["tile"], df["frac"]))
    totals = [sum(lookup[t] for t in s) for s in shards]
    expected = df["frac"].sum() / len(shards)
    # greedy round-robin over the descending sort keeps every shard's
    # fraction mass close to the mean (reference tolerance: ±5 on ~45)
    assert totals == pytest.approx([expected] * len(totals), abs=0.11 * expected)


def test_single_shard_gets_everything():
    df = make_df(n=9)
    shards = split_df(df, 9)
    assert len(shards) == 1
    assert sorted(shards[0]) == sorted(df["tile"])
