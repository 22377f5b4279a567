"""mergedatasets.py guards: destination names are year-tagged, so two
input directories resolving to the same year (or any destination
collision) must be a hard error — not a silent shard overwrite
(reference scripts/mergedatasets.py merges per-year shard dirs).
"""

import importlib.util
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "mergedatasets",
    Path(__file__).resolve().parents[1] / "scripts" / "mergedatasets.py",
)
mds = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(mds)


def _make_year_dir(root: Path, year: str, n_shards: int = 4) -> Path:
    d = root / f"dataset_{year}"
    d.mkdir(parents=True)
    for i in range(n_shards):
        (d / f"train-{i:06d}.tar").write_bytes(b"tar" + bytes([i]))
    return d


def test_plan_moves_tags_years(tmp_path):
    a = _make_year_dir(tmp_path, "2017")
    b = _make_year_dir(tmp_path, "2018")
    moves = list(mds.plan_moves([a, b], tmp_path / "out", [0.5, 0.25, 0.25]))
    assert len(moves) == 8
    dests = {d.name for _, d in moves}
    assert len(dests) == 8  # all destinations distinct
    assert any("2017" in n for n in dests) and any("2018" in n for n in dests)


def test_plan_moves_rejects_duplicate_years(tmp_path):
    a = _make_year_dir(tmp_path / "runA", "2019")
    b = _make_year_dir(tmp_path / "runB", "2019")
    with pytest.raises(ValueError, match="duplicate year"):
        list(mds.plan_moves([a, b], tmp_path / "out", [0.5, 0.25, 0.25]))
