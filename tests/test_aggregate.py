"""aggregate_results CLI: predicted+forest tiles → yearly CSV + shapefile.

Covers the reference's post-inference aggregation contract
(/root/reference/scripts/aggregate_results.py:27-123): pair predicted
tiles with forest-mask tiles by name across the processed.lus.{year} /
predicted.{year} directory swap, keep tiles with ≥limit% forest cover,
compute conifer/broadleaf dead fractions over forest pixels, and write
aggregated_{year}.csv plus a shapefile with the same attributes on the
tile bounding boxes.
"""

import csv
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

YEAR = 2020


@pytest.fixture()
def tile_dirs(tmp_path):
    from deadtrees_tpu.infer.geotiff import write_geotiff

    forest = tmp_path / f"processed.lus.{YEAR}"
    pred = tmp_path / f"predicted.{YEAR}"
    forest.mkdir()
    pred.mkdir()

    size = 64
    specs = [
        # (name, forest_frac, conifer_frac, broadleaf_frac)
        ("ortho_a.tif", 1.0, 0.25, 0.0),
        ("ortho_b.tif", 0.5, 0.0, 0.5),
        ("ortho_c.tif", 0.02, 0.5, 0.5),  # below the 10% forest limit
    ]
    for i, (name, ff, cf, bf) in enumerate(specs):
        n = size * size
        lu = np.zeros(n, np.uint8)
        lu[: int(ff * n)] = 1
        mask = np.zeros(n, np.uint8)
        nf = int(ff * n)
        mask[: int(cf * nf)] = 1
        mask[int(cf * nf) : int((cf + bf) * nf)] = 2
        geo = {
            "backend": "pil",
            "tags": {
                33550: (0.2, 0.2, 0.0),
                33922: (0.0, 0.0, 0.0, 500000.0 + 100.0 * i, 5400000.0, 0.0),
            },
        }
        write_geotiff(forest / name, lu.reshape(size, size), geo)
        write_geotiff(pred / name, mask.reshape(size, size), geo)
    return tmp_path, forest, specs


def test_aggregate_csv_and_shapefile(tile_dirs):
    tmp_path, forest, specs = tile_dirs
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "aggregate_results.py"),
         str(forest), "--years", str(YEAR), "--limit", "10"],
        check=True, cwd=str(tmp_path),
    )

    with open(tmp_path / f"aggregated_{YEAR}.csv") as f:
        rows = {r["tile"]: r for r in csv.DictReader(f)}
    # the 2%-forest tile is dropped by the limit
    assert set(rows) == {"ortho_a", "ortho_b"}
    # fractions are over FOREST pixels (not all pixels)
    assert float(rows["ortho_a"]["conifer"]) == pytest.approx(25.0, abs=0.2)
    assert float(rows["ortho_a"]["broadleaf"]) == pytest.approx(0.0, abs=0.2)
    # ortho_b: dead-broadleaf pixels = 0.5·forest → 50% of forest pixels
    assert float(rows["ortho_b"]["broadleaf"]) == pytest.approx(50.0, abs=0.5)
    assert float(rows["ortho_b"]["total"]) == pytest.approx(50.0, abs=0.5)

    from deadtrees_tpu.geo.shapefile import read_shapefile

    recs = read_shapefile(tmp_path / f"aggregated_{YEAR}.shp")
    assert len(recs) == 2
    assert {"conifer", "broadleaf", "total"} <= set(recs[0]["attributes"])
    # distinct per-tile bounding boxes from the geo tags
    assert len({r["bbox"][0] for r in recs}) == 2
    for r in recs:
        x1, y1, x2, y2 = r["bbox"]
        assert (x2 - x1) == pytest.approx(64 * 0.2, abs=1e-6)
        assert (y2 - y1) == pytest.approx(64 * 0.2, abs=1e-6)


def test_aggregate_missing_year_errors(tile_dirs):
    tmp_path, forest, _ = tile_dirs
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "aggregate_results.py"),
         str(forest), "--years", "1999"],
        cwd=str(tmp_path), capture_output=True, text=True,
    )
    assert res.returncode != 0
    assert "1999" in (res.stderr + res.stdout)
