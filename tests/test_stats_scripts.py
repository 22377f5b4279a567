"""Dataset/prediction statistics CLIs.

- scripts/computestats.py (reference scripts/computestats.py:57-180):
  two-pass channel mean/std with the reference's skip rules (empty tiles
  where band 1 ∈ {0,1}, non-square tiles, uniform subtiles), tif-dir and
  tar-shard inputs.
- scripts/computestats_inference.py (reference :16-79): per-year class
  pixel counts outer-joined on tile id, dead area in m² at the exact
  0.2000223 m pixel factors.
"""

import io
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def tiff_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, "RGBA").save(buf, format="TIFF")
    return buf.getvalue()


def checker_tile(size=64) -> np.ndarray:
    """Alternating 100/200 columns in every channel: known mean and std."""
    arr = np.full((size, size, 4), 100, np.uint8)
    arr[:, ::2, :] = 200
    return arr


CHECKER_MEAN = 150.0 / 255.0
CHECKER_STD = 50.0 / 255.0


@pytest.fixture()
def tif_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "tiles"
    d.mkdir()
    Image.fromarray(checker_tile(), "RGBA").save(d / "good.tif")

    # "empty" tile: band 1 only holds 0/1 values -> skipped entirely
    empty = np.zeros((64, 64, 4), np.uint8)
    empty[..., 0] = np.arange(64, dtype=np.uint8)[:, None] % 2
    empty[..., 1:] = 140
    Image.fromarray(empty, "RGBA").save(d / "empty.tif")

    # non-square (partial edge) tile -> skipped
    ragged = np.full((64, 32, 4), 90, np.uint8)
    ragged[:, :16] = 60
    Image.fromarray(ragged, "RGBA").save(d / "ragged.tif")
    return d


def run_computestats(args, cwd):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / "computestats.py"), *args],
        check=True, cwd=str(cwd), capture_output=True, text=True,
    )


def test_computestats_tif_dir(tif_dir, tmp_path):
    out = tmp_path / "stats.json"
    run_computestats(
        [str(tif_dir), "--tile-size", "64", "--out", str(out)], tmp_path
    )
    stats = json.loads(out.read_text())
    # only the checker tile contributes: 1 subtile at tile-size 64
    assert stats["subtiles"] == 1
    np.testing.assert_allclose(stats["mean"], [CHECKER_MEAN] * 4, atol=1e-6)
    np.testing.assert_allclose(stats["std"], [CHECKER_STD] * 4, atol=1e-6)


def test_computestats_subtile_split(tif_dir, tmp_path):
    """tile-size 32 splits the 64² checker into 4 subtiles, same stats."""
    out = tmp_path / "stats32.json"
    run_computestats(
        [str(tif_dir), "--tile-size", "32", "--out", str(out)], tmp_path
    )
    stats = json.loads(out.read_text())
    assert stats["subtiles"] == 4
    np.testing.assert_allclose(stats["mean"], [CHECKER_MEAN] * 4, atol=1e-6)


def test_computestats_tar_shards(tmp_path):
    from deadtrees_tpu.data.shardwriter import ShardWriter

    d = tmp_path / "shards"
    with ShardWriter(str(d / "train-%06d.tar"), maxcount=8) as w:
        w.write({"__key__": "s0", "rgbn.tif": tiff_bytes(checker_tile())})
        empty = np.zeros((64, 64, 4), np.uint8)  # skipped (band 1 all zero)
        w.write({"__key__": "s1", "rgbn.tif": tiff_bytes(empty)})

    out = tmp_path / "stats.json"
    run_computestats(
        [str(d), "--tile-size", "64", "--out", str(out)], tmp_path
    )
    stats = json.loads(out.read_text())
    assert stats["subtiles"] == 1
    np.testing.assert_allclose(stats["mean"], [CHECKER_MEAN] * 4, atol=1e-6)
    np.testing.assert_allclose(stats["std"], [CHECKER_STD] * 4, atol=1e-6)


# exact reference pixel-resolution factors (computestats_inference.py:57-58)
PX_AREA = 0.200022269188281 * 0.200022454940277


def test_computestats_inference_join(tmp_path):
    import pandas as pd

    from deadtrees_tpu.infer.geotiff import write_geotiff

    d19 = tmp_path / "predicted.2019"
    d20 = tmp_path / "predicted.2020"
    d19.mkdir()
    d20.mkdir()

    size = 32

    def class_map(n1, n2):
        arr = np.zeros(size * size, np.uint8)
        arr[:n1] = 1
        arr[n1 : n1 + n2] = 2
        return arr.reshape(size, size)

    write_geotiff(d19 / "ortho_ms_2019_EPSG3044_032_070.tif", class_map(100, 50))
    write_geotiff(d19 / "ortho_ms_2019_EPSG3044_032_071.tif", class_map(0, 0))
    # 2020 has only one of the two tiles -> outer join leaves a gap
    write_geotiff(d20 / "ortho_ms_2020_EPSG3044_032_070.tif", class_map(10, 0))

    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "computestats_inference.py"),
         str(d19), str(d20), "--years", "2019", "2020"],
        check=True, cwd=str(tmp_path), capture_output=True, text=True,
    )

    df = pd.read_csv(tmp_path / "predicted.stats.csv").set_index("tile")
    assert list(df.columns[:1]) == ["total"]
    assert set(df.index) == {"032_070", "032_071"}

    row = df.loc["032_070"]
    assert row["total"] == size * size
    assert row["cl_1_2019"] == 100 and row["cl_2_2019"] == 50
    assert row["deadarea_m2_2019"] == pytest.approx(
        round(150 * PX_AREA, 1), abs=1e-6
    )
    assert row["cl_1_2020"] == 10
    # tile missing from 2020: joined columns are empty, not fabricated
    assert pd.isna(df.loc["032_071", "cl_1_2020"])
    assert df.loc["032_071", "cl_0_2019"] == size * size


def test_computestats_inference_missing_year_dir(tmp_path):
    from deadtrees_tpu.infer.geotiff import write_geotiff

    d19 = tmp_path / "predicted.2019"
    d19.mkdir()
    write_geotiff(
        d19 / "ortho_ms_2019_EPSG3044_032_070.tif",
        np.zeros((16, 16), np.uint8),
    )
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "computestats_inference.py"),
         str(d19), "--years", "2019", "2020"],
        cwd=str(tmp_path), capture_output=True, text=True,
    )
    assert res.returncode != 0
    assert "predicted.2020" in res.stderr


def test_computestats_inference_empty_year_dir_fails_loudly(tmp_path):
    """An empty predicted.{year} directory must be a clear error, not a
    pandas KeyError deep in the join."""
    d19 = tmp_path / "predicted.2019"
    d19.mkdir()
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "computestats_inference.py"),
         str(d19), "--years", "2019"],
        cwd=str(tmp_path), capture_output=True, text=True,
    )
    assert res.returncode != 0
    assert "no predicted tiles" in res.stderr
