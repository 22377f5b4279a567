"""Mosaic builder (gdal_merge analogue, /root/reference/dvc.yaml:134-146).

Builds a 2x2 grid of georeferenced prediction tiles (plus one ragged edge
tile) with PIL-tag georeferencing — the same fixture style as
test_aggregate.py — and checks placement, union extent, overlap semantics,
and the synthesized GeoTIFF tags on the output.
"""

import numpy as np
import pytest
from PIL import Image, TiffImagePlugin

from deadtrees_tpu.geo.mosaic import merge_tiles
from deadtrees_tpu.infer.geotiff import read_geotiff

PX = 0.2  # m/px, reference ground resolution (computestats_inference.py:57)


def _write_tile(path, data, x0, y0):
    """Single-band uint8 GeoTIFF at world top-left (x0, y0)."""
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (PX, PX, 0.0)
    info[33922] = (0.0, 0.0, 0.0, float(x0), float(y0), 0.0)
    Image.fromarray(data).save(str(path), format="TIFF", tiffinfo=info)


@pytest.fixture
def tile_grid(tmp_path):
    """2x2 grid of 32^2 tiles anchored at (500000, 5400000), each filled
    with a distinct value."""
    d = tmp_path / "predicted"
    d.mkdir()
    n = 32
    world = n * PX
    for i, (r, c) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        data = np.full((n, n), i + 1, dtype=np.uint8)
        _write_tile(
            d / f"tile_{r}_{c}.tif", data,
            500000.0 + c * world, 5400000.0 - r * world,
        )
    return d


def test_mosaic_2x2_placement(tile_grid, tmp_path):
    out = tmp_path / "mosaic.tif"
    summary = merge_tiles([tile_grid], out)
    assert summary["tiles"] == 4
    assert (summary["height"], summary["width"]) == (64, 64)

    img = read_geotiff(out)
    data = img.data[..., 0] if img.data.ndim == 3 else img.data
    assert data.shape == (64, 64)
    # quadrant values land where their world coordinates say
    assert data[0, 0] == 1 and data[0, 63] == 2
    assert data[63, 0] == 3 and data[63, 63] == 4
    # union bounds: top-left anchor + 64px extent
    xmin, ymin, xmax, ymax = img.bounds
    assert xmin == pytest.approx(500000.0)
    assert ymax == pytest.approx(5400000.0)
    assert xmax == pytest.approx(500000.0 + 64 * PX)
    assert ymin == pytest.approx(5400000.0 - 64 * PX)


def test_mosaic_gap_is_nodata(tmp_path):
    d = tmp_path / "tiles"
    d.mkdir()
    n = 16
    world = n * PX
    _write_tile(d / "a.tif", np.full((n, n), 7, np.uint8), 0.0, 2 * world)
    # diagonal neighbour leaves two nodata quadrants
    _write_tile(d / "b.tif", np.full((n, n), 9, np.uint8), world, world)
    out = tmp_path / "m.tif"
    summary = merge_tiles([d], out, nodata=0)
    assert (summary["height"], summary["width"]) == (32, 32)
    img = read_geotiff(out)
    data = np.squeeze(img.data)
    assert data[0, 0] == 7 and data[31, 31] == 9
    assert data[0, 31] == 0 and data[31, 0] == 0


def test_mosaic_overlap_later_wins(tmp_path):
    d = tmp_path / "tiles"
    d.mkdir()
    n = 8
    _write_tile(d / "00_first.tif", np.full((n, n), 1, np.uint8), 0.0, n * PX)
    _write_tile(d / "01_second.tif", np.full((n, n), 2, np.uint8), 0.0, n * PX)
    out = tmp_path / "m.tif"
    merge_tiles([d], out)
    data = np.squeeze(read_geotiff(out).data)
    assert (data == 2).all()  # gdal_merge semantics: later inputs overwrite


def test_mosaic_ragged_edge_tile(tile_grid, tmp_path):
    # the reference's edge tiles are ragged (test_tiler.py drift note,
    # SURVEY §4); a 32x12 tile east of the grid must extend the union
    n, w = 32, 12
    world = 32 * PX
    _write_tile(
        tile_grid / "tile_edge.tif", np.full((n, w), 9, np.uint8),
        500000.0 + 2 * world, 5400000.0,
    )
    out = tmp_path / "m.tif"
    summary = merge_tiles([tile_grid], out)
    assert (summary["height"], summary["width"]) == (64, 64 + w)
    data = np.squeeze(read_geotiff(out).data)
    assert data[0, 64] == 9 and data[31, 75] == 9
    assert data[40, 70] == 0  # below the ragged tile: nodata


def test_mosaic_rejects_scale_mismatch(tile_grid, tmp_path):
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (PX * 2, PX * 2, 0.0)
    info[33922] = (0.0, 0.0, 0.0, 500000.0, 5400000.0, 0.0)
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        str(tile_grid / "tile_zoom.tif"), format="TIFF", tiffinfo=info
    )
    with pytest.raises(ValueError, match="pixel scale"):
        merge_tiles([tile_grid], tmp_path / "m.tif")


def test_mosaic_rejects_ungeoreferenced(tmp_path):
    p = tmp_path / "plain.tif"
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(str(p), format="TIFF")
    with pytest.raises(ValueError, match="tiepoint|scale"):
        merge_tiles([p], tmp_path / "m.tif")


def test_mergetiles_cli(tile_grid, tmp_path):
    import scripts.mergetiles as mt

    out = tmp_path / "cli.tif"
    rc = mt.main([str(tile_grid), "-o", str(out)])
    assert rc == 0 and out.exists()
    assert np.squeeze(read_geotiff(out).data).shape == (64, 64)
