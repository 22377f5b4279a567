"""Retile (gdal_retile analogue, /root/reference/dvc.yaml:14-21).

Checks the tile grid, the locations.csv contract against the createmasks
consumer, and the retile -> mosaic round trip (the pipeline's first and
last geo stages must be exact inverses over the union extent).
"""

import numpy as np
import pytest
from PIL import Image, TiffImagePlugin

from deadtrees_tpu.geo.mosaic import merge_tiles
from deadtrees_tpu.geo.retile import retile
from deadtrees_tpu.infer.geotiff import read_geotiff

PX = 0.2
X0, Y0 = 500000.0, 5400000.0


def _write_scene(path, h, w, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    data = rng.integers(0, 255, size=shape, dtype=np.uint8)
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (PX, PX, 0.0)
    info[33922] = (0.0, 0.0, 0.0, X0, Y0, 0.0)
    Image.fromarray(data).save(str(path), format="TIFF", tiffinfo=info)
    return data


def test_retile_grid_and_csv(tmp_path):
    scene = tmp_path / "ortho_ms_2019_EPSG3044.tif"
    _write_scene(scene, 96, 80)  # 3 rows x (2 full + 1 ragged 16px col)
    out = tmp_path / "tiles"
    records = retile(scene, out, tile_size=32)
    assert len(records) == 9
    names = sorted(p.name for p in out.glob("*.tif"))
    assert "ortho_ms_2019_EPSG3044_1_1.tif" in names
    assert "ortho_ms_2019_EPSG3044_3_3.tif" in names

    # ragged east column is 16 px wide, full tiles 32
    ragged = read_geotiff(out / "ortho_ms_2019_EPSG3044_2_3.tif")
    assert np.squeeze(ragged.data).shape == (32, 16)

    # csv consumed by the createmasks grid loader (filename;x1;x2;y1;y2)
    import scripts.createmasks as cm

    grid = cm.load_tile_grid(out / "locations.csv")
    assert len(grid) == 9
    by_name = {g["filename"]: g["bounds"] for g in grid}
    xmin, ymin, xmax, ymax = by_name["ortho_ms_2019_EPSG3044_1_1.tif"]
    assert (xmin, ymax) == pytest.approx((X0, Y0))
    assert (xmax, ymin) == pytest.approx((X0 + 32 * PX, Y0 - 32 * PX))
    # whole grid covers the scene extent exactly
    assert min(b[0] for b in by_name.values()) == pytest.approx(X0)
    assert max(b[2] for b in by_name.values()) == pytest.approx(X0 + 80 * PX)
    assert min(b[1] for b in by_name.values()) == pytest.approx(Y0 - 96 * PX)


def test_retile_tile_georeferencing(tmp_path):
    scene = tmp_path / "s.tif"
    _write_scene(scene, 64, 64)
    out = tmp_path / "tiles"
    retile(scene, out, tile_size=32)
    img = read_geotiff(out / "s_2_2.tif")
    xmin, ymin, xmax, ymax = img.bounds
    assert (xmin, ymax) == pytest.approx((X0 + 32 * PX, Y0 - 32 * PX))


def test_retile_mosaic_round_trip(tmp_path):
    scene = tmp_path / "scene.tif"
    orig = _write_scene(scene, 96, 80, seed=7)
    tiles = tmp_path / "tiles"
    retile(scene, tiles, tile_size=32)
    mosaic = tmp_path / "mosaic.tif"
    summary = merge_tiles([tiles], mosaic)
    assert (summary["height"], summary["width"]) == (96, 80)
    back = np.squeeze(read_geotiff(mosaic).data)
    np.testing.assert_array_equal(back, orig)
    # georeferencing survives the full cycle
    assert read_geotiff(mosaic).bounds == pytest.approx(
        (X0, Y0 - 96 * PX, X0 + 80 * PX, Y0)
    )


def test_retile_multiband(tmp_path):
    scene = tmp_path / "rgbn.tif"
    orig = _write_scene(scene, 64, 64, channels=4, seed=3)
    out = tmp_path / "tiles"
    retile(scene, out, tile_size=32)
    tile = read_geotiff(out / "rgbn_1_2.tif")
    np.testing.assert_array_equal(tile.data, orig[:32, 32:])


def test_retile_rejects_ungeoreferenced(tmp_path):
    p = tmp_path / "plain.tif"
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(str(p), format="TIFF")
    with pytest.raises(ValueError, match="tiepoint|scale"):
        retile(p, tmp_path / "tiles")


def test_retile_rerun_does_not_duplicate_csv(tmp_path):
    """Rerunning into the same dir truncates locations.csv (ADVICE r3);
    append_csv=True keeps appending for multi-source runs."""
    scene = tmp_path / "s.tif"
    _write_scene(scene, 64, 64)
    out = tmp_path / "tiles"
    retile(scene, out, tile_size=32)
    retile(scene, out, tile_size=32)  # rerun: fresh CSV, not 8 rows
    rows = (out / "locations.csv").read_text().strip().splitlines()
    assert len(rows) == 4

    scene2 = tmp_path / "s2.tif"
    _write_scene(scene2, 32, 32, seed=1)
    retile(scene2, out, tile_size=32, append_csv=True)
    rows = (out / "locations.csv").read_text().strip().splitlines()
    assert len(rows) == 5


def test_mosaic_rejects_misaligned_tile(tmp_path):
    """A tile whose origin is off the shared grid fails with a clear
    diagnostic instead of a numpy broadcast error (ADVICE r3)."""
    a = tmp_path / "a.tif"
    _write_scene(a, 32, 32)
    b = tmp_path / "b.tif"
    rng = np.random.default_rng(2)
    data = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (PX, PX, 0.0)
    # origin shifted by 0.4 px east of the grid a.tif sits on
    info[33922] = (0.0, 0.0, 0.0, X0 + 32 * PX + 0.4 * PX, Y0, 0.0)
    Image.fromarray(data).save(str(b), format="TIFF", tiffinfo=info)
    with pytest.raises(ValueError, match="not on the shared pixel grid"):
        merge_tiles([a, b], tmp_path / "m.tif")


def test_mosaic_rejects_unsupported_pil_mode(tmp_path):
    """PIL-backend header scan raises on modes it cannot dtype-map rather
    than silently placing them as uint8 (ADVICE r3)."""
    p = tmp_path / "cmyk.tif"
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (PX, PX, 0.0)
    info[33922] = (0.0, 0.0, 0.0, X0, Y0, 0.0)
    Image.new("CMYK", (8, 8)).save(str(p), format="TIFF", tiffinfo=info)
    with pytest.raises(ValueError, match="unsupported PIL mode"):
        merge_tiles([p], tmp_path / "m.tif")


def test_retile_cli(tmp_path):
    import scripts.retile as rt

    scene = tmp_path / "ortho.tif"
    _write_scene(scene, 64, 64)
    out = tmp_path / "tiles"
    rc = rt.main([str(scene), "--targetDir", str(out), "--ps", "32"])
    assert rc == 0
    assert len(list(out.glob("*.tif"))) == 4
    assert (out / "locations.csv").exists()
