"""Geo layer tests: shapefile parsing and polygon rasterization.

A synthetic ESRI shapefile (polygon + hole + attributes) is written
byte-by-byte per the public spec, then read back and rasterized — covering
the dependency-free replacements for geopandas/rio.clip used by
scripts/createmasks.py.
"""

import struct
from pathlib import Path

import numpy as np
import pytest

from deadtrees_tpu.geo import (
    bbox_intersects,
    rasterize,
    read_dbf,
    read_shapefile,
    ring_signed_area,
)


def _write_shp(path: Path, polygons):
    """polygons: list of list-of-rings [(x, y), ...]."""
    records = b""
    for rec_no, rings in enumerate(polygons, start=1):
        pts = [p for ring in rings for p in ring]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        parts = []
        acc = 0
        for ring in rings:
            parts.append(acc)
            acc += len(ring)
        content = struct.pack("<i", 5)
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", len(rings), len(pts))
        content += struct.pack(f"<{len(parts)}i", *parts)
        for x, y in pts:
            content += struct.pack("<2d", x, y)
        records += struct.pack(">ii", rec_no, len(content) // 2) + content

    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", (100 + len(records)) // 2)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<4d", 0, 0, 100, 100)  # file bbox
    header += struct.pack("<4d", 0, 0, 0, 0)  # z/m ranges
    path.write_bytes(header + records)


def _write_dbf(path: Path, rows):
    fields = [("type", 10)]
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(l for _, l in fields)
    header = bytes([3, 124, 1, 1])
    header += struct.pack("<i", len(rows))
    header += struct.pack("<hh", header_size, record_size)
    header += b"\x00" * 20
    for name, length in fields:
        fd = name.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4
        fd += bytes([length]) + b"\x00" * 15
        header += fd
    header += b"\x0d"
    body = b""
    for row in rows:
        body += b" " + str(row).encode().ljust(10)[:10]
    path.write_bytes(header + body + b"\x1a")


@pytest.fixture
def shapefile(tmp_path):
    # outer ring CLOCKWISE (ESRI convention), hole counter-clockwise
    outer = [(10, 10), (10, 40), (40, 40), (40, 10), (10, 10)]
    hole = [(20, 20), (30, 20), (30, 30), (20, 30), (20, 20)]
    tri = [(60, 60), (60, 90), (90, 60), (60, 60)]
    _write_shp(tmp_path / "gt.shp", [[outer, hole], [tri]])
    _write_dbf(tmp_path / "gt.dbf", [1, 2])
    return tmp_path / "gt.shp"


def test_ring_winding():
    cw = [(0, 0), (0, 10), (10, 10), (10, 0)]
    assert ring_signed_area(cw) < 0  # clockwise = ESRI outer
    assert ring_signed_area(cw[::-1]) > 0


def test_read_shapefile(shapefile):
    recs = read_shapefile(shapefile)
    assert len(recs) == 2
    assert len(recs[0]["rings"]) == 2  # outer + hole
    assert recs[0]["bbox"] == (10.0, 10.0, 40.0, 40.0)
    assert recs[0]["attributes"]["type"] == "1"
    assert recs[1]["attributes"]["type"] == "2"


def test_read_dbf(shapefile):
    rows = read_dbf(shapefile.with_suffix(".dbf"))
    assert [r["type"] for r in rows] == ["1", "2"]


def test_rasterize_with_hole(shapefile):
    recs = read_shapefile(shapefile)
    mask = rasterize([recs[0]], bounds=(0, 0, 100, 100), size=(100, 100))
    assert mask.shape == (100, 100)
    # y axis is flipped: world y=25 -> row 75
    assert mask[75, 15] == 1  # inside outer ring
    assert mask[75, 25] == 0  # inside hole
    assert mask[50, 50] == 0  # outside
    assert mask.sum() > 0


def test_rasterize_classes(shapefile):
    recs = read_shapefile(shapefile)
    m1 = rasterize([recs[0]], bounds=(0, 0, 100, 100), size=(100, 100))
    m2 = rasterize([recs[1]], bounds=(0, 0, 100, 100), size=(100, 100))
    combined = np.argmax(
        np.stack([np.zeros_like(m1), m1, m2]), axis=0
    ).astype(np.uint8)
    assert set(np.unique(combined)) == {0, 1, 2}


def test_bbox_intersects():
    assert bbox_intersects((0, 0, 10, 10), (5, 5, 15, 15))
    assert not bbox_intersects((0, 0, 10, 10), (11, 0, 20, 10))


def test_createmasks_end_to_end(tmp_path, shapefile):
    """Full createmasks.py flow: grid + tiles + shapefile → class masks."""
    import subprocess
    import sys

    from PIL import Image

    indir = tmp_path / "tiles"
    outdir = tmp_path / "masks"
    indir.mkdir()
    outdir.mkdir()
    rng = np.random.default_rng(0)
    # two 100x100 world-unit tiles: one covering the polygons, one far away
    rows = []
    for name, (x1, y1) in [("t0.tif", (0, 0)), ("t1.tif", (1000, 1000))]:
        Image.fromarray(
            rng.integers(10, 250, (100, 100, 4), dtype=np.uint8), "RGBA"
        ).save(indir / name)
        rows.append(f"{name};{x1};{x1 + 100};{y1};{y1 + 100}")
    (indir / "locations.csv").write_text("\n".join(rows) + "\n")

    root = Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, str(root / "scripts" / "createmasks.py"),
         str(indir), str(outdir), str(shapefile), "--workers", "1"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr

    out = sorted(outdir.glob("*.tif"))
    assert [p.name for p in out] == ["t0.tif"]  # only the intersecting tile
    mask = np.asarray(Image.open(out[0]))
    assert set(np.unique(mask)) <= {0, 1, 2}
    assert (mask == 1).sum() > 0 and (mask == 2).sum() > 0


def test_shapefile_write_read_roundtrip(tmp_path):
    """First-party polygon writer must round-trip through the reader
    (reference writes yearly shapefiles, aggregate_results.py:116-123)."""
    from deadtrees_tpu.geo.shapefile import (
        read_shapefile,
        ring_signed_area,
        write_shapefile,
    )

    records = [
        {
            "rings": [[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]],
            "attributes": {"conifer": 1.25, "broadleaf": 2.5, "total": 3.75},
        },
        {
            "rings": [[(20.0, 20.0), (20.0, 30.0), (30.0, 30.0), (30.0, 20.0)]],
            "attributes": {"conifer": None, "broadleaf": 0.0, "total": 0.0},
        },
    ]
    write_shapefile(tmp_path / "agg", records, crs_wkt='PROJCS["t"]')
    out = read_shapefile(tmp_path / "agg")
    assert len(out) == 2
    assert out[0]["bbox"] == (0.0, 0.0, 10.0, 10.0)
    assert abs(float(out[0]["attributes"]["conifer"]) - 1.25) < 1e-9
    assert out[1]["attributes"]["conifer"] == ""  # None -> empty DBF cell
    # ESRI outer rings are clockwise
    assert ring_signed_area(out[0]["rings"][0]) <= 0
    assert (tmp_path / "agg.shx").exists()
    assert (tmp_path / "agg.prj").read_text() == 'PROJCS["t"]'


def test_shapefile_write_polygon_with_hole(tmp_path):
    """Multi-ring records: outer ring forced clockwise, holes forced
    counter-clockwise (ESRI winding), and the hole survives rasterization
    after a write→read round trip."""
    from deadtrees_tpu.geo.raster import rasterize
    from deadtrees_tpu.geo.shapefile import (
        read_shapefile,
        ring_signed_area,
        write_shapefile,
    )

    # both rings given COUNTER-clockwise on purpose: writer must fix both
    outer = [(10.0, 10.0), (40.0, 10.0), (40.0, 40.0), (10.0, 40.0)]
    hole = [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0)]
    write_shapefile(
        tmp_path / "holes", [{"rings": [outer, hole], "attributes": {}}],
        fields=[],
    )
    out = read_shapefile(tmp_path / "holes")
    assert len(out) == 1 and len(out[0]["rings"]) == 2
    assert ring_signed_area(out[0]["rings"][0]) < 0  # outer: clockwise
    assert ring_signed_area(out[0]["rings"][1]) > 0  # hole: counter-cw
    mask = rasterize(out, bounds=(0, 0, 50, 50), size=(50, 50))
    assert mask[25, 15] == 1  # annulus
    assert mask[25, 25] == 0  # inside the hole


def test_read_geotiff_native_decode_parity(tmp_path):
    """The PIL-fallback scene read routes pixel decode through the C++
    decoder when built (strip AND tiled layouts) with PIL-parity output
    and intact geo tags; unsupported variants fall back to PIL."""
    import numpy as np
    from PIL import Image, TiffImagePlugin

    from deadtrees_tpu.data import native
    from deadtrees_tpu.infer.geotiff import read_geotiff

    rng = np.random.default_rng(4)
    data = rng.integers(0, 255, (40, 56, 4), dtype=np.uint8)
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (0.2, 0.2, 0.0)
    info[33922] = (0.0, 0.0, 0.0, 500000.0, 5400000.0, 0.0)
    p = tmp_path / "scene.tif"
    Image.fromarray(data, "RGBA").save(
        str(p), format="TIFF", tiffinfo=info, compression="tiff_lzw"
    )

    img = read_geotiff(p)
    np.testing.assert_array_equal(img.data, data)
    assert 33550 in img.geo["tags"]
    if native.available():
        assert img.geo["decoder"] == "native"

    # 16-bit input exceeds the native decoder's subset -> PIL fallback
    mask16 = rng.integers(0, 60000, (16, 16), dtype=np.uint16)
    p16 = tmp_path / "mask16.tif"
    Image.fromarray(mask16, "I;16").save(str(p16), format="TIFF", tiffinfo=info)
    img16 = read_geotiff(p16)
    assert img16.geo["decoder"] == "pil"
    np.testing.assert_array_equal(np.squeeze(img16.data), mask16)
