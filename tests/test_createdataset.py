"""createdataset.py unit tests — mirror of the reference suite
(/root/reference/tests/test_createdataset.py): Extractor shapes on padded
tiles, _split_tile sample dicts (key counts, RGBN format, mask value set,
txt dead-fraction consistency), plus the end-to-end shard build.
"""

import importlib.util
from pathlib import Path

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "createdataset", Path(__file__).resolve().parents[1] / "scripts" / "createdataset.py"
)
cds = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cds)


def test_extractor_shapes():
    """2048² tile → 64 subtiles of 256² (reference :55-57) — scaled to
    512²→16×128² here for speed; NHWC layout."""
    ex = cds.Extractor(tile_size=128, source_dim=512)
    rng = np.random.default_rng(0)
    tile = rng.integers(0, 255, (512, 512, 4), dtype=np.uint8)
    out = ex(tile, n_bands=4)
    assert out.shape == (16, 128, 128, 4)
    # first subtile is the top-left corner
    assert np.array_equal(out[0], tile[:128, :128])


def test_extractor_pads_ragged_tiles():
    ex = cds.Extractor(tile_size=128, source_dim=512)
    ragged = np.ones((300, 400), dtype=np.uint8)
    out = ex(ragged, n_bands=1)
    assert out.shape == (16, 128, 128, 1)
    # subtile row 3 (pixel rows 384..512) is beyond the 300-row input
    assert out[12].max() == 0
    # subtile (0,3) covers cols 384..512: data up to col 400, padding after
    assert out[3][:, :16].max() == 1 and out[3][:, 16:].max() == 0


def test_extractor_none_gives_zeros():
    ex = cds.Extractor(tile_size=128, source_dim=256)
    out = ex(None, n_bands=1)
    assert out.shape == (4, 128, 128, 1)
    assert out.max() == 0


def test_split_tile_samples(tmp_path):
    """Sample dict contract (reference :99-139)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.integers(10, 250, (256, 256, 4), dtype=np.uint8)
    mask = np.zeros((256, 256), np.uint8)
    mask[10:80, 10:80] = 1
    mask[150:200, 150:250] = 2
    lu = np.ones((256, 256), np.uint8)

    ip, mp, lp = tmp_path / "t.tif", tmp_path / "m.tif", tmp_path / "l.tif"
    Image.fromarray(img, "RGBA").save(ip)
    Image.fromarray(mask, "L").save(mp)
    Image.fromarray(lu, "L").save(lp)

    samples = cds._split_tile(
        (ip, mp, lp), source_dim=256, tile_size=128, format="TIFF"
    )
    assert len(samples) == 4
    s = samples[0]
    assert set(s) == {"__key__", "rgbn.tif", "mask.tif", "lu.tif", "txt"}
    assert s["__key__"] == "t_000"

    from deadtrees_tpu.data.tar import image_decoder, mask_decoder

    rgbn = image_decoder(s["rgbn.tif"])
    assert rgbn.shape == (128, 128, 4)
    assert np.array_equal(rgbn, img[:128, :128])
    m = mask_decoder(s["mask.tif"])
    assert set(np.unique(m)) <= {0, 1, 2}
    # txt dead-frac matches the mask within 1e-2 (reference :130-139)
    frac = float(s["txt"])
    expected = np.count_nonzero(m) / (128 * 128) * 100
    assert abs(frac - expected) < 1e-2


def test_split_tile_drops_constant_subtiles(tmp_path):
    from PIL import Image

    img = np.zeros((256, 256, 4), np.uint8)
    img[:128, :128] = np.random.default_rng(0).integers(
        10, 250, (128, 128, 4), dtype=np.uint8
    )  # only top-left has data
    ip = tmp_path / "t.tif"
    Image.fromarray(img, "RGBA").save(ip)
    samples = cds._split_tile(
        (ip, None, None), source_dim=256, tile_size=128, format="TIFF"
    )
    assert [s["__key__"] for s in samples] == ["t_000"]
