"""Tiler + block math tests.

Mirrors the reference test suite (/root/reference/tests/test_tiler.py):
divisibility helper, make/unmake round-trip on a toy array, inspect_tile on
full and ragged scenes, and the get/put/write round-trip with random
predictions — with the reference's 512-subtile/8192-tile expectations
(test_tiler.py:122,133).
"""


import numpy as np
import pytest

from deadtrees_tpu.infer import (
    Tiler,
    divisible_without_remainder,
    inspect_tile,
    make_blocks_chw,
    make_blocks_nhwc,
    unmake_blocks_chw,
    unmake_blocks_nhwc,
)


def test_divisible_without_remainder():
    assert divisible_without_remainder(8192, 512)
    assert not divisible_without_remainder(8192, 513)
    assert not divisible_without_remainder(8192, 0)


def test_make_unmake_blocks_chw_roundtrip():
    """4x4 toy round-trip (reference test_tiler.py:56-77)."""
    x = np.arange(4 * 4 * 3).reshape(3, 4, 4)
    blocks = np.asarray(make_blocks_chw(x, 2))
    assert blocks.shape == (4, 3, 2, 2)
    # reference order: subtile rows first
    assert np.array_equal(blocks[0, 0], x[0, :2, :2])
    assert np.array_equal(blocks[1, 0], x[0, :2, 2:])
    restored = np.asarray(unmake_blocks_chw(blocks[:, 0], 2, 4, 4))
    assert np.array_equal(restored, x[0])


def test_make_unmake_blocks_nhwc_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (8, 12, 4), dtype=np.uint8)
    blocks = np.asarray(make_blocks_nhwc(x, 4))
    assert blocks.shape == (6, 4, 4, 4)
    restored = np.asarray(unmake_blocks_nhwc(blocks, 8, 12))
    assert np.array_equal(restored, x)


def test_nhwc_chw_block_order_matches():
    rng = np.random.default_rng(1)
    x_chw = rng.integers(0, 255, (4, 8, 8), dtype=np.uint8)
    x_nhwc = np.transpose(x_chw, (1, 2, 0))
    b_chw = np.asarray(make_blocks_chw(x_chw, 4))  # (N, C, d, d)
    b_nhwc = np.asarray(make_blocks_nhwc(x_nhwc, 4))  # (N, d, d, C)
    assert np.array_equal(np.transpose(b_nhwc, (0, 3, 1, 2)), b_chw)


def test_inspect_tile_shapes():
    """Full scene + two ragged-edge scenes (reference test_tiler.py:80-106)."""
    full = np.zeros((8192, 8192), np.uint8)
    ti = inspect_tile(full)
    assert ti.size == (8192, 8192)
    assert ti.subtiles == (16, 16)

    ragged_v = np.zeros((2649, 8192), np.uint8)
    ti = inspect_tile(ragged_v)
    assert ti.subtiles == (6, 16)

    ragged_h = np.zeros((8192, 3000), np.uint8)
    ti = inspect_tile(ragged_h)
    assert ti.subtiles == (16, 6)


def test_inspect_tile_bad_dims():
    with pytest.raises(ValueError):
        inspect_tile(np.zeros((100, 100)), (8192, 8192), (513, 513))


def test_tiler_subtile_dims_must_match():
    with pytest.raises(ValueError):
        Tiler(subtile_shape=(256, 128))


def test_tiler_roundtrip_random_predictions():
    """get/put/write round-trip (reference test_tiler.py:113-148), array-first
    with a ragged scene padded to tile shape."""
    rng = np.random.default_rng(42)
    scene = rng.integers(0, 255, (300, 520, 4), dtype=np.uint8)
    tiler = Tiler(tile_shape=(512, 1024), subtile_shape=(128, 128))
    tiler.load_array(scene)
    assert tiler.tile_info.size == (300, 520)
    assert tiler.tile_info.subtiles == (3, 5)

    batches = tiler.get_batches()
    assert batches.shape == (15, 128, 128, 4)
    # top-left subtile matches the raw scene
    assert np.array_equal(batches[0], scene[:128, :128])

    preds = rng.integers(0, 3, (15, 128, 128)).astype(np.uint8)
    tiler.put_batches(preds)
    out = tiler.prediction
    assert out.shape == (300, 520)
    # subtile (0,0) placed at origin
    assert np.array_equal(out[:128, :128], preds[0])
    # subtile order: row-major over the subtile grid of the PADDED scene
    assert np.array_equal(out[:128, 128:256], preds[1])


def test_tiler_write_read_file(tmp_path):
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 255, (200, 200, 4), dtype=np.uint8)
    tiler = Tiler(tile_shape=(256, 256), subtile_shape=(64, 64))
    tiler.load_array(scene)
    preds = rng.integers(0, 3, (16, 64, 64)).astype(np.uint8)
    tiler.put_batches(preds[: tiler.subtiles_to_use.sum()])
    out = tmp_path / "pred.tif"
    tiler.write_file(out)

    from deadtrees_tpu.infer.geotiff import read_geotiff

    back = read_geotiff(out)
    assert back.data.shape[:2] == (200, 200)
    assert np.array_equal(back.data[..., 0] if back.data.ndim == 3 else back.data,
                          tiler.prediction)


def test_library_scene_defaults_are_512_subtile():
    """512² subtiles everywhere by default: the reference Tiler default
    (tiler.py:37) and the measured-fastest regime (PERF.md r3: 299 vs 261
    tiles512/s at 256²). The CLI fix alone would leave API users in the
    slow non-parity regime."""
    import inspect

    from deadtrees_tpu.infer.sliding import (
        make_scene_predictor,
        predict_scene,
        predict_scenes,
    )

    t = Tiler()
    assert t._subtile_shape == (512, 512)
    assert t._tile_shape == (2048, 2048)  # padded-canvas default (memory)
    for fn in (make_scene_predictor, predict_scene, predict_scenes):
        assert inspect.signature(fn).parameters["subtile"].default == 512, fn


def test_tiler_rejects_oversize_scene():
    """A scene larger than tile_shape must fail loudly, not with a numpy
    broadcast error (the CLI auto-sizes its tile shape from the scene
    headers to avoid this)."""
    tiler = Tiler(tile_shape=(256, 256), subtile_shape=(64, 64))
    with pytest.raises(ValueError, match="exceeds tile_shape"):
        tiler.load_array(np.zeros((512, 512, 4), np.uint8))


def test_geotiff_size_header_only(tmp_path):
    from deadtrees_tpu.infer.geotiff import geotiff_size, write_geotiff

    p = tmp_path / "s.tif"
    write_geotiff(p, np.zeros((300, 520, 4), np.uint8))
    assert geotiff_size(p) == (300, 520)
