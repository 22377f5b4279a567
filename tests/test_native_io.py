"""Native data-plane tests: tar index + TIFF decode parity vs PIL.

Covers the C++ library (native/deadtrees_io.cpp) against the same shard
format the Python path reads: uncompressed and LZW TIFFs as written by PIL
(the shard writer's formats, scripts/createdataset.py) plus predictor and
PackBits variants.
"""

import io
import subprocess
import tarfile
from pathlib import Path

import numpy as np
import pytest

from deadtrees_tpu.data import native

if not native.available():
    # build on demand — the .so is not checked in
    root = Path(__file__).resolve().parents[1]
    subprocess.run(["make", "-C", str(root / "native")], check=False,
                   capture_output=True)
    import importlib

    importlib.reload(native)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _tiff_bytes(arr, mode, **save_kwargs) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, format="TIFF", **save_kwargs)
    return buf.getvalue()


@pytest.mark.parametrize("compression", [None, "tiff_lzw", "packbits"])
def test_tiff_decode_parity(compression):
    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 255, (48, 40, 4), dtype=np.uint8)
    gray = rng.integers(0, 3, (48, 40), dtype=np.uint8)
    kw = {"compression": compression} if compression else {}

    out = native.tiff_decode(_tiff_bytes(rgba, "RGBA", **kw))
    assert out.shape == (48, 40, 4)
    assert np.array_equal(out, rgba)

    out = native.tiff_decode(_tiff_bytes(gray, "L", **kw))
    assert out.shape == (48, 40)
    assert np.array_equal(out, gray)


def test_tar_index_and_batch_decode(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    shard = tmp_path / "shard.tar"
    images = []
    with tarfile.open(shard, "w") as tf:
        for i in range(6):
            img = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
            images.append(img)
            data = _tiff_bytes(img, "RGBA")
            info = tarfile.TarInfo(f"s{i:03d}.rgbn.tif")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = b"42.0"
            info = tarfile.TarInfo(f"s{i:03d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))

    entries = native.tar_index(str(shard))
    assert len(entries) == 12
    names = [e[0] for e in entries]
    assert names[0] == "s000.rgbn.tif" and names[1] == "s000.txt"

    samples = native.index_shard_samples(str(shard))
    assert len(samples) == 6
    assert set(samples["s000"]) == {"rgbn.tif", "txt"}

    tiff_entries = [samples[f"s{i:03d}"]["rgbn.tif"] for i in range(6)]
    batch = native.decode_batch(str(shard), tiff_entries, (32, 32, 4))
    assert batch.shape == (6, 32, 32, 4)
    for i in range(6):
        assert np.array_equal(batch[i], images[i])


def test_batch_decode_matches_python_path(tmp_path):
    """Native fast path must agree with the tar.py/PIL reference path."""
    from tests.test_data import _write_shard

    from deadtrees_tpu.data.tar import decode_sample, iter_tar_samples

    shard = tmp_path / "x-000000.tar"
    _write_shard(shard, 4)
    py_samples = [decode_sample(s) for s in iter_tar_samples(str(shard))]

    samples = native.index_shard_samples(str(shard))
    keys = sorted(samples)
    entries = [samples[k]["rgbn.tif"] for k in keys]
    batch = native.decode_batch(str(shard), entries, (32, 32, 4))
    for i, k in enumerate(keys):
        assert np.array_equal(batch[i], py_samples[i]["image"])
