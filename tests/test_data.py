"""Data-layer tests: shard splitting, tar round-trip, augmentation parity,
end-to-end pipeline batches.

Shard-split expectations mirror the reference's semantics
(deadtreedata.py:47-88); the tar format matches what wds.ShardWriter
produces (scripts/createdataset.py:161-194); augmentation parity is checked
against a NumPy re-statement of the albumentations math
(deadtreedata.py:132-146).
"""

import io
import tarfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.data import (
    DataConfig,
    DeadtreesDataModule,
    ShardSampleStream,
    augment_batch,
    count_shard_samples,
    decode_sample,
    iter_tar_samples,
    split_shards,
)
from deadtrees_tpu.data.augment import sample_augment_params

# ---------------------------------------------------------------------------
# split_shards
# ---------------------------------------------------------------------------


def test_split_shards_fractions():
    shards = [f"s{i:03d}.tar" for i in range(10)]
    tr, va, te = split_shards(shards, [0.7, 0.2, 0.1])
    assert len(tr) == 7 and len(va) == 2 and len(te) == 1
    assert tr + va + te == sorted(shards)


def test_split_shards_fixup_small():
    # 4 shards at [0.7,0.2,0.1] rounds to [3,1,0] -> fixup all-but-2/1/1
    shards = [f"s{i}.tar" for i in range(4)]
    tr, va, te = split_shards(shards, [0.7, 0.2, 0.1])
    assert len(tr) == 2 and len(va) == 1 and len(te) == 1


def test_split_shards_two_way_appends_none():
    shards = [f"s{i}.tar" for i in range(5)]
    tr, va, te = split_shards(shards, [0.8, 0.2])
    assert te is None
    assert len(tr) == 4 and len(va) == 1


def test_split_shards_bad_fractions():
    with pytest.raises(AssertionError):
        split_shards(["a", "b"], [0.5, 0.2])


def test_split_shards_not_enough():
    # 3 shards round to [2,1,0]; fixup needs >2 in train -> ValueError
    with pytest.raises(ValueError):
        split_shards(["a", "b", "c"], [0.7, 0.2, 0.1])


# ---------------------------------------------------------------------------
# tar reader
# ---------------------------------------------------------------------------


def _write_shard(path: Path, n: int, size: int = 32, with_lu: bool = True, seed=0,
                 prefix: str = "tile"):
    """Write a wds-style shard with PIL TIFF members like createdataset.py."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    keys = []
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{prefix}_{i:04d}"
            keys.append(key)
            rgbn = rng.integers(0, 255, (size, size, 4), dtype=np.uint8)
            mask = rng.integers(0, 3, (size, size), dtype=np.uint8)
            lu = rng.integers(0, 2, (size, size), dtype=np.uint8)
            frac = float(mask.astype(bool).mean() * 100)

            def add(name, data: bytes):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

            def tiff_bytes(arr, mode):
                buf = io.BytesIO()
                Image.fromarray(arr, mode=mode).save(buf, format="TIFF")
                return buf.getvalue()

            add(f"{key}.rgbn.tif", tiff_bytes(rgbn, "RGBA"))
            add(f"{key}.mask.tif", tiff_bytes(mask, "L"))
            if with_lu:
                add(f"{key}.lu.tif", tiff_bytes(lu, "L"))
            add(f"{key}.txt", f"{frac:.2f}".encode())
    return keys


def test_tar_roundtrip(tmp_path):
    shard = tmp_path / "train-000000.tar"
    keys = _write_shard(shard, 5)
    samples = list(iter_tar_samples(str(shard)))
    assert len(samples) == 5
    assert [s["__key__"].decode() for s in samples] == keys
    assert count_shard_samples(str(shard)) == 5

    decoded = decode_sample(samples[0])
    assert decoded["image"].shape == (32, 32, 4)
    assert decoded["image"].dtype == np.uint8
    assert decoded["mask"].shape == (32, 32)
    assert set(np.unique(decoded["mask"])) <= {0, 1, 2}
    assert decoded["stats"]["file"] == "tile_0000"
    assert 0 <= decoded["stats"]["frac"] <= 100


def test_stream_shuffle_covers_everything(tmp_path):
    shard1 = tmp_path / "a-000000.tar"
    shard2 = tmp_path / "a-000001.tar"
    _write_shard(shard1, 4, seed=1)
    _write_shard(shard2, 4, seed=2)
    stream = ShardSampleStream([str(shard1), str(shard2)], shuffle=8, seed=3)
    files = [s["stats"]["file"] for s in stream]
    assert len(files) == 8


# ---------------------------------------------------------------------------
# augmentation
# ---------------------------------------------------------------------------


def test_normalize_matches_albumentations_math():
    img = np.full((1, 8, 8, 4), 128, np.uint8)
    out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(img), train=False)["image"]
    mean = np.array([0.3661029729, 0.3875165941, 0.3501133538, 0.5797285859])
    std = np.array([0.2388708549, 0.2103625723, 0.2050272174, 0.2025812523])
    expected = (128.0 - mean * 255) / (std * 255)
    assert np.allclose(np.asarray(out)[0, 0, 0], expected, atol=1e-5)


def test_augment_geometric_consistency():
    """Image and mask must receive the same dihedral transform."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 16, 4), dtype=np.uint8)
    mask = img[..., 0].astype(np.int32) % 3

    out = augment_batch(
        jax.random.PRNGKey(42), jnp.asarray(img), jnp.asarray(mask), train=True
    )
    # invert normalization, undo color jitter is impossible — instead check
    # rank correspondence: the mask was derived from channel 0, so the argmax
    # position of channel 0 must match between image and mask transform.
    # Simpler: run with a constant-channel trick
    img2 = np.zeros((4, 8, 8, 4), np.uint8)
    img2[:, 0, :, :] = 255  # top row bright
    mask2 = np.zeros((4, 8, 8), np.int32)
    mask2[:, 0, :] = 1  # top row class 1
    out2 = augment_batch(
        jax.random.PRNGKey(7), jnp.asarray(img2), jnp.asarray(mask2), train=True
    )
    img_o = np.asarray(out2["image"])
    mask_o = np.asarray(out2["mask"])
    # wherever mask==1, the (normalized) image must be at its bright value
    for b in range(4):
        bright = img_o[b, ..., 0][mask_o[b] == 1]
        dark = img_o[b, ..., 0][mask_o[b] == 0]
        assert bright.min() > dark.max()


def test_augment_param_distributions():
    params = sample_augment_params(jax.random.PRNGKey(0), 4096)
    flip_any = np.asarray(params["flip_h"] | params["flip_v"])
    assert 0.45 < flip_any.mean() < 0.55  # OneOf p=0.5
    rot_k = np.asarray(params["rot_k"])
    assert 0.55 < (rot_k == 0).mean() < 0.70  # off (0.5) + k=0 (0.125)
    alpha = np.asarray(params["alpha"])
    assert np.all((alpha >= 0.85) & (alpha <= 1.15))
    assert 0.45 < (alpha == 1.0).mean() < 0.55
    beta = np.asarray(params["beta"])
    assert np.all((beta >= -0.2) & (beta <= 0.2))


def test_color_jitter_reference_math():
    """uint8 LUT semantics: out = floor(clip(v*alpha + beta*mean(img)))."""
    from deadtrees_tpu.data.augment import _color_jitter_u8

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 8, 8, 4), dtype=np.uint8)
    alpha = jnp.asarray([1.1, 0.9])
    beta = jnp.asarray([0.15, -0.1])
    out = np.asarray(_color_jitter_u8(jnp.asarray(img), alpha, beta))
    for b in range(2):
        m = img[b].astype(np.float64).mean()
        expected = np.floor(
            np.clip(img[b] * float(alpha[b]) + float(beta[b]) * m, 0, 255)
        )
        assert np.allclose(out[b], expected)


# ---------------------------------------------------------------------------
# pipeline end-to-end
# ---------------------------------------------------------------------------


def test_datamodule_end_to_end(tmp_path):
    for i in range(5):
        _write_shard(tmp_path / f"train-{i:06d}.tar", 8, seed=i)

    cfg = DataConfig(
        data_dir=str(tmp_path),
        pattern="*.tar",
        batch_size=4,
        in_channels=4,
        classes=3,
        distmap=True,
        shuffle_buffer=8,
    )
    dm = DeadtreesDataModule(cfg)
    dm.setup()
    assert dm.shard_size == 8
    # 5 shards split [4,1,0] -> fixup [3,1,1]; 3 train shards x 8 // 4
    assert dm.steps_per_epoch == 3 * 8 // 4

    batches = list(dm.train_batches())
    assert len(batches) >= 5  # 3 train shards (fixup) x 8 / 4 = 6
    b = batches[0]
    assert b["image"].shape == (4, 32, 32, 4)
    assert b["image"].dtype == jnp.float32
    assert b["mask"].shape == (4, 32, 32)
    assert b["distmap"].shape == (4, 32, 32, 3)
    assert b["lu"].shape == (4, 32, 32)
    assert len(b["files"]) == 4

    val = next(iter(dm.val_batches()))
    assert val["image"].shape == (4, 32, 32, 4)


def test_datamodule_two_class_collapse(tmp_path):
    for i in range(5):
        _write_shard(tmp_path / f"t-{i:06d}.tar", 8, seed=i)
    cfg = DataConfig(
        data_dir=str(tmp_path), batch_size=4, classes=2, distmap=False
    )
    dm = DeadtreesDataModule(cfg)
    dm.setup()
    b = next(iter(dm.train_batches()))
    assert set(np.unique(np.asarray(b["mask"]))) <= {0, 1}


def test_train_batches_reshuffle_per_epoch(tmp_path):
    """Epoch-varying stream seed: batch composition must differ between
    epochs (the reference's WebDataset pipeline reshuffles every epoch)."""
    import jax

    for i in range(5):
        _write_shard(tmp_path / f"train-{i:06d}.tar", 8, seed=i)
    cfg = DataConfig(data_dir=str(tmp_path), batch_size=4, shuffle_buffer=8)
    dm = DeadtreesDataModule(cfg)
    dm.setup()

    rng = jax.random.PRNGKey(7)
    r1, r2 = jax.random.split(rng)
    order1 = [f for b in dm.train_batches(r1) for f in b["files"]]
    order2 = [f for b in dm.train_batches(r2) for f in b["files"]]
    order1_again = [f for b in dm.train_batches(r1) for f in b["files"]]
    assert sorted(order1) == sorted(order2)  # same samples...
    assert order1 != order2  # ...different order across epochs
    assert order1 == order1_again  # still deterministic given the rng


def test_multihost_disjoint_shard_assignment(tmp_path):
    """Multi-host input sharding (SURVEY §5.8): each process reads a
    disjoint train-shard subset and yields local batches of
    batch_size/process_count; together they cover every sample exactly
    once per epoch."""
    for i in range(8):
        _write_shard(tmp_path / f"train-{i:06d}.tar", 8, seed=i, prefix=f"s{i}")

    def make(pi):
        cfg = DataConfig(
            data_dir=str(tmp_path), batch_size=4, shuffle_buffer=0,
            process_index=pi, process_count=2, distmap=False,
        )
        dm = DeadtreesDataModule(cfg)
        dm.setup()
        return dm

    dm0, dm1 = make(0), make(1)
    assert dm0.train_shards == dm1.train_shards  # same global view
    assert set(dm0.train_shards_local).isdisjoint(dm1.train_shards_local)
    assert sorted(dm0.train_shards_local + dm1.train_shards_local) == sorted(
        dm0.train_shards
    )
    assert dm0.local_batch_size == 2
    assert dm0.steps_per_epoch == dm1.steps_per_epoch

    import jax

    rng = jax.random.PRNGKey(3)
    files0 = [f for b in dm0.train_batches(rng) for f in b["files"]]
    files1 = [f for b in dm1.train_batches(rng) for f in b["files"]]
    b0 = next(iter(dm0.train_batches(rng)))
    assert b0["image"].shape[0] == 2  # local batch size
    # both processes together see every sample exactly once modulo the
    # dropped partial tail
    assert len(set(files0) & set(files1)) == 0


def test_multihost_eval_slices_cover_batch(tmp_path):
    """Eval batches stream identically on every process; each keeps its
    process slice so the assembled global batch is the full batch."""
    for i in range(8):
        _write_shard(tmp_path / f"train-{i:06d}.tar", 8, seed=i)

    def val_batches(pi, pc):
        cfg = DataConfig(
            data_dir=str(tmp_path), batch_size=4, shuffle_buffer=0,
            process_index=pi, process_count=pc, distmap=False,
        )
        dm = DeadtreesDataModule(cfg)
        dm.setup()
        return [
            (np.asarray(b["image"]), list(b["files"]))
            for b in dm.val_batches()
        ]

    v0, v1 = val_batches(0, 2), val_batches(1, 2)
    full = val_batches(0, 1)
    assert len(v0) == len(v1) == len(full) and len(v0) >= 1
    assert v0[0][0].shape[0] == 2  # local slice of the global batch of 4
    # the two slices reassemble the exact single-process global batch
    for (i0, f0), (i1, f1), (fi, ff) in zip(v0, v1, full):
        np.testing.assert_array_equal(np.concatenate([i0, i1]), fi)
        assert f0 + f1 == ff


def test_multihost_eval_decodes_only_local_slice(tmp_path, monkeypatch):
    """Each eval process only DECODES its slice (raw streaming keeps the
    batch pacing identical): decode count per host is total/process_count,
    not total (the r2 O(hosts) duplication)."""
    import deadtrees_tpu.data.tar as tar_mod

    for i in range(8):
        _write_shard(tmp_path / f"train-{i:06d}.tar", 8, seed=i)

    counts = {"n": 0}
    orig = tar_mod.image_decoder

    def counting_decoder(data):
        counts["n"] += 1
        return orig(data)

    monkeypatch.setattr(tar_mod, "image_decoder", counting_decoder)

    def run(pi, pc):
        counts["n"] = 0
        cfg = DataConfig(
            data_dir=str(tmp_path), batch_size=4, shuffle_buffer=0,
            process_index=pi, process_count=pc, distmap=False,
            use_native=False,  # force the PIL path the counter wraps
        )
        dm = DeadtreesDataModule(cfg)
        dm.setup()
        n_batches = sum(1 for _ in dm.val_batches())
        return n_batches, counts["n"]

    nb_full, dec_full = run(0, 1)
    nb0, dec0 = run(0, 2)
    nb1, dec1 = run(1, 2)
    assert nb0 == nb1 == nb_full
    assert dec_full == nb_full * 4  # whole batch decoded on 1 process
    assert dec0 == dec1 == nb_full * 2  # each host decodes only its half
    assert dec0 + dec1 == dec_full


def test_multihost_eval_with_extras_slices(tmp_path):
    """Slices spanning main/extra stream parts: each host's local batch is
    assembled from exactly the parts its slice intersects, and the hosts
    together reassemble the single-process combined batch."""
    for i in range(8):
        _write_shard(tmp_path / f"train-{i:06d}.tar", 8, seed=i, prefix="main")
    for i in range(8):
        _write_shard(
            tmp_path / f"rnd-{i:06d}.tar", 8, seed=100 + i, prefix="rnd"
        )

    def val_batches(pi, pc):
        cfg = DataConfig(
            data_dir=str(tmp_path), pattern="train-*.tar",
            pattern_extra=["rnd-*.tar"], batch_size=4, batch_size_extra=[2],
            shuffle_buffer=0, process_index=pi, process_count=pc,
            distmap=False,
        )
        dm = DeadtreesDataModule(cfg)
        dm.setup()
        return [
            (np.asarray(b["image"]), list(b["files"]))
            for b in dm.val_batches()
        ]

    v0, v1 = val_batches(0, 2), val_batches(1, 2)
    full = val_batches(0, 1)
    assert len(v0) == len(v1) == len(full) >= 1
    for (i0, f0), (i1, f1), (fi, ff) in zip(v0, v1, full):
        # batch layout: [main0 main1 | extra0 extra1]; host0 gets the main
        # part, host1 the extra part
        assert all(f.startswith("main") for f in f0)
        assert all(f.startswith("rnd") for f in f1)
        np.testing.assert_array_equal(np.concatenate([i0, i1]), fi)
        assert f0 + f1 == ff


def test_multihost_batch_size_must_divide(tmp_path):
    for i in range(5):
        _write_shard(tmp_path / f"train-{i:06d}.tar", 8, seed=i)
    cfg = DataConfig(data_dir=str(tmp_path), batch_size=5,
                     process_index=0, process_count=2)
    dm = DeadtreesDataModule(cfg)
    dm.setup()
    with pytest.raises(ValueError, match="divisible"):
        _ = dm.local_batch_size


def test_materialize_falls_back_to_pil_when_native_fails(tmp_path, monkeypatch):
    """A bad shard must degrade to the PIL path, not truncate the epoch
    (silent truncation desyncs multi-host collectives)."""
    from deadtrees_tpu.data import native
    from deadtrees_tpu.data.tar import materialize_samples

    if not native.available():
        pytest.skip("native library not built")

    shard = tmp_path / "x-000000.tar"
    _write_shard(shard, 4)
    samples = native.index_shard_samples(str(shard))
    keys = sorted(samples)
    raw = [
        {"__native__": (str(shard), samples[k], (32, 32)),
         "stats": {"file": k, "frac": 0.0}}
        for k in keys
    ]

    def boom(*a, **k):
        raise ValueError("corrupted member")

    monkeypatch.setattr(native, "decode_batch", boom)
    decoded = materialize_samples(raw)
    assert len(decoded) == 4
    for k, d in zip(keys, decoded):
        assert d["image"].shape == (32, 32, 4)
        assert d["mask"].shape == (32, 32)
        assert d["stats"]["file"] == k


def test_producer_exception_surfaces_on_consumer(tmp_path):
    """A failing stream raises in the consuming thread instead of silently
    ending the epoch early."""
    from deadtrees_tpu.data.pipeline import _BatchProducer, DataConfig

    class FailingStream:
        def __iter__(self):
            yield {"image": np.zeros((8, 8, 4), np.uint8),
                   "mask": np.zeros((8, 8), np.uint8)}
            raise RuntimeError("stream died")

    cfg = DataConfig(data_dir=str(tmp_path), batch_size=1)
    producer = _BatchProducer(FailingStream(), 1, cfg)
    it = iter(producer)
    next(it)  # first batch fine
    with pytest.raises(RuntimeError, match="stream died"):
        next(it)


# ---------------------------------------------------------------------------
# remote shard sources: pipe:/http URLs + brace expansion (the reference
# reaches the same sources through WebDataset's url opener — its tests
# exercise pipe:cat URLs, tests/test_webdataloader.py)
# ---------------------------------------------------------------------------


def test_pipe_shard_matches_local(tmp_path):
    shard = tmp_path / "train-000000.tar"
    keys = _write_shard(shard, 5)
    local = list(iter_tar_samples(str(shard)))
    piped = list(iter_tar_samples(f"pipe:cat {shard}"))
    assert [s["__key__"].decode() for s in piped] == keys
    assert len(piped) == len(local)
    for a, b in zip(local, piped):
        assert a.keys() == b.keys()
        assert all(a[k] == b[k] for k in a)


def test_pipe_truncated_stream_raises(tmp_path):
    """A pipe command that exits non-zero AFTER a well-formed stream must
    raise — a truncated object-store read is not a short shard."""
    shard = tmp_path / "train-000000.tar"
    _write_shard(shard, 3)
    with pytest.raises(RuntimeError, match="exit"):
        list(iter_tar_samples(f"pipe:cat {shard} && false"))


def test_pipe_empty_stream_raises():
    with pytest.raises(Exception):
        list(iter_tar_samples("pipe:true"))


def test_pipe_early_abort_reaps_child(tmp_path):
    """Abandoning a pipe stream early kills the child instead of blocking
    on an unread pipe."""
    shard = tmp_path / "train-000000.tar"
    _write_shard(shard, 5)
    it = iter_tar_samples(f"pipe:cat {shard}")
    first = next(it)
    assert "__key__" in first
    it.close()  # must not hang


def test_http_shard_stream(tmp_path):
    import functools
    import http.server
    import socketserver
    import threading

    shard = tmp_path / "train-000000.tar"
    keys = _write_shard(shard, 4)
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    with socketserver.TCPServer(("127.0.0.1", 0), handler) as httpd:
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{port}/train-000000.tar"
            got = list(iter_tar_samples(url))
            assert [s["__key__"].decode() for s in got] == keys
        finally:
            httpd.shutdown()


def test_expand_shard_urls():
    from deadtrees_tpu.data import expand_shard_urls

    assert expand_shard_urls("s-{000..002}.tar") == [
        "s-000.tar", "s-001.tar", "s-002.tar"
    ]
    assert expand_shard_urls("pipe:cat s-{08..11}.tar") == [
        f"pipe:cat s-{i:02d}.tar" for i in (8, 9, 10, 11)
    ]
    assert expand_shard_urls("plain.tar") == ["plain.tar"]


def test_discover_shards_remote_spec(tmp_path):
    from deadtrees_tpu.data import discover_shards

    urls = discover_shards("pipe:cat /data/s-{000..003}.tar", "*.tar")
    assert len(urls) == 4 and urls[0] == "pipe:cat /data/s-000.tar"
    # local directories still glob
    _write_shard(tmp_path / "train-000000.tar", 2)
    assert len(discover_shards(tmp_path, "*.tar")) == 1


def test_datamodule_remote_pipe_end_to_end(tmp_path):
    """DataModule trains straight off pipe: shard urls (brace-expanded)."""
    for i in range(4):
        _write_shard(tmp_path / f"s-{i:02d}.tar", 8, seed=i, prefix=f"p{i}")
    cfg = DataConfig(
        data_dir=f"pipe:cat {tmp_path}/s-{{00..03}}.tar",
        batch_size=4, shuffle_buffer=0, num_workers=1,
    )
    dm = DeadtreesDataModule(cfg)
    dm.setup()
    batch = next(iter(dm.train_batches()))
    assert batch["image"].shape == (4, 32, 32, 4)
    assert batch["mask"].shape == (4, 32, 32)


def test_cache_shard_materializes_once(tmp_path):
    from deadtrees_tpu.data import cache_shard, iter_tar_samples

    shard = tmp_path / "train-000000.tar"
    keys = _write_shard(shard, 4)
    cache = tmp_path / "cache"
    marker = tmp_path / "fetches.log"
    url = f"pipe:cat {shard} && echo hit >> {marker}"

    local1 = cache_shard(url, cache)
    local2 = cache_shard(url, cache)
    assert local1 == local2 and Path(local1).parent == cache
    assert marker.read_text().count("hit") == 1  # one network fetch
    got = [s["__key__"].decode() for s in iter_tar_samples(local1)]
    assert got == keys
    # local paths pass through untouched
    assert cache_shard(str(shard), cache) == str(shard)


def test_cache_shard_failed_download_not_published(tmp_path):
    from deadtrees_tpu.data import cache_shard

    cache = tmp_path / "cache"
    with pytest.raises(RuntimeError, match="exit"):
        cache_shard("pipe:false", cache)
    assert list(cache.glob("*.tar")) == []  # nothing torn left behind


def test_stream_cache_dir_switches_to_local_after_first_epoch(tmp_path):
    from deadtrees_tpu.data.tar import make_sample_stream

    shard = tmp_path / "train-000000.tar"
    _write_shard(shard, 4)
    cache = tmp_path / "cache"
    marker = tmp_path / "fetches.log"
    url = f"pipe:cat {shard} && echo hit >> {marker}"

    stream = make_sample_stream([url], shuffle=0, cache_dir=str(cache))
    for _ in range(3):  # three epochs
        assert sum(1 for _ in stream) == 4
    assert marker.read_text().count("hit") == 1
