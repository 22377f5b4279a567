"""Checkpoint round-trip, retention policy, inference engines, AOT export,
scene predictor, and the HTTP server — the deployment stack
(reference deployment/inference.py, server.py, create_onnx.py analogues).
"""

import io
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.core import (
    BestCheckpointKeeper,
    load_checkpoint,
    save_checkpoint,
)
from deadtrees_tpu.models import create_model, init_model

HPARAMS = dict(
    architecture="unet",
    encoder_name="resnet18",
    in_channels=4,
    classes=3,
    decoder_channels=[16, 16, 8, 8, 8],
)


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    model = create_model(**HPARAMS, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=64)
    path = tmp_path_factory.mktemp("ckpt") / "model.ckpt"
    save_checkpoint(
        path,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        hparams=HPARAMS,
        step=123,
        epoch=7,
    )
    return path


def test_checkpoint_roundtrip(ckpt_path):
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["hparams"] == HPARAMS
    assert int(ckpt["step"]) == 123 and int(ckpt["epoch"]) == 7
    assert "encoder" in ckpt["params"]


def test_checkpoint_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.ckpt"
    bad.write_bytes(b"not a checkpoint")
    with pytest.raises(ValueError):
        load_checkpoint(bad)


def test_best_keeper_retention(tmp_path):
    keeper = BestCheckpointKeeper(tmp_path, monitor="val/dice", mode="max")
    saved = []

    def save_fn(path):
        path.write_bytes(b"x")
        saved.append(path.name)

    assert keeper.update(0.5, 0, save_fn) is not None
    assert keeper.update(0.4, 1, save_fn) is None  # no improvement
    best = keeper.update(0.7, 2, save_fn)
    assert best and best.name == "epoch_002.ckpt"
    existing = {p.name for p in tmp_path.glob("*.ckpt")}
    assert existing == {"last.ckpt", "epoch_002.ckpt"}  # old best deleted


def test_async_writer_matches_sync(ckpt_path, tmp_path):
    from deadtrees_tpu.core import AsyncCheckpointWriter

    ckpt = load_checkpoint(ckpt_path)
    writer = AsyncCheckpointWriter()
    apath = tmp_path / "async.ckpt"
    writer.save(
        apath, params=ckpt["params"], batch_stats=ckpt["batch_stats"],
        hparams=ckpt["hparams"], step=123, epoch=7,
    )
    writer.close()
    got = load_checkpoint(apath)
    ref = load_checkpoint(ckpt_path)
    assert got["hparams"] == ref["hparams"]
    assert int(got["step"]) == 123 and int(got["epoch"]) == 7
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, got["params"], ref["params"]
    )


def test_async_writer_same_path_applies_in_order(ckpt_path, tmp_path):
    from deadtrees_tpu.core import AsyncCheckpointWriter

    ckpt = load_checkpoint(ckpt_path)
    writer = AsyncCheckpointWriter()
    path = tmp_path / "last.ckpt"
    for step in (1, 2, 3):
        writer.save(
            path, params=ckpt["params"], batch_stats=ckpt["batch_stats"],
            hparams=ckpt["hparams"], step=step, epoch=step,
        )
    writer.close()
    assert int(load_checkpoint(path)["step"]) == 3


def test_async_writer_save_many_single_snapshot(ckpt_path, tmp_path):
    from deadtrees_tpu.core import AsyncCheckpointWriter

    ckpt = load_checkpoint(ckpt_path)
    writer = AsyncCheckpointWriter()
    paths = [tmp_path / "last.ckpt", tmp_path / "epoch_001.ckpt"]
    writer.save_many(
        paths, params=ckpt["params"], batch_stats=ckpt["batch_stats"],
        hparams=ckpt["hparams"], step=9, epoch=1,
    )
    writer.wait()
    a, b = (load_checkpoint(p) for p in paths)
    assert int(a["step"]) == int(b["step"]) == 9
    writer.close()


def test_async_writer_delete_ordered_after_write(ckpt_path, tmp_path):
    """writer.delete() must queue on the writer thread, after prior writes."""
    from deadtrees_tpu.core import AsyncCheckpointWriter

    ckpt = load_checkpoint(ckpt_path)
    writer = AsyncCheckpointWriter()
    path = tmp_path / "epoch_000.ckpt"
    writer.save(
        path, params=ckpt["params"], batch_stats=ckpt["batch_stats"],
        hparams=ckpt["hparams"], step=1, epoch=0,
    )
    writer.delete(path)  # queued AFTER the write: no stale file survives
    writer.wait()
    assert not path.exists()
    # and a delete of a never-written path is a silent no-op
    writer.delete(tmp_path / "never_written.ckpt")
    writer.close()


def test_best_keeper_delete_fn_defers_to_writer_queue(tmp_path):
    """Superseded-best removal must ride the async queue: a direct unlink
    at update() time races the old best's still-queued write and leaves a
    stale 'best' file once that write lands."""
    keeper = BestCheckpointKeeper(tmp_path, monitor="val/dice", mode="max")
    queue = []  # simulated async writer: ops run strictly in order, later

    def save_many_fn(paths):
        queue.append(lambda paths=list(paths): [p.write_bytes(b"x") for p in paths])

    def delete_fn(path):
        queue.append(lambda p=path: p.unlink(missing_ok=True))

    keeper.update(0.5, 0, None, save_many_fn=save_many_fn, delete_fn=delete_fn)
    keeper.update(0.7, 1, None, save_many_fn=save_many_fn, delete_fn=delete_fn)
    for op in queue:  # drain the "writer thread"
        op()
    existing = {p.name for p in tmp_path.glob("*.ckpt")}
    assert existing == {"last.ckpt", "epoch_001.ckpt"}


def test_async_writer_surfaces_write_errors(ckpt_path, tmp_path):
    from deadtrees_tpu.core import AsyncCheckpointWriter

    ckpt = load_checkpoint(ckpt_path)
    blocker = tmp_path / "not_a_dir"
    blocker.write_bytes(b"file, not a directory")
    writer = AsyncCheckpointWriter()
    writer.save(
        blocker / "x.ckpt", params=ckpt["params"],
        batch_stats=ckpt["batch_stats"], hparams=ckpt["hparams"],
    )
    with pytest.raises(OSError):
        writer.wait()
    # the worker survives a failed write
    ok = tmp_path / "ok.ckpt"
    writer.save(
        ok, params=ckpt["params"], batch_stats=ckpt["batch_stats"],
        hparams=ckpt["hparams"],
    )
    writer.close()
    assert ok.exists()


def test_jax_inference_engine(ckpt_path):
    from deadtrees_tpu.infer import JaxInference

    eng = JaxInference(ckpt_path)
    assert eng.in_channels == 4
    img = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 4), np.uint8)
    out = eng.run(img)
    assert out.shape == (2, 64, 64)
    assert out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 1, 2}


def test_ensemble_guards_and_vote(ckpt_path):
    from deadtrees_tpu.infer import EnsembleInference, JaxInference

    with pytest.raises(ValueError):
        EnsembleInference([ckpt_path, ckpt_path])

    ens = EnsembleInference([ckpt_path] * 3)
    assert ens.homogeneous
    img = np.random.default_rng(1).integers(0, 255, (1, 64, 64, 4), np.uint8)
    single = JaxInference(ckpt_path).run(img)
    voted = ens.run(img)
    # identical members: near-exact match (vmap fp ulps may flip near-ties)
    assert (voted != single).mean() < 1e-2


def test_ensemble_mixed_architectures(ckpt_path, tmp_path):
    """Reference parity: ensembles may mix arbitrary checkpoints
    (deployment/inference.py:65-116) — heterogeneous members take the
    sequential per-model path and majority-vote on host."""
    from deadtrees_tpu.infer import EnsembleInference, JaxInference

    other_hp = dict(HPARAMS, encoder_name="resnet34")
    model = create_model(**other_hp, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(1), image_size=64)
    other = tmp_path / "other.ckpt"
    save_checkpoint(
        other, params=variables["params"],
        batch_stats=variables["batch_stats"], hparams=other_hp,
    )

    ens = EnsembleInference([ckpt_path, ckpt_path, other])
    assert not ens.homogeneous
    img = np.random.default_rng(2).integers(0, 255, (1, 64, 64, 4), np.uint8)
    voted = ens.run(img)
    assert voted.shape == (1, 64, 64) and voted.dtype == np.uint8
    # two identical members of A out-vote the single B everywhere
    np.testing.assert_array_equal(voted, JaxInference(ckpt_path).run(img))

    # class-count disagreement is a hard error
    bad_hp = dict(HPARAMS, classes=2)
    model = create_model(**bad_hp, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(2), image_size=64)
    bad = tmp_path / "bad.ckpt"
    save_checkpoint(
        bad, params=variables["params"],
        batch_stats=variables["batch_stats"], hparams=bad_hp,
    )
    with pytest.raises(ValueError):
        EnsembleInference([ckpt_path, ckpt_path, bad])


def test_export_roundtrip_dynamic_batch(ckpt_path, tmp_path):
    from deadtrees_tpu.infer import ExportedInference, JaxInference
    from deadtrees_tpu.infer.export import export_inference

    artifact = tmp_path / "model.dtexp"
    export_inference(ckpt_path, artifact, image_size=64)
    exp = ExportedInference(artifact)
    eng = JaxInference(ckpt_path)

    for bs in (1, 3):
        img = np.random.default_rng(bs).integers(0, 255, (bs, 64, 64, 4), np.uint8)
        # the symbolic-batch program fuses differently; untrained nets on
        # noise have many near-tied logits, so allow rare argmax flips
        assert (exp.run(img) != eng.run(img)).mean() < 1e-2


def test_scene_predictor_matches_engine(ckpt_path):
    from deadtrees_tpu.infer import JaxInference, predict_scene

    eng = JaxInference(ckpt_path)
    scene = np.random.default_rng(2).integers(0, 255, (100, 150, 4), np.uint8)
    out = predict_scene(
        eng.model, eng.variables, scene, tile_shape=(128, 192), subtile=64,
        batch_size=2,
    )
    assert out.shape == (100, 150)
    # the top-left full subtile must agree with direct engine output
    direct = eng.run(scene[None, :64, :64, :])[0]
    assert np.array_equal(out[:64, :64], direct)


def test_scene_batch_matches_per_scene(ckpt_path):
    """Multi-scene dispatch (the throughput path: 2+ scenes fill one
    bs-128 sub-batch) must reproduce per-scene results, including the
    zero-padded tail group."""
    from deadtrees_tpu.infer import JaxInference, predict_scene
    from deadtrees_tpu.infer.sliding import predict_scenes

    eng = JaxInference(ckpt_path)
    rng = np.random.default_rng(3)
    scenes = [
        rng.integers(0, 255, (100, 150, 4), np.uint8) for _ in range(3)
    ]
    batched = predict_scenes(
        eng.model, eng.variables, scenes, tile_shape=(128, 192), subtile=64,
        batch_size=4, scenes_per_dispatch=2,  # 3 scenes → full + padded tail
    )
    assert len(batched) == 3
    for scene, got in zip(scenes, batched):
        single = predict_scene(
            eng.model, eng.variables, scene, tile_shape=(128, 192),
            subtile=64, batch_size=4,
        )
        assert got.shape == single.shape == (100, 150)
        np.testing.assert_array_equal(got, single)


def test_http_server_roundtrip(ckpt_path):
    from PIL import Image

    from deadtrees_tpu.serve import SegmentationService, serve_stdlib

    svc = SegmentationService(ckpt_path)
    server = serve_stdlib(svc, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        html = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read()
        assert b"DeadTrees" in html

        img = np.zeros((64, 64, 4), np.uint8)
        img[16:40, 16:40] = 90
        buf = io.BytesIO()
        Image.fromarray(img, "RGBA").save(buf, "PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segmentation", data=buf.getvalue(),
            method="POST",
        )
        resp = urllib.request.urlopen(req)
        assert resp.status == 200
        mask = Image.open(io.BytesIO(resp.read()))
        assert mask.size == (64, 64)
        assert "X-fraction" in resp.headers
        assert float(resp.headers["X-elapsed"]) > 0

        # packed 2-bit wire format
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segmentation?packed=1",
            data=buf.getvalue(), method="POST",
        )
        resp = urllib.request.urlopen(req)
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "application/octet-stream"
        h, w = map(int, resp.headers["X-Packed-Shape"].split(","))
        assert (h, w) == (64, 64)
        raw = np.frombuffer(resp.read(), np.uint8).reshape(h, w // 4)
        from deadtrees_tpu.infer.packing import unpack2

        classes = unpack2(raw, w)
        assert classes.shape == (64, 64) and classes.max() <= 2

        # bad model type -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segmentation?model_type=onnx",
            data=buf.getvalue(), method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
    finally:
        server.shutdown()


def test_best_keeper_save_many_coalesces(tmp_path):
    keeper = BestCheckpointKeeper(tmp_path, monitor="val/dice", mode="max")
    calls = {"single": [], "many": []}

    def save_fn(path):
        path.write_bytes(b"x")
        calls["single"].append(path.name)

    def save_many_fn(paths):
        for p in paths:
            p.write_bytes(b"x")
        calls["many"].append([p.name for p in paths])

    best = keeper.update(0.5, 0, save_fn, save_many_fn=save_many_fn)
    assert best and best.name == "epoch_000.ckpt"
    assert calls["many"] == [["last.ckpt", "epoch_000.ckpt"]]
    assert calls["single"] == []  # improvement path uses ONE snapshot
    keeper.update(0.4, 1, save_fn, save_many_fn=save_many_fn)
    assert calls["single"] == ["last.ckpt"]  # no improvement -> last only
    assert len(calls["many"]) == 1
