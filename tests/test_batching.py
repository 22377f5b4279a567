"""Dynamic request batching (serve/batching.py): coalescing, bucketing,
shape grouping, error fan-out, and the batched HTTP service end to end.

The reference serves one model call per request
(/root/reference/deadtrees/deployment/server.py:87-128); the TPU-shaped
serving mode batches concurrent requests (PERF.md r3 latency crossover).
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.serve.batching import MicroBatcher, bucket_size


def test_bucket_size():
    assert [bucket_size(n, 32) for n in (1, 2, 3, 4, 5, 9, 31, 32, 40)] == [
        1, 2, 4, 4, 8, 16, 32, 32, 32,
    ]
    assert bucket_size(7, 4) == 4  # capped


def _recording_runner(record, delay=0.0):
    def run_batch(stacked):
        if delay:
            time.sleep(delay)
        record.append(stacked.shape[0])
        # per-image identity surrogate: channel 0 of each image
        return stacked[:, :, :, 0]

    return run_batch


def _submit_wave(batcher, images, timeout=20.0):
    results = [None] * len(images)
    errors = [None] * len(images)

    def worker(i):
        try:
            results[i] = batcher.submit(images[i])
        except BaseException as e:  # noqa: BLE001 - test harness
            errors[i] = e

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(len(images))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=timeout)
    assert not any(t.is_alive() for t in threads), "submit() hung"
    return results, errors


def test_coalesces_concurrent_requests():
    record = []
    batcher = MicroBatcher(
        _recording_runner(record), max_batch=3, max_wait_ms=2000
    )
    try:
        images = [np.full((8, 8, 4), i, np.uint8) for i in range(3)]
        results, errors = _submit_wave(batcher, images)
        assert errors == [None] * 3
        for img, out in zip(images, results):
            np.testing.assert_array_equal(out, img[:, :, 0])
        # all three requests arrived inside the window -> ONE dispatch,
        # already at max_batch so no padding
        assert record == [3]
        assert batcher.dispatches == 1 and batcher.requests == 3
    finally:
        batcher.close()


def test_pads_to_power_of_two_bucket():
    record = []
    batcher = MicroBatcher(
        _recording_runner(record), max_batch=8, max_wait_ms=150
    )
    try:
        images = [np.full((4, 4, 1), i, np.uint8) for i in range(3)]
        results, errors = _submit_wave(batcher, images)
        assert errors == [None] * 3
        for img, out in zip(images, results):
            np.testing.assert_array_equal(out, img[:, :, 0])
        # 3 requests flushed by the window -> one padded bucket-4 dispatch
        assert record == [4]
    finally:
        batcher.close()


def test_shape_groups_never_mix():
    record = []
    batcher = MicroBatcher(
        _recording_runner(record), max_batch=8, max_wait_ms=100
    )
    try:
        images = [
            np.ones((8, 8, 4), np.uint8),
            np.ones((16, 16, 4), np.uint8),
            np.full((8, 8, 4), 2, np.uint8),
        ]
        results, errors = _submit_wave(batcher, images)
        assert errors == [None] * 3
        for img, out in zip(images, results):
            assert out.shape == img.shape[:2]
            np.testing.assert_array_equal(out, img[:, :, 0])
        assert batcher.dispatches == 2  # (8,8) pair + (16,16) single
    finally:
        batcher.close()


def test_wave_larger_than_max_batch_splits():
    record = []
    batcher = MicroBatcher(
        _recording_runner(record, delay=0.05), max_batch=4, max_wait_ms=100
    )
    try:
        images = [np.full((4, 4, 2), i, np.uint8) for i in range(6)]
        results, errors = _submit_wave(batcher, images)
        assert errors == [None] * 6
        for img, out in zip(images, results):
            np.testing.assert_array_equal(out, img[:, :, 0])
        assert sum(record) >= 6 and max(record) <= 4
        assert record[0] == 4  # first flush hit the cap
    finally:
        batcher.close()


def test_error_fans_out_and_serving_continues():
    calls = {"n": 0}

    def run_batch(stacked):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("device fell over")
        return stacked[:, :, :, 0]

    batcher = MicroBatcher(run_batch, max_batch=2, max_wait_ms=1000)
    try:
        images = [np.zeros((4, 4, 1), np.uint8)] * 2
        _, errors = _submit_wave(batcher, images)
        assert all(isinstance(e, RuntimeError) for e in errors)
        # the batcher survives the failure
        out = batcher.submit(np.ones((4, 4, 1), np.uint8))
        np.testing.assert_array_equal(out, np.ones((4, 4)))
    finally:
        batcher.close()


def test_submit_after_close_raises():
    batcher = MicroBatcher(lambda b: b[:, :, :, 0], max_batch=2, max_wait_ms=1)
    batcher.close()
    with pytest.raises(RuntimeError):
        batcher.submit(np.zeros((2, 2, 1), np.uint8))


def test_service_batched_matches_unbatched(tmp_path):
    """SegmentationService(batch_wait_ms=...) returns byte-identical
    responses to the unbatched service and coalesces concurrent calls."""
    import io

    from PIL import Image

    from deadtrees_tpu.core import save_checkpoint
    from deadtrees_tpu.models import create_model, init_model
    from deadtrees_tpu.serve import SegmentationService

    hparams = dict(
        architecture="unet",
        encoder_name="resnet18",
        in_channels=4,
        classes=3,
        decoder_channels=[16, 16, 8, 8, 8],
    )
    model = create_model(**hparams, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(
        ckpt, params=variables["params"], batch_stats=variables["batch_stats"],
        hparams=hparams, step=1, epoch=1,
    )

    rng = np.random.default_rng(7)
    uploads = []
    for _ in range(4):
        img = rng.integers(0, 255, (32, 32, 4), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img, "RGBA").save(buf, "PNG")
        uploads.append(buf.getvalue())

    plain = SegmentationService(ckpt)
    expected = [plain.segment(u)[0] for u in uploads]

    batched = SegmentationService(ckpt, batch_wait_ms=3000, max_batch=4)
    try:
        results = [None] * 4

        def worker(i):
            results[i] = batched.segment(uploads[i])[0]

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not any(t.is_alive() for t in threads)
        # bs=4 is not bit-identical to bs=1 (XLA reduction order); on the
        # random-init model near-tied logits may flip a few pixels. Require
        # near-total agreement per image instead of byte-equal PNGs.
        for got_png, want_png in zip(results, expected):
            got = np.asarray(Image.open(io.BytesIO(got_png)))
            want = np.asarray(Image.open(io.BytesIO(want_png)))
            assert (got == want).mean() > 0.98
        batcher = batched.batchers["jax"]
        assert batcher.requests == 4
        assert batcher.dispatches == 1  # max_batch reached -> one device call
    finally:
        batched.batchers["jax"].close()


def _tiny_service_ckpt(tmp_path):
    from deadtrees_tpu.core import save_checkpoint
    from deadtrees_tpu.models import create_model, init_model

    hparams = dict(
        architecture="unet", encoder_name="resnet18", in_channels=4,
        classes=3, decoder_channels=[16, 16, 8, 8, 8],
    )
    model = create_model(**hparams, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(
        ckpt, params=variables["params"], batch_stats=variables["batch_stats"],
        hparams=hparams, step=1, epoch=1,
    )
    return ckpt


def test_service_tta_mode(tmp_path):
    """SegmentationService(tta=) serves through the TTA engine."""
    import io

    from PIL import Image

    from deadtrees_tpu.serve import SegmentationService

    ckpt = _tiny_service_ckpt(tmp_path)
    svc = SegmentationService(ckpt, tta=4)
    assert svc.engines["jax"].tta_views == 4
    img = np.random.default_rng(3).integers(0, 255, (32, 32, 4), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, "PNG")
    body, headers = svc.segment(buf.getvalue())
    mask = np.asarray(Image.open(io.BytesIO(body)))
    assert mask.shape == (32, 32)


def test_create_app_reuses_service(tmp_path, monkeypatch):
    """create_app(service=...) must NOT build a second engine stack — the
    CLI's batching/tta knobs live on the service it already built."""
    import deadtrees_tpu.serve.server as srv

    pytest.importorskip("fastapi", reason="FastAPI flavor not installed")
    ckpt = _tiny_service_ckpt(tmp_path)
    service = srv.SegmentationService(ckpt)

    def boom(*a, **k):
        raise AssertionError("create_app constructed a second service")

    monkeypatch.setattr(srv, "SegmentationService", boom)
    app = srv.create_app(service=service)
    assert app is not None


def test_service_health_and_metrics(tmp_path):
    """/healthz + /metrics surface: counters move with requests and errors."""
    import io

    from PIL import Image

    from deadtrees_tpu.serve import SegmentationService

    ckpt = _tiny_service_ckpt(tmp_path)
    svc = SegmentationService(ckpt)

    health = svc.health()
    assert health["status"] == "ok"
    assert health["models"] == ["jax"] and health["batching"] is False

    fresh = svc.metrics_text()
    assert "# TYPE deadtrees_requests_total counter" in fresh
    assert "model_type=" not in fresh  # no requests yet -> no labeled series

    img = np.random.default_rng(5).integers(0, 255, (32, 32, 4), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, "PNG")
    svc.segment(buf.getvalue())
    svc.segment(buf.getvalue())
    with pytest.raises(ValueError):
        svc.segment(buf.getvalue(), model_type="nope")

    text = svc.metrics_text()
    assert 'deadtrees_requests_total{model_type="jax"} 2' in text
    # no unlabeled sibling series (would double-count under PromQL sum())
    assert "\ndeadtrees_requests_total 2" not in text
    assert "deadtrees_request_errors_total 1" in text
    assert "deadtrees_request_latency_seconds_total" in text


def test_stdlib_server_observability_routes(tmp_path):
    """GET /healthz and /metrics served over real HTTP (stdlib flavor)."""
    import json as _json
    import threading
    import urllib.request

    from deadtrees_tpu.serve import SegmentationService
    from deadtrees_tpu.serve.server import serve_stdlib

    ckpt = _tiny_service_ckpt(tmp_path)
    svc = SegmentationService(ckpt)
    server = serve_stdlib(svc, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as resp:
            payload = _json.loads(resp.read())
        assert payload["status"] == "ok" and payload["models"] == ["jax"]

        # query strings must not break GET routing (urlparse in do_GET)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics?x=1", timeout=10
        ) as resp:
            body = resp.read().decode()
        assert resp.headers["Content-Type"].startswith("text/plain")
        assert "# TYPE deadtrees_requests_total counter" in body
    finally:
        server.shutdown()
        server.server_close()
