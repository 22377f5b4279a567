"""bench.py driver-contract pieces that must not regress.

The driver runs ``python bench.py`` once per round on the real TPU and
records the single stdout JSON line; a transient tunnel-init failure
(observed r3: 25-min hang then ``Unable to initialize backend 'axon'``)
must trigger a bounded re-exec retry instead of losing the round's
benchmark.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import numpy as np
import pytest

import bench


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("DEADTREES_BENCH_INIT_TRIES", raising=False)


def test_devices_retry_reexecs_on_backend_error(monkeypatch):
    calls = {}

    def fake_get():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    def fake_execv(exe, argv):
        calls["execv"] = (exe, argv)

    bench._devices_with_retry(
        get=fake_get, execv=fake_execv, sleep=lambda s: calls.setdefault("slept", s)
    )
    assert calls["execv"][0] == sys.executable
    assert calls["slept"] == 60
    assert os.environ["DEADTREES_BENCH_INIT_TRIES"] == "1"


def test_devices_retry_bounded(monkeypatch):
    monkeypatch.setenv("DEADTREES_BENCH_INIT_TRIES", "2")

    def fake_get():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    with pytest.raises(RuntimeError):
        bench._devices_with_retry(
            get=fake_get,
            execv=lambda *a: pytest.fail("must not re-exec at the bound"),
            sleep=lambda s: None,
        )


def test_devices_retry_passthrough_unrelated_error():
    with pytest.raises(RuntimeError, match="something else"):
        bench._devices_with_retry(
            get=lambda: (_ for _ in ()).throw(RuntimeError("something else")),
            execv=lambda *a: pytest.fail("must not re-exec on unrelated errors"),
            sleep=lambda s: None,
        )


def test_devices_retry_success_path():
    sentinel = ["dev0"]
    assert bench._devices_with_retry(get=lambda: sentinel) is sentinel


def test_bench_scene_smoke_cpu():
    """The scene ride-along must be runnable end-to-end (model init →
    make_scene_predictor → packed D2H → tiles512/s math) — tiny geometry
    so the CPU covers the wiring the TPU run exercises at full size."""
    tps = bench.bench_scene(
        "unet", "resnet18",
        scenes=1, tile=128, subtile=64, iters=1, batch_size=4,
        decoder_channels=(16, 8, 8, 8, 8),
    )
    assert tps > 0


def test_d2h_preflight_returns_positive_rate():
    """The attachment-state preflight (VERDICT r4 weak 6) must return a
    finite MB/s figure on any backend (CPU here)."""
    rate = bench.d2h_preflight(mb=4, tries=2)
    assert np.isfinite(rate) and rate > 0
