"""Serving walkthrough — the REST segmentation service end to end.

Covers the deployment story of the reference's FastAPI backend
(/root/reference/deadtrees/deployment/server.py) plus the TPU-shaped
extras: the dependency-free stdlib server flavor, dynamic request
batching (concurrent uploads coalesce into one device dispatch), and the
2-bit packed wire format. CPU-sized; the same code runs on TPU.

    python examples/03_serving.py [workdir]
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
import threading
import urllib.request
from pathlib import Path

if not os.environ.get("DEADTREES_EXAMPLE_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def make_checkpoint(path: Path) -> Path:
    import jax
    import jax.numpy as jnp

    from deadtrees_tpu.core.checkpoint import save_checkpoint
    from deadtrees_tpu.models.factory import create_model, init_model

    hparams = dict(
        architecture="unet",
        encoder_name="resnet18",
        decoder_channels=[16, 16, 8, 8, 8],
        classes=3,
        in_channels=4,
    )
    model = create_model(**hparams, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=64)
    save_checkpoint(
        path,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        hparams=hparams,
    )
    return path


def main(workdir: Path) -> None:
    from PIL import Image

    from deadtrees_tpu.serve import SegmentationService, serve_stdlib

    ckpt = make_checkpoint(workdir / "model.ckpt")

    # ------------------------------------------------------------------ #
    # 1. Start the service. batch_wait_ms enables dynamic batching:
    #    concurrent same-size uploads coalesce into ONE device dispatch
    #    (power-of-two buckets — on a v5e, bs=4 is 1.42x per image over
    #    bs=1 and bs=32 ≈ 4x; see docs/PERFORMANCE.md). The stdlib server
    #    exposes the same routes as the FastAPI flavor.
    # ------------------------------------------------------------------ #
    service = SegmentationService(ckpt, batch_wait_ms=200, max_batch=4)
    server = serve_stdlib(service, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"serving on http://127.0.0.1:{port}")

    # ------------------------------------------------------------------ #
    # 2. Concurrent clients: 4 uploads arriving together leave as one
    #    model call. The response is the reference's PNG (mask x 255)
    #    with prediction stats in the headers.
    # ------------------------------------------------------------------ #
    rng = np.random.default_rng(7)

    def upload_bytes() -> bytes:
        img = rng.integers(0, 255, (64, 64, 4), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img, "RGBA").save(buf, "PNG")
        return buf.getvalue()

    uploads = [upload_bytes() for _ in range(4)]
    results: dict = {}

    def post(i: int, query: str = "") -> None:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/segmentation{query}",
            data=uploads[i], method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            results[i] = (resp.status, resp.read(), dict(resp.headers))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    batcher = service.batchers["jax"]
    assert all(results[i][0] == 200 for i in range(4))
    print(
        f"4 concurrent requests → {batcher.dispatches} device dispatch(es); "
        f"fraction={results[0][2]['X-fraction'][:6]} "
        f"elapsed={results[0][2]['X-elapsed'][:6]}s"
    )

    # ------------------------------------------------------------------ #
    # 3. Packed wire format: ?packed=1 returns the raw 2-bit class map
    #    (4 px/byte) instead of a PNG — the serving transfer format the
    #    scene path uses on device.
    # ------------------------------------------------------------------ #
    post(0, query="?packed=1")
    status, body, headers = results[0]
    h, w = map(int, headers["X-Packed-Shape"].split(","))
    from deadtrees_tpu.infer.packing import unpack2

    packed = np.frombuffer(body, np.uint8).reshape(h, w // 4)
    classes = unpack2(packed, w)
    print(
        f"packed: {len(body)} B for a {h}x{w} map "
        f"(classes {sorted(np.unique(classes).tolist())})"
    )

    server.shutdown()
    service.close()
    print("OK")


if __name__ == "__main__":
    wd = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    wd.mkdir(parents=True, exist_ok=True)
    main(wd)
