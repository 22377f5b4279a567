"""Frontend logic tests (VERDICT r3 item 5): the streamlit UI's request,
parsing, markdown, and juxtapose-slider pieces run without streamlit —
``render`` takes the st module as a parameter, so a fake drives the whole
page flow against the real stdlib backend server.
"""

import io
import threading

import numpy as np
import pytest
from PIL import Image

from deadtrees_tpu.serve.ui import (
    DISPLAY_MODES,
    juxtapose_html,
    process,
    render,
    stats_from_headers,
    stats_markdown,
)
from tests.test_batching import _tiny_service_ckpt


def test_juxtapose_html_embed():
    html = juxtapose_html("SRC.png", "PRED.png", height=432)
    assert "cdn.knightlab.com/libs/juxtapose" in html
    assert 'src: "SRC.png", label: \'source\'' in html
    assert 'src: "PRED.png", label: \'prediction\'' in html
    assert 'startingPosition: "50%"' in html
    assert "height: 432px" in html


def test_stats_from_headers_and_markdown():
    headers = {
        "X-Model-Name": "bestmodel",
        "X-Model-Type": "jax",
        "X-Fraction": "0.125",
        "X-Elapsed": "1.5",
        "Content-Type": "image/png",
    }
    stats = stats_from_headers(headers)
    assert stats == {
        "model_name": "bestmodel", "model_type": "jax",
        "fraction": "0.125", "elapsed": "1.5",
    }
    md = stats_markdown(stats)
    assert "Model: **bestmodel**" in md
    assert "Format: **jax**" in md
    assert "**12.50%**" in md
    assert "**1.5sec**" in md


# ---------------------------------------------------------------------------
# page flow against the real backend
# ---------------------------------------------------------------------------


class _FakeColumn:
    def __init__(self, rec, answers):
        self.rec = rec
        self.answers = answers

    def selectbox(self, label, options, **kw):
        return self.answers.get("model_type", options[0])

    def radio(self, label, options, index=0, **kw):
        return self.answers.get("display", options[index])

    def header(self, text):
        self.rec.setdefault("headers", []).append(text)

    def image(self, img, **kw):
        self.rec.setdefault("images", []).append(img)


class _FakeSt:
    """Records every streamlit call render makes."""

    def __init__(self, upload, answers):
        self.upload = upload
        self.answers = answers
        self.rec = {"writes": [], "markdown": []}

    def set_page_config(self, **kw):
        self.rec["page_config"] = kw

    def title(self, t):
        self.rec["title"] = t

    def write(self, t):
        self.rec["writes"].append(t)

    def markdown(self, t):
        self.rec["markdown"].append(t)

    def columns(self, n):
        return tuple(_FakeColumn(self.rec, self.answers) for _ in range(n))

    def file_uploader(self, label, **kw):
        return self.upload

    def button(self, label):
        return self.answers.get("button", True)


@pytest.fixture(scope="module")
def backend(tmp_path_factory):
    from deadtrees_tpu.serve import SegmentationService
    from deadtrees_tpu.serve.server import serve_stdlib

    ckpt = _tiny_service_ckpt(tmp_path_factory.mktemp("ui_ckpt"))
    svc = SegmentationService(ckpt)
    server = serve_stdlib(svc, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}/segmentation"
    server.shutdown()
    server.server_close()


def _upload_bytes(seed=0, size=32) -> bytes:
    img = np.random.default_rng(seed).integers(0, 255, (size, size, 4), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, "PNG")
    return buf.getvalue()


def test_process_round_trip(backend):
    result = process(_upload_bytes(), backend, "jax")
    mask = Image.open(io.BytesIO(result["mask"]))
    assert mask.size == (32, 32)
    assert result["stats"]["model_type"] == "jax"
    assert 0.0 <= float(result["stats"]["fraction"]) <= 1.0


def test_render_side_by_side(backend):
    st = _FakeSt(io.BytesIO(_upload_bytes()), {"display": "Side-by-side"})
    shown = []
    result = render(st, lambda html, **kw: shown.append(html), backend=backend)
    assert result is not None
    assert st.rec["headers"] == ["Source", "Prediction"]
    assert len(st.rec["images"]) == 2
    assert not shown  # no slider embed in side-by-side mode
    assert any("Stats" in m for m in st.rec["markdown"])


def test_render_slider(backend):
    st = _FakeSt(io.BytesIO(_upload_bytes(1)), {"display": "Slider"})
    shown = []
    result = render(st, lambda html, **kw: shown.append(html), backend=backend)
    assert result is not None
    assert len(shown) == 1
    html = shown[0]
    assert "juxtapose.JXSlider" in html
    # both images ride inline as data URIs (no static-dir writes)
    assert html.count("data:image/png;base64,") == 2
    assert "images" not in st.rec  # slider replaces the side-by-side pair


def test_render_default_mode_is_slider():
    # reference ui.py:128: radio(..., index=1) defaults to the slider
    assert DISPLAY_MODES[1] == "Slider"


def test_render_no_upload_prompts(backend):
    st = _FakeSt(None, {"display": "Slider"})
    result = render(st, lambda html, **kw: None, backend=backend)
    assert result is None
    assert "Insert an image!" in st.rec["writes"]
