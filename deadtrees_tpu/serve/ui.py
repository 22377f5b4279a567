"""Streamlit frontend (reference deadtrees/deployment/ui.py:16-169).

Upload an image, POST it to the backend ``/segmentation`` endpoint, and show
the source and predicted mask side by side with the prediction stats from
the response headers. Run with:

    streamlit run deadtrees_tpu/serve/ui.py

Gated on streamlit being installed (absent in this image); the module
imports lazily so the package works without it.
"""

from __future__ import annotations

import io
import os


def main() -> None:  # pragma: no cover - needs streamlit runtime
    import requests
    import streamlit as st
    from PIL import Image

    backend = os.environ.get("BACKEND_URL", "http://backend:8000/segmentation")

    st.set_page_config(page_title="DeadTrees TPU", page_icon="🌲")
    st.title("🌲☠️🌲 DeadTrees segmentation")
    st.markdown(
        "Upload an orthophoto patch; the backend returns the dead-tree "
        "segmentation mask."
    )

    model_type = st.sidebar.selectbox("Model backend", ["jax", "exported"])
    uploaded = st.file_uploader("Image", type=["png", "jpg", "jpeg", "tif", "tiff"])

    if uploaded is not None:
        file_bytes = uploaded.read()
        resp = requests.post(
            f"{backend}?model_type={model_type}",
            files={"file": file_bytes},
            timeout=300,
        )
        resp.raise_for_status()
        mask = Image.open(io.BytesIO(resp.content))

        col1, col2 = st.columns(2)
        with col1:
            st.image(Image.open(io.BytesIO(file_bytes)), caption="input")
        with col2:
            st.image(mask, caption="prediction")

        st.subheader("Stats")
        for k, v in resp.headers.items():
            if k.lower().startswith("x-"):
                st.text(f"{k[2:]}: {v}")


if __name__ == "__main__":  # pragma: no cover
    main()
