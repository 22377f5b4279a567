"""Visualization helpers: sample grids, CM heatmaps, display denorm
(reference deadtrees/visualization/helper.py:52-233 counterparts).
Figures are rendered on the Agg backend; assertions cover geometry and
the denormalization math, not pixels.
"""

import numpy as np
import pytest

from deadtrees_tpu.visualization.helper import (
    denormalize_for_display,
    fig2img,
    show,
    show_cm,
)


def close(fig):
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_denormalize_roundtrip():
    mean = [0.4, 0.5, 0.6, 0.3]
    std = [0.2, 0.2, 0.2, 0.2]
    rng = np.random.default_rng(0)
    raw = rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
    normalized = (raw - np.asarray(mean, np.float32)) / np.asarray(
        std, np.float32
    )
    out = denormalize_for_display(normalized, mean=mean, std=std)
    assert out.shape == (8, 8, 3)  # NIR dropped for display
    assert out.dtype == np.uint8
    np.testing.assert_allclose(
        out, (raw[..., :3] * 255).astype(np.uint8), atol=1
    )


def test_denormalize_clips_out_of_range():
    img = np.full((4, 4, 3), 50.0, np.float32)  # way past 1.0 after denorm
    out = denormalize_for_display(img, mean=[0.5] * 3, std=[1.0] * 3)
    assert out.max() == 255
    out = denormalize_for_display(
        np.full((4, 4, 3), -50.0, np.float32), mean=[0.5] * 3, std=[1.0] * 3
    )
    assert out.min() == 0


@pytest.mark.parametrize("with_pred", [False, True])
@pytest.mark.parametrize("n", [1, 3])
def test_show_grid_geometry(with_pred, n):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (n, 16, 16, 4)).astype(np.float32)
    y = rng.integers(0, 3, (n, 16, 16)).astype(np.int32)
    y_hat = (
        rng.uniform(0, 1, (n, 16, 16, 3)).astype(np.float32)
        if with_pred
        else None
    )
    fig = show(x, y, y_hat, n_samples=8)
    rows = 4 if with_pred else 3
    assert len(fig.axes) == rows * n
    img = fig2img(fig)
    assert img.size[0] > 10 and img.size[1] > 10
    close(fig)


def test_show_accepts_class_map_predictions():
    """y_hat may be (B, H, W) class maps instead of probabilities."""
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 16, 16, 4)).astype(np.float32)
    y = rng.integers(0, 3, (2, 16, 16)).astype(np.int32)
    pred = rng.integers(0, 3, (2, 16, 16)).astype(np.uint8)
    fig = show(x, y, pred)
    assert len(fig.axes) == 4 * 2
    close(fig)


def test_show_cm_variants():
    cm = np.array([[0.9, 0.1, 0.0], [0.2, 0.7, 0.1], [0.0, 0.3, 0.7]])
    fig = show_cm(cm)
    assert len(fig.axes) >= 1
    close(fig)

    fig = show_cm(
        cm, cm_masked=cm.T, class_names=["bg", "conifer", "broadleaf"]
    )
    # default + forest-masked panel (seaborn adds colorbar axes)
    assert len(fig.axes) >= 2
    close(fig)
