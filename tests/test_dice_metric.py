"""Golden-value dice metric tests.

Same fixtures and expected values as the reference's
tests/test_dice_metric.py:8-72, which validated against MONAI's DiceMetric.
Our `dice_score` must reproduce those golden numbers exactly.
Tensors here are channel-last (B, H, W, K).
"""

import numpy as np
import pytest

from deadtrees_tpu.losses import dice_score

n = 5  # w/h size
b = 1  # batch size

sample = np.zeros((b, n, n, 2), dtype=np.float32)
sample[:, :, :, 0] = 1
sample[:, 2:n, 2:n, 0] = 0
sample[:, 2:n, 2:n, 1] = 1

increments = [(2, 1.0), (3, 0.7401), (4, 0.5)]
increments2 = [(2, 1.0), (3, 0.6154), (4, 0.2)]


def make_pred(inc):
    fake_pred = np.zeros((b, n, n, 2), dtype=np.float32)
    fake_pred[:, :, :, 0] = 1
    fake_pred[:, inc:n, inc:n, 0] = 0
    fake_pred[:, inc:n, inc:n, 1] = 1
    return fake_pred


@pytest.mark.parametrize("inc,res", increments)
def test_dicemetric_with_background(inc, res):
    score = dice_score(make_pred(inc), sample, include_background=True)
    np.testing.assert_allclose(float(score), res, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("inc,res", increments2)
def test_dicemetric_without_background(inc, res):
    score = dice_score(make_pred(inc), sample, include_background=False)
    np.testing.assert_allclose(float(score), res, rtol=1e-3, atol=1e-4)


def test_dicemetric_all_zeros():
    empty = np.zeros((b, n, n, 2), dtype=np.float32)
    empty[:, :, :, 0] = 1

    score = dice_score(make_pred(4), empty, include_background=True)
    np.testing.assert_allclose(float(score), 0.9795918464660645, rtol=1e-6)
