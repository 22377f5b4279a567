"""Loss-suite unit tests against independent numpy oracles.

Each oracle recomputes the published formula (boundary-loss paper / GDL /
GWDL / focal) directly in numpy, mirroring the reference test strategy of
validating against an external implementation rather than the code under
test (/root/reference/tests/test_dice_metric.py uses MONAI the same way).
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

from deadtrees_tpu.losses import (
    BoundaryLoss,
    CrossEntropy,
    DiceLoss,
    FocalLoss,
    GeneralizedDice,
    GeneralizedDiceLoss,
    GeneralizedWassersteinDiceLoss,
    class2one_hot,
    fscore,
    one_hot2dist,
)
from deadtrees_tpu.losses.functional import edt

B, H, W, K = 2, 8, 8, 3
EPS = 1e-10


@pytest.fixture(scope="module")
def probs_and_target():
    r = np.random.default_rng(0)
    logits = r.normal(size=(B, H, W, K)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    labels = r.integers(0, K, size=(B, H, W))
    target = np.eye(K, dtype=np.float32)[labels]
    return probs, target, labels


def test_class2one_hot():
    seg = np.array([[[0, 1], [2, 1]]])
    oh = np.asarray(class2one_hot(seg, 3))
    assert oh.shape == (1, 2, 2, 3)
    assert (oh.argmax(-1) == seg).all()
    assert oh.sum() == 4


def test_generalized_dice_loss_gdl_variant(probs_and_target):
    probs, target, _ = probs_and_target
    got = float(GeneralizedDiceLoss()(probs, target))

    w = 1.0 / (target.sum(axis=(0, 1, 2)) ** 2 + 1e-9)
    num = (w * (target * probs).sum(axis=(0, 1, 2))).sum()
    den = (w * (target + probs).sum(axis=(0, 1, 2))).sum()
    want = 1.0 - 2.0 * (num + 1e-9) / (den + 1e-9)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_generalized_dice_boundary_repo_variant(probs_and_target):
    probs, target, _ = probs_and_target
    idc = (0, 1, 2)
    got = float(GeneralizedDice(idc=idc)(probs, target))

    w = 1.0 / (target.sum(axis=(1, 2)) ** 2 + EPS)  # (B, K)
    inter = w * (probs * target).sum(axis=(1, 2))
    union = w * (probs.sum(axis=(1, 2)) + target.sum(axis=(1, 2)))
    want = (1 - 2 * (inter.sum(1) + EPS) / (union.sum(1) + EPS)).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_loss(probs_and_target):
    probs, target, _ = probs_and_target
    idc = (1, 2)
    got = float(DiceLoss(idc=idc)(probs, target))

    pc, tc = probs[..., list(idc)], target[..., list(idc)]
    inter = (pc * tc).sum(axis=(1, 2))
    union = pc.sum(axis=(1, 2)) + tc.sum(axis=(1, 2))
    want = (1 - (2 * inter + EPS) / (union + EPS)).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss(probs_and_target):
    probs, target, _ = probs_and_target
    got = float(FocalLoss(idc=(0, 1, 2), gamma=2)(probs, target))

    w = (1 - probs) ** 2
    want = -(w * target * np.log(probs + EPS)).sum() / (target.sum() + EPS)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy(probs_and_target):
    probs, target, _ = probs_and_target
    got = float(CrossEntropy(idc=(0, 1, 2))(probs, target))
    want = -(target * np.log(probs + 1e-10)).sum() / (target.sum() + 1e-10)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_boundary_loss(probs_and_target):
    probs, target, _ = probs_and_target
    dist = np.stack([np.asarray(one_hot2dist(t)) for t in target])
    got = float(BoundaryLoss(idc=(1, 2))(probs, dist))
    want = (probs[..., 1:] * dist[..., 1:]).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_edt_matches_scipy(rng):
    for _ in range(5):
        mask = rng.random((16, 24)) > 0.85
        if not mask.any():
            mask[3, 5] = True
        want = ndi.distance_transform_edt(~mask)
        got = np.asarray(edt(mask))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_one_hot2dist_matches_scipy_convention(rng):
    labels = (rng.random((12, 12)) > 0.7).astype(np.int64)
    seg = np.eye(2, dtype=np.float32)[labels]  # (H, W, 2)
    got = np.asarray(one_hot2dist(seg))

    for k in range(2):
        posmask = seg[..., k].astype(bool)
        if posmask.any():
            negmask = ~posmask
            want = ndi.distance_transform_edt(negmask) * negmask - (
                ndi.distance_transform_edt(posmask) - 1
            ) * posmask
        else:
            want = np.zeros_like(seg[..., k])
        np.testing.assert_allclose(got[..., k], want, atol=1e-4)


def test_one_hot2dist_empty_class():
    seg = np.zeros((6, 6, 3), dtype=np.float32)
    seg[..., 0] = 1  # classes 1, 2 absent
    got = np.asarray(one_hot2dist(seg))
    assert np.all(got[..., 1] == 0)
    assert np.all(got[..., 2] == 0)
    assert np.all(got[..., 0] <= 0)  # all-inside signed distance


def test_gwdl_default_mode_perfect_prediction():
    dist_mat = np.array([[0.0, 1.0, 1.0], [1.0, 0.0, 0.5], [1.0, 0.5, 0.0]])
    loss_fn = GeneralizedWassersteinDiceLoss(dist_matrix=dist_mat)
    labels = np.array([[[0, 1], [2, 1]]])
    # near-one-hot logits for the true class
    logits = np.eye(3, dtype=np.float32)[labels] * 50.0
    got = float(loss_fn(logits, labels))
    assert got == pytest.approx(0.0, abs=1e-4)


def test_gwdl_against_numpy_oracle(probs_and_target):
    _, _, labels = probs_and_target
    r = np.random.default_rng(7)
    logits = r.normal(size=(B, H, W, K)).astype(np.float32)
    dist_mat = np.array([[0.0, 1.0, 1.0], [1.0, 0.0, 0.5], [1.0, 0.5, 0.0]])

    got = float(GeneralizedWassersteinDiceLoss(dist_matrix=dist_mat)(logits, labels))

    # independent numpy computation of eq. 9-10 of Fidon et al. 2017
    eps = np.spacing(1)
    fl = logits.reshape(B, -1, K)
    ft = labels.reshape(B, -1)
    e = np.exp(fl - fl.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    wmap = np.take_along_axis(
        dist_mat[ft] * probs, np.arange(K)[None, None, :], axis=-1
    ).sum(-1)
    alpha = np.ones((B, K))
    alpha[:, 0] = 0
    a_vox = np.take_along_axis(
        np.repeat(alpha[:, None, :], ft.shape[1], 1), ft[..., None], -1
    )[..., 0]
    tp = (a_vox * (1 - wmap)).sum(1)
    denom = 2 * tp + wmap.sum(1)
    want = (1 - (2 * tp + eps) / (denom + eps)).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fscore_ignore_background():
    # hand-built case: 5x5, pred argmax one-hot vs target one-hot
    t = np.zeros((1, 5, 5, 2), dtype=np.float32)
    t[..., 0] = 1
    t[:, 2:, 2:, 0] = 0
    t[:, 2:, 2:, 1] = 1
    p = np.zeros((1, 5, 5, 2), dtype=np.float32)
    p[..., 0] = 1
    p[:, 3:, 3:, 0] = 0
    p[:, 3:, 3:, 1] = 1

    # without background: tp=4, fp=0, fn=5 -> f1 = 8/13
    got = float(fscore(p, t, ignore_channels=[0]))
    np.testing.assert_allclose(got, 8 / 13, rtol=1e-5)

    # with background: tp=4+16=20, fp=5, fn=5... over both channels:
    # ch0: tp=16, pr=21, gt=16 ; ch1: tp=4, pr=4, gt=9
    # tp=20, fp=(25-20)=5, fn=(25-20)=5 -> f1=2*20/(2*20+5+5)=40/50
    got_bg = float(fscore(p, t))
    np.testing.assert_allclose(got_bg, 0.8, rtol=1e-5)


def test_edt_512_chunked_matches_scipy(rng):
    """The chunked row-envelope path (engaged at 512²) stays exact and keeps
    the live intermediate bounded (VERDICT r1: distmap eval at 512² OOM'd
    the dense formulation)."""
    mask = np.zeros((512, 512), bool)
    pts = rng.integers(0, 512, size=(40, 2))
    mask[pts[:, 0], pts[:, 1]] = True
    got = np.asarray(edt(mask))
    want = ndi.distance_transform_edt(~mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
