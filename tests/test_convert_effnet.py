"""EfficientNet torch→Flax conversion parity.

A timm-named EfficientNet-B0 feature extractor is re-stated in plain torch
(same state-dict scheme smp's timm-efficientnet encoders load), weights are
converted, and the Flax encoder must reproduce its feature pyramid — the
prerequisite for loading the reference's imagenet/Lightning checkpoints.
"""


import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deadtrees_tpu.models import get_encoder  # noqa: E402
from deadtrees_tpu.models.convert import convert_efficientnet_encoder  # noqa: E402
from deadtrees_tpu.models.encoders import (  # noqa: E402
    _EFFNET_BASE,
    _round_channels,
    _round_repeats,
)


def _torch_effnet(in_ch=4, width_mult=1.0, depth_mult=1.0,
                  pad_type="static"):
    """Plain-torch EfficientNet feature extractor at any width/depth —
    the state-dict key scheme smp's timm-efficientnet encoders load.
    b5 geometry (width 1.6 / depth 2.2) exercises the ≥10-numbered-siblings
    key-ordering regime (39 MBConv blocks). ``pad_type="same"`` swaps the
    stride-2 convs for timm's Conv2dSame (dynamic TF-SAME padding) — the
    other branch of docs/encoder_audit.md row 15."""
    import torch.nn as nn
    import torch.nn.functional as F

    class Conv2dSame(nn.Conv2d):
        """timm Conv2dSame: dynamic asymmetric pad, then VALID conv."""

        def forward(self, x):
            ih, iw = x.shape[-2:]
            kh, kw = self.weight.shape[-2:]
            sh, sw = self.stride
            ph = max((-(-ih // sh) - 1) * sh
                     + (kh - 1) * self.dilation[0] + 1 - ih, 0)
            pw = max((-(-iw // sw) - 1) * sw
                     + (kw - 1) * self.dilation[1] + 1 - iw, 0)
            x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
            return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                            self.dilation, self.groups)

    def s2_conv(cin, cout, k, s, groups=1):
        """Stride-s conv in the selected padding convention."""
        if s > 1 and pad_type == "same":
            return Conv2dSame(cin, cout, k, s, 0, groups=groups, bias=False)
        return nn.Conv2d(cin, cout, k, s, k // 2, groups=groups, bias=False)

    class SE(nn.Module):
        def __init__(self, mid, se_ch):
            super().__init__()
            self.conv_reduce = nn.Conv2d(mid, se_ch, 1)
            self.conv_expand = nn.Conv2d(se_ch, mid, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = torch.nn.functional.silu(self.conv_reduce(s))
            return x * torch.sigmoid(self.conv_expand(s))

    class DsBlock(nn.Module):  # stage-1 depthwise-separable (t=1)
        def __init__(self, cin, cout, k, s):
            super().__init__()
            self.conv_dw = s2_conv(cin, cin, k, s, groups=cin)
            self.bn1 = nn.BatchNorm2d(cin, eps=1e-3)
            self.se = SE(cin, max(1, int(cin * 0.25)))
            self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout, eps=1e-3)
            self.res = cin == cout and s == 1

        def forward(self, x):
            h = torch.nn.functional.silu(self.bn1(self.conv_dw(x)))
            h = self.se(h)
            h = self.bn2(self.conv_pw(h))
            return x + h if self.res else h

    class MbBlock(nn.Module):  # inverted residual (t>1)
        def __init__(self, cin, cout, t, k, s):
            super().__init__()
            mid = cin * t
            self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
            self.conv_dw = s2_conv(mid, mid, k, s, groups=mid)
            self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
            self.se = SE(mid, max(1, int(cin * 0.25)))
            self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout, eps=1e-3)
            self.res = cin == cout and s == 1

        def forward(self, x):
            h = torch.nn.functional.silu(self.bn1(self.conv_pw(x)))
            h = torch.nn.functional.silu(self.bn2(self.conv_dw(h)))
            h = self.se(h)
            h = self.bn3(self.conv_pwl(h))
            return x + h if self.res else h

    class EffNet(nn.Module):
        def __init__(self):
            super().__init__()
            stem = _round_channels(32, width_mult)
            self.conv_stem = s2_conv(in_ch, stem, 3, 2)
            self.bn1 = nn.BatchNorm2d(stem, eps=1e-3)
            blocks = []
            cin = stem
            for t, c, n, s, k in _EFFNET_BASE:
                cout = _round_channels(c, width_mult)
                stage = []
                for b in range(_round_repeats(n, depth_mult)):
                    stride = s if b == 0 else 1
                    if t == 1:
                        stage.append(DsBlock(cin, cout, k, stride))
                    else:
                        stage.append(MbBlock(cin, cout, t, k, stride))
                    cin = cout
                blocks.append(nn.Sequential(*stage))
            self.blocks = nn.ModuleList(blocks)

        def forward(self, x):
            feats = [x]
            x = torch.nn.functional.silu(self.bn1(self.conv_stem(x)))
            feats.append(x)
            for i, stage in enumerate(self.blocks, start=1):
                x = stage(x)
                if i in (2, 3, 5, 7):
                    feats.append(x)
            return feats

    return EffNet()


def _torch_effnet_b0(in_ch=4):
    return _torch_effnet(in_ch=in_ch)


def test_efficientnet_b0_forward_parity():
    torch.manual_seed(0)
    tmodel = _torch_effnet_b0(in_ch=4).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_efficientnet_encoder(sd, 1.0, 1.0)

    enc, out_channels = get_encoder("timm-efficientnet-b0", in_channels=4)
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 4)).astype(np.float32)

    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    jfeats = enc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), train=False,
    )

    assert len(tfeats) == len(jfeats) == 6
    for i, (tf_, jf) in enumerate(zip(tfeats, jfeats)):
        t_nhwc = tf_.numpy().transpose(0, 2, 3, 1)
        assert jf.shape == t_nhwc.shape, f"level {i}: {jf.shape} vs {t_nhwc.shape}"
        err = np.abs(np.asarray(jf) - t_nhwc).max()
        assert err < 2e-3, f"level {i} max err {err}"
