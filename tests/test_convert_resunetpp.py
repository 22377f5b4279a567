"""ResUnet++ checkpoint conversion parity (VERDICT r4 item 2).

The fifth and last sweep-grid architecture
(/root/reference/sweep.yaml architecture values includes "resunet++").
The torch oracle re-states the reference's vendored decoder exactly —
ASPP bridge (conv→ReLU→BN branches at rates 6/12/18 + plain 3×3, 1×1
merge; resunetplusplus/decoder.py:8-78), the pre-upsample attention gate
(BN→ReLU→conv stacks + global-average channel gate, decoder.py:81-117),
PreActivatedConv2dReLU pairs (actually conv-bn-relu ordered,
modules.py:50), per-block 1×1 additive identity, doubled internal widths
with a final ASPP halving back, 1×1 head (model.py:62-104) — around the
torchvision-named resnet18 from tests/test_convert.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deadtrees_tpu.models import create_model, init_model  # noqa: E402
from deadtrees_tpu.models.convert import (  # noqa: E402
    convert_resunetpp_checkpoint,
)
from tests.test_convert import _torch_resnet18  # noqa: E402

DEC_CH = (16, 16, 8, 8, 8)


def _torch_aspp(cin, cout, rates=(6, 12, 18)):
    import torch.nn as nn

    class ASPP(nn.Module):
        def __init__(self):
            super().__init__()
            for i, r in enumerate(rates, start=1):
                setattr(self, f"aspp_block{i}", nn.Sequential(
                    nn.Conv2d(cin, cout, 3, padding=r, dilation=r),
                    nn.ReLU(inplace=True),
                    nn.BatchNorm2d(cout),
                ))
            self.aspp_block4 = nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=1),
                nn.ReLU(inplace=True),
                nn.BatchNorm2d(cout),
            )
            self.output = nn.Conv2d(4 * cout, cout, 1)

        def forward(self, x):
            outs = [self.aspp_block1(x), self.aspp_block2(x),
                    self.aspp_block3(x), self.aspp_block4(x)]
            return self.output(torch.cat(outs, dim=1))

    return ASPP()


def _torch_rupp_attention(skip_ch, in_ch, out_ch):
    import torch.nn as nn

    class AttentionBlock(nn.Module):
        def __init__(self):
            super().__init__()
            if skip_ch != 0:
                self.encoder_conv = nn.Sequential(
                    nn.BatchNorm2d(skip_ch), nn.ReLU(),
                    nn.Conv2d(skip_ch, out_ch, 3, padding=1),
                    nn.MaxPool2d(2, 2),
                )
            self.decoder_conv = nn.Sequential(
                nn.BatchNorm2d(in_ch), nn.ReLU(),
                nn.Conv2d(in_ch, out_ch, 3, padding=1),
            )
            self.attn_conv = nn.Sequential(
                nn.BatchNorm2d(out_ch), nn.ReLU(),
                nn.Conv2d(out_ch, in_ch, 1),
                nn.AdaptiveAvgPool2d(1),
            )

        def forward(self, x, skip=None):
            if skip is not None:
                out = self.encoder_conv(skip) + self.decoder_conv(x)
            else:
                out = self.decoder_conv(x)
            return self.attn_conv(out) * x

    return AttentionBlock()


def _torch_resunetpp(in_ch=4, classes=3, dec_ch=DEC_CH):
    import torch.nn as nn
    import torch.nn.functional as F

    def pre_act_conv(cin, cout):  # modules.py:50 — conv-bn-relu ordered
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
        )

    class Block(nn.Module):
        def __init__(self, cin, skip, cout):
            super().__init__()
            self.attention0 = _torch_rupp_attention(skip, cin, cin)
            self.conv1 = pre_act_conv(cin + skip, cout)
            self.conv2 = pre_act_conv(cout, cout)
            self.identity_conv = nn.Conv2d(cin + skip, cout, 1)

        def forward(self, x, skip=None):
            x = self.attention0(x, skip)
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if skip is not None:
                x = torch.cat([x, skip], dim=1)
            identity = x
            x = self.conv2(self.conv1(x))
            return x + self.identity_conv(identity)

    class ResUnetPP(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = _torch_resnet18(in_ch)
            enc = [512, 256, 128, 64, 64]  # deepest-first
            ins = [2 * enc[0]] + [2 * d for d in dec_ch[:-1]]
            skips = enc[1:] + [0]
            outs = [2 * d for d in dec_ch]
            self.decoder = nn.Module()
            self.decoder.center = _torch_aspp(enc[0], ins[0])
            self.decoder.blocks = nn.ModuleList(
                [Block(i, s, o) for i, s, o in zip(ins, skips, outs)]
            )
            self.decoder.final_aspp = _torch_aspp(outs[-1], outs[-1] // 2)
            self.segmentation_head = nn.Sequential(
                nn.Conv2d(dec_ch[-1], classes, 1)  # model.py:94 kernel 1
            )

        def forward(self, x):
            feats = self.encoder(x)[1:][::-1]
            h, skips = feats[0], feats[1:]
            h = self.decoder.center(h)
            for i, block in enumerate(self.decoder.blocks):
                h = block(h, skips[i] if i < len(skips) else None)
            h = self.decoder.final_aspp(h)
            return self.segmentation_head(h)

    return ResUnetPP()


def test_convert_resunetpp_logits_parity():
    torch.manual_seed(8)
    tmodel = _torch_resunetpp().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    sd = {f"model.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_resunetpp_checkpoint(sd, encoder_name="resnet18")

    model = create_model(
        "resunet++", "resnet18", in_channels=4, classes=3,
        decoder_channels=DEC_CH, dtype=jnp.float32,
    )
    ref = init_model(model, jax.random.PRNGKey(0), image_size=64)
    ref_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(ref["params"])
    }
    got_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    assert ref_paths == got_paths, (
        f"missing={sorted(ref_paths - got_paths)[:5]} "
        f"extra={sorted(got_paths - ref_paths)[:5]}"
    )

    x = np.random.default_rng(8).normal(size=(1, 64, 64, 4)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_logits = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    j_nchw = np.asarray(j_logits).transpose(0, 3, 1, 2)
    assert j_nchw.shape == t_logits.shape
    err = np.abs(j_nchw - t_logits).max()
    assert err < 2e-3, f"logits max err {err}"
    np.testing.assert_array_equal(j_nchw.argmax(1), t_logits.argmax(1))
