"""smp plain-Unet (resnet encoder) checkpoint conversion parity.

The reference's sweep grid trains unet/resnet configurations alongside
the flagship (sweep.yaml:16-27); convert_unet_checkpoint maps those
Lightning state dicts onto the flax SegmentationModel. The torch oracle
re-states smp's Unet layout (Conv2dReLU pairs in the decoder blocks,
modules.py:53-92 / unet decoder) around the torchvision-named resnet18
from tests/test_convert.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deadtrees_tpu.models import create_model, init_model  # noqa: E402
from deadtrees_tpu.models.convert import convert_unet_checkpoint  # noqa: E402
from tests.test_convert import _torch_resnet18  # noqa: E402

DEC_CH = (16, 16, 8, 8, 8)


def _torch_unet(in_ch=4, classes=3, dec_ch=DEC_CH):
    import torch.nn as nn
    import torch.nn.functional as F

    class Block(nn.Module):
        def __init__(self, cin, skip, cout):
            super().__init__()
            # Conv2dReLU = Sequential(conv, bn, relu): indices 0/1 carry
            # params, matching smp's decoder.blocks.{i}.conv{1,2}.{0,1}
            self.conv1 = nn.Sequential(
                nn.Conv2d(cin + skip, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            )
            self.conv2 = nn.Sequential(
                nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            )

        def forward(self, x, skip=None):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if skip is not None:
                x = torch.cat([x, skip], dim=1)
            return self.conv2(self.conv1(x))

    class Unet(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = _torch_resnet18(in_ch)
            enc = [512, 256, 128, 64, 64]  # deepest-first heads
            ins = [enc[0]] + list(dec_ch[:-1])
            skips = enc[1:] + [0]
            self.decoder = nn.Module()
            self.decoder.blocks = nn.ModuleList(
                [Block(i, s, o) for i, s, o in zip(ins, skips, dec_ch)]
            )
            self.segmentation_head = nn.Sequential(
                nn.Conv2d(dec_ch[-1], classes, 3, padding=1)
            )

        def forward(self, x):
            feats = self.encoder(x)
            feats = feats[1:][::-1]  # drop input, deepest first
            h, skips = feats[0], feats[1:]
            for i, block in enumerate(self.decoder.blocks):
                h = block(h, skips[i] if i < len(skips) else None)
            return self.segmentation_head(h)

    return Unet()


def test_convert_unet_logits_parity():
    torch.manual_seed(5)
    tmodel = _torch_unet().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    sd = {f"model.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_unet_checkpoint(sd, encoder_name="resnet18")

    model = create_model(
        "unet", "resnet18", in_channels=4, classes=3,
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

    x = np.random.default_rng(5).normal(size=(1, 64, 64, 4)).astype(np.float32)
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


def test_convert_unet_rejects_unknown_encoder():
    """Unknown families fail with a clear error; a known family with a
    missing/foreign state dict fails loudly on its first expected key."""
    with pytest.raises(ValueError, match="unknown encoder family"):
        convert_unet_checkpoint(
            {"decoder.blocks.0.conv1.0.weight": np.zeros((1,))},
            encoder_name="vgg16",
        )
    with pytest.raises(KeyError):
        convert_unet_checkpoint(
            {"decoder.blocks.0.conv1.0.weight": np.zeros((1,))},
            encoder_name="timm-efficientnet-b5",
        )


def _torch_resunet(in_ch=4, classes=3, dec_ch=DEC_CH):
    """Reference ResUnet re-statement (resunet/decoder.py:8-134,
    model.py:92): Unet-like blocks with an additive 1x1-projected identity
    path and a 1x1 segmentation head."""
    import torch.nn as nn
    import torch.nn.functional as F

    def conv_bn_relu(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
        )

    class Block(nn.Module):
        def __init__(self, cin, skip, cout):
            super().__init__()
            self.conv1 = conv_bn_relu(cin + skip, cout)
            self.conv2 = conv_bn_relu(cout, cout)
            self.identity_conv = nn.Conv2d(cin + skip, cout, 1)

        def forward(self, x, skip=None):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if skip is not None:
                x = torch.cat([x, skip], dim=1)
            identity = x
            x = self.conv2(self.conv1(x))
            return x + self.identity_conv(identity)

    class ResUnet(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = _torch_resnet18(in_ch)
            enc = [512, 256, 128, 64, 64]
            ins = [enc[0]] + list(dec_ch[:-1])
            skips = enc[1:] + [0]
            self.decoder = nn.Module()
            self.decoder.blocks = nn.ModuleList(
                [Block(i, s, o) for i, s, o in zip(ins, skips, dec_ch)]
            )
            self.segmentation_head = nn.Sequential(
                nn.Conv2d(dec_ch[-1], classes, 1)  # model.py:92 kernel 1
            )

        def forward(self, x):
            feats = self.encoder(x)[1:][::-1]
            h, skips = feats[0], feats[1:]
            for i, block in enumerate(self.decoder.blocks):
                h = block(h, skips[i] if i < len(skips) else None)
            return self.segmentation_head(h)

    return ResUnet()


def test_convert_resunet_logits_parity():
    from deadtrees_tpu.models.convert import convert_resunet_checkpoint

    torch.manual_seed(6)
    tmodel = _torch_resunet().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    sd = {f"model.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_resunet_checkpoint(sd, encoder_name="resnet18")

    model = create_model(
        "resunet", "resnet18", in_channels=4, classes=3,
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

    x = np.random.default_rng(6).normal(size=(1, 64, 64, 4)).astype(np.float32)
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


def _torch_unetpp(in_ch=4, classes=3, dec_ch=DEC_CH):
    """smp UnetPlusPlus re-statement: the efficientunet++ dense-grid
    topology (tests/test_convert_flagship.py) with Conv2dReLU cells."""
    import torch.nn as nn
    import torch.nn.functional as F

    def conv_bn_relu(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
        )

    class Block(nn.Module):
        def __init__(self, cin, skip, cout):
            super().__init__()
            self.conv1 = conv_bn_relu(cin + skip, cout)
            self.conv2 = conv_bn_relu(cout, cout)

        def forward(self, x, skip=None):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if skip is not None:
                x = torch.cat([x, skip], dim=1)
            return self.conv2(self.conv1(x))

    class Decoder(nn.Module):
        def __init__(self, encoder_channels, decoder_channels):
            super().__init__()
            ec = list(encoder_channels[1:])[::-1]
            head = ec[0]
            self.in_channels = [head] + list(decoder_channels[:-1])
            self.skip_channels = list(ec[1:]) + [0]
            self.out_channels = list(decoder_channels)
            self.depth = len(self.in_channels) - 1
            blocks = {}
            for li in range(len(self.in_channels) - 1):
                for di in range(li + 1):
                    if di == 0:
                        cin = self.in_channels[li]
                        skip = self.skip_channels[li] * (li + 1)
                        cout = self.out_channels[li]
                    else:
                        cout = self.skip_channels[li]
                        skip = self.skip_channels[li] * (li + 1 - di)
                        cin = self.skip_channels[li - 1]
                    blocks[f"x_{di}_{li}"] = Block(cin, skip, cout)
            blocks[f"x_0_{self.depth}"] = Block(
                self.in_channels[-1], 0, self.out_channels[-1]
            )
            self.blocks = nn.ModuleDict(blocks)

        def forward(self, *features):
            feats = list(features[1:])[::-1]
            dense = {}
            for li in range(len(self.in_channels) - 1):
                for di in range(self.depth - li):
                    if li == 0:
                        dense[(di, di)] = self.blocks[f"x_{di}_{di}"](
                            feats[di], feats[di + 1]
                        )
                    else:
                        l = di + li
                        cat = [dense[(i, l)] for i in range(di + 1, l + 1)]
                        cat = torch.cat(cat + [feats[l + 1]], dim=1)
                        dense[(di, l)] = self.blocks[f"x_{di}_{l}"](
                            dense[(di, l - 1)], cat
                        )
            return self.blocks[f"x_0_{self.depth}"](dense[(0, self.depth - 1)])

    class UnetPP(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = _torch_resnet18(in_ch)
            self.decoder = Decoder((in_ch, 64, 64, 128, 256, 512), dec_ch)
            self.segmentation_head = nn.Sequential(
                nn.Conv2d(dec_ch[-1], classes, 3, padding=1)
            )

        def forward(self, x):
            feats = self.encoder(x)
            return self.segmentation_head(self.decoder(*feats))

    return UnetPP()


def test_convert_unetpp_logits_parity():
    from deadtrees_tpu.models.convert import convert_unetpp_checkpoint

    torch.manual_seed(8)
    tmodel = _torch_unetpp().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    sd = {f"model.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_unetpp_checkpoint(sd, encoder_name="resnet18")

    model = create_model(
        "unet++", "resnet18", in_channels=4, classes=3,
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
