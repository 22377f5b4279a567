"""Weight-conversion tests: forward parity between a torch ResNet encoder
and the Flax encoder loaded with converted weights.

The reference's checkpoints are torch/Lightning (inference.py:30-42); dice
parity requires converted weights to reproduce activations. torchvision is
not installed, so the canonical torchvision resnet18 layer scheme is
re-stated here in plain torch (same state-dict names smp relies on).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deadtrees_tpu.models import get_encoder  # noqa: E402
from deadtrees_tpu.models.convert import (  # noqa: E402
    convert_resnet_encoder,
    t2j_conv,
)


def _torch_resnet18(in_ch=3):
    """torchvision-named resnet18 feature extractor (basic blocks only)."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idn = x
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                idn = self.downsample(x)
            return torch.relu(out + idn)

    class ResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = nn.Sequential(
                BasicBlock(64, 128, 2), BasicBlock(128, 128)
            )
            self.layer3 = nn.Sequential(
                BasicBlock(128, 256, 2), BasicBlock(256, 256)
            )
            self.layer4 = nn.Sequential(
                BasicBlock(256, 512, 2), BasicBlock(512, 512)
            )

        def forward(self, x):
            feats = [x]
            x = torch.relu(self.bn1(self.conv1(x)))
            feats.append(x)
            x = self.maxpool(x)
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
                feats.append(x)
            return feats

    return ResNet18()


def test_conv_kernel_conversion_rule():
    w = torch.randn(8, 3, 3, 3)
    x = torch.randn(1, 3, 16, 16)
    ref = torch.nn.functional.conv2d(x, w, padding=1)

    k = jnp.asarray(t2j_conv(w.numpy()))
    xx = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = jax.lax.conv_general_dilated(
        xx, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert np.allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )


def test_resnet18_forward_parity():
    torch.manual_seed(0)
    tmodel = _torch_resnet18(in_ch=4).eval()
    # randomize BN stats so the test can't pass with default (0, 1) stats
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_resnet_encoder(sd, stage_sizes=(2, 2, 2, 2))

    enc, _ = get_encoder("resnet18", in_channels=4)
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 4)).astype(np.float32)

    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    jfeats = enc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x),
        train=False,
    )

    assert len(tfeats) == len(jfeats) == 6
    for i, (tf_, jf) in enumerate(zip(tfeats, jfeats)):
        t_nhwc = tf_.numpy().transpose(0, 2, 3, 1)
        assert np.allclose(
            np.asarray(jf), t_nhwc, atol=1e-3
        ), f"level {i} max err {np.abs(np.asarray(jf) - t_nhwc).max()}"


def test_flatten_with_path_natural_order():
    """>=10 auto-numbered siblings must flatten in numeric order — string
    sort puts Block_10 before Block_2 and silently scrambles weights."""
    from deadtrees_tpu.models.convert import _flatten_with_path

    tree = {f"Block_{i}": {"kernel": np.zeros((i + 1,))} for i in range(12)}
    paths = [p[0] for p, _ in _flatten_with_path(tree)]
    assert paths == [f"Block_{i}" for i in range(12)]


def test_convert_by_order_many_numbered_siblings():
    """convert_by_order must assign same-shaped torch tensors to flax blocks
    in definition order even past 10 siblings."""
    from deadtrees_tpu.models.convert import convert_by_order

    n = 12
    flax_params = {
        f"Conv_{i}": {"kernel": np.zeros((3, 3, 4, 4), np.float32)}
        for i in range(n)
    }
    # torch tensors in forward order, each uniquely valued
    torch_tensors = [
        (f"layer{i}.weight", np.full((4, 4, 3, 3), float(i), np.float32))
        for i in range(n)
    ]
    out = convert_by_order(torch_tensors, flax_params)
    for i in range(n):
        assert float(out[f"Conv_{i}"]["kernel"][0, 0, 0, 0]) == float(i), i


def test_load_torch_state_dict_rejects_code_pickles(tmp_path):
    import torch

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    p = tmp_path / "evil.ckpt"
    torch.save({"state_dict": {"x": Evil()}}, p)
    from deadtrees_tpu.models.convert import load_torch_state_dict

    with pytest.raises(ValueError, match="Refusing to unpickle"):
        load_torch_state_dict(p)


def test_load_torch_state_dict_plain_tensors(tmp_path):
    import torch

    p = tmp_path / "plain.ckpt"
    torch.save({"state_dict": {"w": torch.ones(2, 3)}}, p)
    from deadtrees_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(p)
    assert sd["w"].shape == (2, 3)


def _torch_resnet50(in_ch=3):
    """torchvision-named resnet50 feature extractor (bottleneck blocks);
    the commented-out rung of the reference sweep grid (sweep.yaml:27)."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride=1):
            super().__init__()
            cout = width * 4
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idn = x
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idn = self.downsample(x)
            return torch.relu(out + idn)

    def stage(cin, width, blocks, stride):
        mods = [Bottleneck(cin, width, stride)]
        mods += [Bottleneck(width * 4, width) for _ in range(blocks - 1)]
        return nn.Sequential(*mods)

    class ResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = stage(64, 64, 3, 1)
            self.layer2 = stage(256, 128, 4, 2)
            self.layer3 = stage(512, 256, 6, 2)
            self.layer4 = stage(1024, 512, 3, 2)

        def forward(self, x):
            feats = [x]
            x = torch.relu(self.bn1(self.conv1(x)))
            feats.append(x)
            x = self.maxpool(x)
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
                feats.append(x)
            return feats

    return ResNet50()


def test_resnet50_forward_parity():
    torch.manual_seed(0)
    tmodel = _torch_resnet50(in_ch=4).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_resnet_encoder(
        sd, stage_sizes=(3, 4, 6, 3), block="bottleneck"
    )

    enc, out_channels = get_encoder("resnet50", in_channels=4)
    assert out_channels == (4, 64, 256, 512, 1024, 2048)
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 4)).astype(np.float32)

    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    jfeats = enc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x),
        train=False,
    )

    assert len(tfeats) == len(jfeats) == 6
    for i, (tf_, jf) in enumerate(zip(tfeats, jfeats)):
        t_nhwc = tf_.numpy().transpose(0, 2, 3, 1)
        assert np.allclose(
            np.asarray(jf), t_nhwc, atol=1e-3
        ), f"level {i} max err {np.abs(np.asarray(jf) - t_nhwc).max()}"
