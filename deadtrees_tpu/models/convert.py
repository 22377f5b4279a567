"""PyTorch → Flax weight conversion.

The reference ships Lightning checkpoints and imagenet-pretrained encoders
(/root/reference/checkpoints/bestmodel.ckpt.dvc, segmodel.py:85-90 via smp
``get_encoder(weights="imagenet")``). To load those into this framework —
for inference parity and pretrained initialization — torch tensors must map
onto the Flax NHWC module tree:

- conv kernels: torch OIHW → flax HWIO (transpose 2,3,1,0); depthwise convs
  torch (C,1,kH,kW) → flax (kH,kW,1,C);
- batchnorm: weight→scale, bias→bias (params); running_mean→mean,
  running_var→var (batch_stats);
- linear: (O,I) → (I,O).

``convert_resnet_encoder`` maps the torchvision/smp resnet18/34 naming
scheme onto :class:`deadtrees_tpu.models.encoders.ResNetEncoder`'s tree
(verified by forward-parity tests against a torch reimplementation,
tests/test_convert.py). EfficientNet and decoder mappings follow the same
rules via :func:`convert_by_order` — a traversal-order matcher usable when
the torch module defines layers in forward order (true for smp decoders).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)


def t2j_conv(w) -> np.ndarray:
    """torch conv weight (O, I, kH, kW) → flax (kH, kW, I, O)."""
    w = np.asarray(w)
    return np.transpose(w, (2, 3, 1, 0))


def t2j_depthwise_conv(w) -> np.ndarray:
    """torch depthwise weight (C, 1, kH, kW) → flax (kH, kW, 1, C) with
    feature_group_count=C."""
    w = np.asarray(w)
    return np.transpose(w, (2, 3, 1, 0))


def t2j_linear(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def convert_bn(prefix: str, sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """(params {scale, bias}, batch_stats {mean, var}) from a torch BN."""
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_resnet_encoder(
    sd: Dict[str, Any],
    stage_sizes: Sequence[int] = (2, 2, 2, 2),
    block: str = "basic",
) -> Tuple[Dict, Dict]:
    """torchvision/smp resnet state dict → (params, batch_stats) for
    :class:`ResNetEncoder`.

    ``block="basic"`` covers resnet18/34 (conv1/conv2), ``"bottleneck"``
    resnet50+ (conv1/conv2/conv3). Accepts keys with or without an
    ``encoder.`` prefix (Lightning checkpoints nest under
    ``model.encoder.``, torchvision is bare).
    """
    # normalize prefix
    keys = list(sd.keys())
    for p in ("model.encoder.", "encoder.", ""):
        if any(k.startswith(p + "conv1.weight") for k in keys):
            sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
            break

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["Conv_0"] = {"kernel": t2j_conv(sd["conv1.weight"])}
    params["BatchNorm_0"], stats["BatchNorm_0"] = convert_bn("bn1", sd)

    n_convs = 2 if block == "basic" else 3
    flax_block = "BasicBlock" if block == "basic" else "Bottleneck"
    block_idx = 0
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            tp = f"layer{stage}.{b}"
            name = f"{flax_block}_{block_idx}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = {
                    "kernel": t2j_conv(sd[f"{tp}.conv{c + 1}.weight"])
                }
                bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"] = convert_bn(
                    f"{tp}.bn{c + 1}", sd
                )
            if f"{tp}.downsample.0.weight" in sd:
                bp[f"Conv_{n_convs}"] = {
                    "kernel": t2j_conv(sd[f"{tp}.downsample.0.weight"])
                }
                (
                    bp[f"BatchNorm_{n_convs}"],
                    bs[f"BatchNorm_{n_convs}"],
                ) = convert_bn(f"{tp}.downsample.1", sd)
            params[name] = bp
            stats[name] = bs
            block_idx += 1

    return params, stats


def convert_efficientnet_encoder(
    sd: Dict[str, Any], width_mult: float, depth_mult: float
) -> Tuple[Dict, Dict]:
    """timm-style EfficientNet state dict → (params, batch_stats) for
    :class:`EfficientNetEncoder`.

    Expected key scheme (timm ``efficientnet_bN`` as used by smp's
    timm-efficientnet encoders): ``conv_stem.weight``, ``bn1.*``, and
    ``blocks.{stage}.{block}.`` with ``conv_pw/bn1, conv_dw/bn2,
    se.conv_reduce/conv_expand, conv_pwl/bn3`` (expansion blocks) or
    ``conv_dw/bn1, se.*, conv_pw/bn2`` (the stride-1 expand-ratio-1
    stage-1 blocks). Accepts optional ``model.encoder.``/``encoder.``
    prefixes from Lightning checkpoints.
    """
    from deadtrees_tpu.models.encoders import (
        _EFFNET_BASE,
        _round_channels,
        _round_repeats,
    )

    keys = list(sd.keys())
    for p in ("model.encoder.", "encoder.", ""):
        if any(k.startswith(p + "conv_stem.weight") for k in keys):
            sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
            break

    params: Dict[str, Any] = {
        "Conv_0": {"kernel": t2j_conv(sd["conv_stem.weight"])}
    }
    stats: Dict[str, Any] = {}
    params["BatchNorm_0"], stats["BatchNorm_0"] = convert_bn("bn1", sd)

    mb_idx = 0
    for stage_idx, (t, c, n, s, k) in enumerate(_EFFNET_BASE):
        repeats = _round_repeats(n, depth_mult)
        for b in range(repeats):
            tp = f"blocks.{stage_idx}.{b}"
            name = f"MBConv_{mb_idx}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            conv_i = 0
            bn_i = 0
            if t != 1:  # expansion pointwise
                bp[f"Conv_{conv_i}"] = {"kernel": t2j_conv(sd[f"{tp}.conv_pw.weight"])}
                conv_i += 1
                bp[f"BatchNorm_{bn_i}"], bs[f"BatchNorm_{bn_i}"] = convert_bn(
                    f"{tp}.bn1", sd
                )
                bn_i += 1
                dw_key, dw_bn = f"{tp}.conv_dw", f"{tp}.bn2"
                pw_key, pw_bn = f"{tp}.conv_pwl", f"{tp}.bn3"
            else:  # DepthwiseSeparable block (stage 1)
                dw_key, dw_bn = f"{tp}.conv_dw", f"{tp}.bn1"
                pw_key, pw_bn = f"{tp}.conv_pw", f"{tp}.bn2"

            bp[f"Conv_{conv_i}"] = {
                "kernel": t2j_depthwise_conv(sd[f"{dw_key}.weight"])
            }
            conv_i += 1
            bp[f"BatchNorm_{bn_i}"], bs[f"BatchNorm_{bn_i}"] = convert_bn(dw_bn, sd)
            bn_i += 1

            # SE: conv_reduce / conv_expand (1x1 convs with bias)
            bp[f"Conv_{conv_i}"] = {
                "kernel": t2j_conv(sd[f"{tp}.se.conv_reduce.weight"]),
                "bias": np.asarray(sd[f"{tp}.se.conv_reduce.bias"]),
            }
            conv_i += 1
            bp[f"Conv_{conv_i}"] = {
                "kernel": t2j_conv(sd[f"{tp}.se.conv_expand.weight"]),
                "bias": np.asarray(sd[f"{tp}.se.conv_expand.bias"]),
            }
            conv_i += 1

            bp[f"Conv_{conv_i}"] = {"kernel": t2j_conv(sd[f"{pw_key}.weight"])}
            bp[f"BatchNorm_{bn_i}"], bs[f"BatchNorm_{bn_i}"] = convert_bn(pw_bn, sd)

            params[name] = bp
            stats[name] = bs
            mb_idx += 1

    return params, stats


def _convert_conv(prefix: str, sd: Dict[str, Any], depthwise: bool = False) -> Dict:
    """One torch conv (with optional bias) → flax Conv param dict."""
    conv = t2j_depthwise_conv if depthwise else t2j_conv
    out = {"kernel": conv(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_inverted_residual(prefix: str, sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """One reference InvertedResidual (efficientunetplusplus/decoder.py:9-60)
    → flax :class:`deadtrees_tpu.models.blocks.InvertedResidual` variables.

    Torch layout: ``block.0`` expand pw, ``block.1`` BN, ``block.3`` dw,
    ``block.4`` BN, ``block.6`` SCSE (cSE.1/cSE.3/sSE.0 convs), ``block.7``
    project pw, ``block.8`` BN, plus ``skip_conv.0/.1`` when shapes differ.
    """
    params: Dict[str, Any] = {
        "Conv_0": _convert_conv(f"{prefix}.block.0", sd),
        "Conv_1": _convert_conv(f"{prefix}.block.3", sd, depthwise=True),
        "SCSEModule_0": {
            "SEModule_0": {
                "Conv_0": _convert_conv(f"{prefix}.block.6.cSE.1", sd),
                "Conv_1": _convert_conv(f"{prefix}.block.6.cSE.3", sd),
            },
            "SSEModule_0": {
                "Conv_0": _convert_conv(f"{prefix}.block.6.sSE.0", sd),
            },
        },
        "Conv_2": _convert_conv(f"{prefix}.block.7", sd),
    }
    stats: Dict[str, Any] = {}
    for flax_bn, torch_bn in (
        ("BatchNorm_0", "block.1"),
        ("BatchNorm_1", "block.4"),
        ("BatchNorm_2", "block.8"),
    ):
        params[flax_bn], stats[flax_bn] = convert_bn(f"{prefix}.{torch_bn}", sd)
    if f"{prefix}.skip_conv.0.weight" in sd:
        params["Conv_3"] = _convert_conv(f"{prefix}.skip_conv.0", sd)
        params["BatchNorm_3"], stats["BatchNorm_3"] = convert_bn(
            f"{prefix}.skip_conv.1", sd
        )
    return params, stats


def convert_effunetpp_decoder(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Reference EfficientUnet++ decoder state dict → flax decoder variables.

    Maps every dense-grid cell ``decoder.blocks.x_{d}_{l}.conv{1,2}``
    (efficientunetplusplus/decoder.py:134-184) onto
    ``decoder/_DenseGridDecoder_0/x_{d}_{l}/InvertedResidual_{0,1}`` by
    explicit key construction — no order matching, so a missing/misshaped
    tensor fails loudly instead of scrambling."""
    cells = sorted(
        {
            k.split(".")[2]
            for k in sd
            if k.startswith("decoder.blocks.")
        }
    )
    if not cells:
        raise ValueError("no decoder.blocks.* keys in state dict")
    grid_p: Dict[str, Any] = {}
    grid_s: Dict[str, Any] = {}
    for cell in cells:
        cp: Dict[str, Any] = {}
        cs: Dict[str, Any] = {}
        for i, conv in enumerate(("conv1", "conv2")):
            p, s = convert_inverted_residual(f"decoder.blocks.{cell}.{conv}", sd)
            cp[f"InvertedResidual_{i}"] = p
            cs[f"InvertedResidual_{i}"] = s
        grid_p[cell] = cp
        grid_s[cell] = cs
    return (
        {"_DenseGridDecoder_0": grid_p},
        {"_DenseGridDecoder_0": grid_s},
    )


def convert_effunetpp_checkpoint(
    sd: Dict[str, Any], *, width_mult: float = None, depth_mult: float = None,
    encoder_name: str = None,
) -> Dict[str, Dict]:
    """Full flagship (EfficientUnet++ decoder) Lightning state dict →
    ``{"params", "batch_stats"}`` for
    :class:`deadtrees_tpu.models.factory.SegmentationModel`.

    Accepts the reference checkpoint's ``model.`` prefix
    (segmodel.py ``self.model``) or bare smp naming. Pass
    ``width_mult``/``depth_mult`` for a timm-efficientnet encoder, or
    ``encoder_name`` to route either family (the reference sweep crosses
    efficientunet++ with resnet34 too, sweep.yaml encoder values).
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    if width_mult is not None and depth_mult is not None:
        enc_p, enc_s = convert_efficientnet_encoder(sd, width_mult, depth_mult)
    elif encoder_name is not None:
        enc_p, enc_s = _convert_encoder_for(encoder_name, sd)
    else:
        raise ValueError(
            "pass width_mult/depth_mult (efficientnet) or encoder_name"
        )
    dec_p, dec_s = convert_effunetpp_decoder(sd)
    head = _convert_conv("segmentation_head.0", sd)
    return {
        "params": {
            "encoder": enc_p,
            "decoder": dec_p,
            "segmentation_head": {"Conv_0": head},
        },
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }


_RESNET_GEOMETRY = {
    "resnet18": ((2, 2, 2, 2), "basic"),
    "resnet34": ((3, 4, 6, 3), "basic"),
    "resnet50": ((3, 4, 6, 3), "bottleneck"),
}


def _convert_encoder_for(encoder_name: str, sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Route the encoder half of a checkpoint by family (the reference
    sweep grid crosses every architecture with both encoder families,
    sweep.yaml:16-33)."""
    key = encoder_name.lower().replace("timm-", "")
    if key in _RESNET_GEOMETRY:
        stage_sizes, block = _RESNET_GEOMETRY[key]
        return convert_resnet_encoder(sd, stage_sizes=stage_sizes, block=block)
    from deadtrees_tpu.models.encoders import _EFFNET_PARAMS

    if key in _EFFNET_PARAMS:
        w, d = _EFFNET_PARAMS[key]
        return convert_efficientnet_encoder(sd, w, d)
    raise ValueError(
        f"unknown encoder family for conversion: {encoder_name!r} "
        f"(resnet18/34/50 or efficientnet-b0..b7)"
    )


def convert_unet_checkpoint(
    sd: Dict[str, Any], *, encoder_name: str = "resnet18"
) -> Dict[str, Dict]:
    """smp plain-Unet (resnet encoder) Lightning state dict →
    ``{"params", "batch_stats"}`` for
    :class:`deadtrees_tpu.models.factory.SegmentationModel`.

    Covers the reference sweep grid's unet/resnet rows (sweep.yaml:16-27).
    smp decoder key scheme: ``decoder.blocks.{i}.conv{1,2}.0`` conv /
    ``.1`` BN (Conv2dReLU, modules.py:53-92), ``segmentation_head.0``;
    attention modules are parameterless identities when
    ``decoder_attention_type=None`` (the reference default). Explicit key
    construction — a missing/misshaped tensor fails loudly.
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_p, enc_s = _convert_encoder_for(encoder_name, sd)

    n_blocks = len({
        k.split(".")[2] for k in sd if k.startswith("decoder.blocks.")
    })
    if n_blocks == 0:
        raise ValueError("no decoder.blocks.* keys in state dict")
    dec_p: Dict[str, Any] = {}
    dec_s: Dict[str, Any] = {}
    for i in range(n_blocks):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for j, conv in enumerate(("conv1", "conv2")):
            prefix = f"decoder.blocks.{i}.{conv}"
            cba_p: Dict[str, Any] = {"Conv_0": _convert_conv(f"{prefix}.0", sd)}
            cba_s: Dict[str, Any] = {}
            if f"{prefix}.1.running_mean" in sd:  # use_batchnorm=True path
                cba_p["BatchNorm_0"], cba_s["BatchNorm_0"] = convert_bn(
                    f"{prefix}.1", sd
                )
            bp[f"ConvBnAct_{j}"] = cba_p
            bs[f"ConvBnAct_{j}"] = cba_s
        dec_p[f"block_{i}"] = bp
        dec_s[f"block_{i}"] = bs

    head = _convert_conv("segmentation_head.0", sd)
    return {
        "params": {
            "encoder": enc_p,
            "decoder": dec_p,
            "segmentation_head": {"Conv_0": head},
        },
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }


def convert_resunet_checkpoint(
    sd: Dict[str, Any], *, encoder_name: str = "resnet18"
) -> Dict[str, Dict]:
    """Reference ResUnet (resunet/decoder.py:8-134) Lightning state dict →
    flax SegmentationModel variables.

    Same ``conv{1,2}.0``-conv/``.1``-BN pair scheme as the Unet — despite
    its docstring the reference's PreActivatedConv2dReLU is ALSO
    ``Sequential(conv, bn, relu)`` (modules.py ``super().__init__(conv,
    bn, relu)``) — plus a per-block 1×1 ``identity_conv`` (with bias) for
    the additive skip path, and a 1×1 segmentation head
    (resunet/model.py:92).
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_p, enc_s = _convert_encoder_for(encoder_name, sd)

    n_blocks = len({
        k.split(".")[2] for k in sd if k.startswith("decoder.blocks.")
    })
    if n_blocks == 0:
        raise ValueError("no decoder.blocks.* keys in state dict")
    dec_p: Dict[str, Any] = {}
    dec_s: Dict[str, Any] = {}
    for i in range(n_blocks):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for j, conv in enumerate(("conv1", "conv2")):
            prefix = f"decoder.blocks.{i}.{conv}"
            cba_p: Dict[str, Any] = {"Conv_0": _convert_conv(f"{prefix}.0", sd)}
            cba_s: Dict[str, Any] = {}
            if f"{prefix}.1.running_mean" in sd:
                cba_p["BatchNorm_0"], cba_s["BatchNorm_0"] = convert_bn(
                    f"{prefix}.1", sd
                )
            bp[f"ConvBnAct_{j}"] = cba_p
            bs[f"ConvBnAct_{j}"] = cba_s
        # flax ResUnetDecoderBlock: the identity 1x1 is the block's only
        # bare nn.Conv -> auto-named Conv_0
        bp["Conv_0"] = _convert_conv(f"decoder.blocks.{i}.identity_conv", sd)
        dec_p[f"block_{i}"] = bp
        dec_s[f"block_{i}"] = bs

    head = _convert_conv("segmentation_head.0", sd)
    return {
        "params": {
            "encoder": enc_p,
            "decoder": dec_p,
            "segmentation_head": {"Conv_0": head},
        },
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }


def convert_unetpp_checkpoint(
    sd: Dict[str, Any], *, encoder_name: str = "resnet18"
) -> Dict[str, Dict]:
    """smp UnetPlusPlus (resnet encoder) Lightning state dict → flax
    SegmentationModel variables.

    The dense grid shares the cell naming of the vendored efficientunet++
    decoder (``decoder.blocks.x_{d}_{l}`` — the vendored code IS smp's
    unetplusplus decoder with different blocks), but each cell is a pair
    of Conv2dReLU stacks instead of inverted residuals. Maps onto
    ``decoder/_DenseGridDecoder_0/x_{d}_{l}/ConvBnAct_{0,1}``.
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_p, enc_s = _convert_encoder_for(encoder_name, sd)

    cells = sorted({
        k.split(".")[2] for k in sd if k.startswith("decoder.blocks.x_")
    })
    if not cells:
        raise ValueError("no decoder.blocks.x_* keys in state dict")
    grid_p: Dict[str, Any] = {}
    grid_s: Dict[str, Any] = {}
    for cell in cells:
        cp: Dict[str, Any] = {}
        cs: Dict[str, Any] = {}
        for j, conv in enumerate(("conv1", "conv2")):
            prefix = f"decoder.blocks.{cell}.{conv}"
            p: Dict[str, Any] = {"Conv_0": _convert_conv(f"{prefix}.0", sd)}
            s: Dict[str, Any] = {}
            if f"{prefix}.1.running_mean" in sd:
                p["BatchNorm_0"], s["BatchNorm_0"] = convert_bn(f"{prefix}.1", sd)
            cp[f"ConvBnAct_{j}"] = p
            cs[f"ConvBnAct_{j}"] = s
        grid_p[cell] = cp
        grid_s[cell] = cs

    head = _convert_conv("segmentation_head.0", sd)
    return {
        "params": {
            "encoder": enc_p,
            "decoder": {"_DenseGridDecoder_0": grid_p},
            "segmentation_head": {"Conv_0": head},
        },
        "batch_stats": {
            "encoder": enc_s,
            "decoder": {"_DenseGridDecoder_0": grid_s},
        },
    }


def _convert_aspp(prefix: str, sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Reference ASPP (resunetplusplus/decoder.py:8-78) → flax blocks.ASPP.

    Four ``Sequential(conv, ReLU, BN)`` branches — BN at index **2**, after
    the activation — in order rates (6, 12, 18) then the plain 3×3
    (aspp_block4), then the 1×1 ``output`` merge. Flax auto-naming gives
    Conv_0..3/BatchNorm_0..3 in the same call order, merge = Conv_4.
    Every conv carries a bias (plain nn.Conv2d defaults).
    """
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for k in range(4):
        blk = f"{prefix}.aspp_block{k + 1}"
        p[f"Conv_{k}"] = _convert_conv(f"{blk}.0", sd)
        p[f"BatchNorm_{k}"], s[f"BatchNorm_{k}"] = convert_bn(f"{blk}.2", sd)
    p["Conv_4"] = _convert_conv(f"{prefix}.output", sd)
    return p, s


def _convert_rupp_attention(
    prefix: str, sd: Dict[str, Any], *, has_skip: bool
) -> Tuple[Dict, Dict]:
    """Reference AttentionBlock (resunetplusplus/decoder.py:81-117) → flax
    blocks.RUPPAttentionBlock.

    Three ``Sequential(BN, ReLU, conv, [pool])`` stacks — BN at 0, conv at
    2 — called in flax order decoder_conv, encoder_conv (skip only),
    attn_conv; linen numbers BatchNorm/Conv by call order, so the
    attn_conv pair lands at index 2 with a skip and index 1 without
    (the last decoder block has ``skip_channels == 0`` and the reference
    never constructs its ``encoder_conv``, decoder.py:87-97).
    """
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    stacks = ["decoder_conv"] + (["encoder_conv"] if has_skip else [])
    stacks += ["attn_conv"]
    for i, stack in enumerate(stacks):
        p[f"BatchNorm_{i}"], s[f"BatchNorm_{i}"] = convert_bn(
            f"{prefix}.{stack}.0", sd
        )
        p[f"Conv_{i}"] = _convert_conv(f"{prefix}.{stack}.2", sd)
    return p, s


def convert_resunetpp_checkpoint(
    sd: Dict[str, Any], *, encoder_name: str = "resnet34"
) -> Dict[str, Dict]:
    """Reference ResUnet++ (resunetplusplus/decoder.py:120-225,
    model.py:62-104) Lightning state dict → flax SegmentationModel
    variables — the fifth and last sweep-grid architecture
    (reference sweep.yaml architecture values).

    Layout: ASPP ``center`` bridge, per-block pre-upsample attention gate
    (``attention0``) + PreActivatedConv2dReLU pair (actually conv-bn-relu
    ordered, modules.py:50) + 1×1 additive ``identity_conv``, and a final
    ASPP halving the doubled internal widths back before the 1×1 head.
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_p, enc_s = _convert_encoder_for(encoder_name, sd)

    n_blocks = len({
        k.split(".")[2] for k in sd if k.startswith("decoder.blocks.")
    })
    if n_blocks == 0:
        raise ValueError("no decoder.blocks.* keys in state dict")

    dec_p: Dict[str, Any] = {}
    dec_s: Dict[str, Any] = {}
    dec_p["center"], dec_s["center"] = _convert_aspp("decoder.center", sd)
    for i in range(n_blocks):
        pre = f"decoder.blocks.{i}"
        has_skip = f"{pre}.attention0.encoder_conv.0.weight" in sd
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        bp["RUPPAttentionBlock_0"], bs["RUPPAttentionBlock_0"] = (
            _convert_rupp_attention(f"{pre}.attention0", sd, has_skip=has_skip)
        )
        for j, conv in enumerate(("conv1", "conv2")):
            cba_p: Dict[str, Any] = {
                "Conv_0": _convert_conv(f"{pre}.{conv}.0", sd)
            }
            cba_s: Dict[str, Any] = {}
            if f"{pre}.{conv}.1.running_mean" in sd:
                cba_p["BatchNorm_0"], cba_s["BatchNorm_0"] = convert_bn(
                    f"{pre}.{conv}.1", sd
                )
            bp[f"ConvBnAct_{j}"] = cba_p
            bs[f"ConvBnAct_{j}"] = cba_s
        bp["Conv_0"] = _convert_conv(f"{pre}.identity_conv", sd)
        dec_p[f"block_{i}"] = bp
        dec_s[f"block_{i}"] = bs
    dec_p["final_aspp"], dec_s["final_aspp"] = _convert_aspp(
        "decoder.final_aspp", sd
    )

    head = _convert_conv("segmentation_head.0", sd)
    return {
        "params": {
            "encoder": enc_p,
            "decoder": dec_p,
            "segmentation_head": {"Conv_0": head},
        },
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }


def _natural_key(name: str) -> Tuple[str, int]:
    """Sort key giving linen's auto-numbering order: ``MBConv_2`` before
    ``MBConv_10`` (plain string sort breaks at >=10 numbered siblings)."""
    m = re.search(r"\d+$", name)
    return (re.sub(r"\d+$", "", name), int(m.group()) if m else -1)


def _flatten_with_path(tree: Dict, path=()) -> List[Tuple[Tuple, Any]]:
    out = []
    for k in sorted(tree.keys(), key=_natural_key):
        v = tree[k]
        if isinstance(v, dict):
            out.extend(_flatten_with_path(v, path + (k,)))
        else:
            out.append((path + (k,), v))
    return out


def convert_by_order(
    torch_tensors: List[Tuple[str, Any]],
    flax_params: Dict,
) -> Dict:
    """Shape-driven traversal matcher for forward-order torch modules.

    Consumes torch (name, tensor) pairs in order; for each flax leaf (in
    module-definition order via sorted names, which linen auto-numbers in
    call order) takes the next torch tensor whose converted shape matches.
    Raises when no match exists — a loud failure beats silent weight
    scrambling.
    """
    leaves = _flatten_with_path(flax_params)
    remaining = list(torch_tensors)
    new_tree = {}

    def set_path(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for path, leaf in leaves:
        target_shape = tuple(leaf.shape)
        found = None
        for i, (name, t) in enumerate(remaining[:8]):  # small lookahead
            arr = np.asarray(t)
            for conv in (lambda a: a, t2j_conv, t2j_linear):
                try:
                    c = conv(arr)
                except Exception:
                    continue
                if tuple(c.shape) == target_shape:
                    found = (i, c)
                    break
            if found:
                break
        if found is None:
            raise ValueError(
                f"No torch tensor matches flax leaf {'/'.join(path)} "
                f"shape {target_shape}; next torch: "
                f"{[(n, tuple(np.asarray(t).shape)) for n, t in remaining[:3]]}"
            )
        i, c = found
        remaining.pop(i)
        set_path(new_tree, path, c)
    return new_tree


def load_torch_state_dict(path) -> Dict[str, Any]:
    """Load a torch/Lightning checkpoint's state dict from disk."""
    import torch

    # weights_only=True: checkpoints come from DVC-fetched public artifacts
    # (untrusted), so never execute pickled code. Plain tensor state dicts
    # and Lightning's tensor/primitive metadata load fine; anything needing
    # arbitrary-code unpickling is rejected loudly.
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pickle.UnpicklingError subclass varies
        raise ValueError(
            f"Refusing to unpickle {path!r} with code execution "
            f"(weights_only=True failed: {e}). Re-save the checkpoint as a "
            f"plain tensor state dict."
        ) from e
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}
