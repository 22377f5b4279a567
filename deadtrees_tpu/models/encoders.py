"""Encoder zoo: ResNet-18/34 and EfficientNet-B0..B7 feature extractors.

TPU-native (Flax, NHWC) counterparts of the smp encoders the reference pulls
in via ``get_encoder`` (e.g. /root/reference/deadtrees/network/extra/
efficientunetplusplus/model.py:70-75; encoder names configured at
/root/reference/sweep.yaml:22-33: resnet18, resnet34, timm-efficientnet-b4,
timm-efficientnet-b5).

Each encoder returns the smp-style 6-level feature pyramid
``[x, f1, f2, f3, f4, f5]`` at reductions [1, 2, 4, 8, 16, 32]; decoders drop
the first (full-resolution) entry. ``out_channels`` in the registry mirrors
smp's ``encoder.out_channels`` so decoder channel math matches the reference.

Pretrained imagenet weights load from a local ``.npz``/torch file via
``deadtrees_tpu.models.convert`` (this image has no network egress, so
``encoder_weights="imagenet"`` degrades to Kaiming init with a warning when
no weight file is configured).
"""

from __future__ import annotations

import logging
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

log = logging.getLogger(__name__)

Dtype = Any


# ---------------------------------------------------------------------------
# ResNet (basic-block family: resnet18 / resnet34)
# ---------------------------------------------------------------------------


class BasicBlock(nn.Module):
    """torchvision-style ResNet basic block: two 3×3 convs + identity."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        residual = x
        # explicit symmetric padding: torch pads (1,1) for stride-2 3x3
        # convs, while XLA's "SAME" pads (0,1) — different alignment
        h = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        h = norm()(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.features, (3, 3), padding="SAME", use_bias=False,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)
        h = norm()(h)
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)
            residual = norm()(residual)
        return nn.relu(h + residual)


class Bottleneck(nn.Module):
    """torchvision-style ResNet bottleneck: 1×1 reduce → 3×3 → 1×1 expand
    (×4), used by resnet50+ (torchvision resnet.py Bottleneck)."""

    features: int  # inner width; block output is features * 4
    strides: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        conv = lambda f, k, s=1, pad="SAME": nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s),
            padding=[(pad, pad)] * 2 if isinstance(pad, int) else pad,
            use_bias=False, kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        out = self.features * 4
        residual = x
        # statement order fixes flax auto-names: Conv_k then BatchNorm_k
        h = conv(self.features, 1)(x)
        h = nn.relu(norm()(h))
        # torch puts the stride on the 3x3 (torchvision >= 1.0 semantics)
        h = conv(self.features, 3, self.strides, 1)(h)
        h = nn.relu(norm()(h))
        h = conv(out, 1)(h)
        h = norm()(h)
        if self.strides != 1 or x.shape[-1] != out:
            residual = conv(out, 1, self.strides)(x)
            residual = norm()(residual)
        return nn.relu(h + residual)


class ResNetEncoder(nn.Module):
    """ResNet backbone emitting the 6-level smp feature pyramid.

    ``block="basic"`` (resnet18/34) or ``"bottleneck"`` (resnet50+, 4×
    channel expansion per stage)."""

    stage_sizes: Sequence[int]  # (2,2,2,2) for r18, (3,4,6,3) for r34/r50
    block: str = "basic"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)
        h = nn.relu(h)
        features.append(h)  # reduction 2

        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for i in range(blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                h = block_cls(
                    width, strides=strides,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                )(h, train)
            features.append(h)  # reductions 4, 8, 16, 32
        return features


# ---------------------------------------------------------------------------
# EfficientNet (B0..B7)
# ---------------------------------------------------------------------------

# Base (B0) stage configs: (expand_ratio, channels, num_blocks, stride, kernel)
_EFFNET_BASE = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# (width_mult, depth_mult) per variant
_EFFNET_PARAMS = {
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6),
    "efficientnet-b7": (2.0, 3.1),
}


def _round_channels(channels: float, width_mult: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding (round to nearest multiple of 8)."""
    channels *= width_mult
    new_c = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * channels:
        new_c += divisor
    return int(new_c)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def _tf_same_pads(
    shape: Tuple[int, ...], kernel: int, stride: int
) -> List[Tuple[int, int]]:
    """TF-'SAME' asymmetric padding per spatial dim (shape is (B,H,W,C)).

    ``out = ceil(in/s)``; total pad ``(out-1)*s + k - in`` split low-first
    — e.g. k=3 s=2 on even input pads (0, 1) where torch static pads (1, 1).
    Identical to static k//2 padding whenever stride is 1 and k is odd.
    """
    pads = []
    for d in shape[1:3]:
        out = -(-d // stride)
        total = max((out - 1) * stride + kernel - d, 0)
        pads.append((total // 2, total - total // 2))
    return pads


class MBConv(nn.Module):
    """EfficientNet mobile inverted bottleneck block with SE.

    expand(1×1) → BN → SiLU → depthwise(k×k, stride) → BN → SiLU →
    SE(ratio 0.25 of block input) → project(1×1) → BN; residual when
    stride 1 and shapes match.

    ``bn_eps``/``pad_type`` select between the two candidate conventions
    for the reference's smp timm-efficientnet construction (the encoder
    source is absent from /root/reference — see docs/encoder_audit.md):
    torch-static padding vs TF-'SAME' asymmetric padding at stride 2, and
    BN epsilon 1e-3 (efficientnet-pytorch / timm tf_ variants) vs 1e-5
    (timm non-tf torch default). scripts/parity_vs_reference.py resolves
    the pair empirically against the real checkpoint.
    """

    features: int
    kernel_size: int
    strides: int
    expand_ratio: int
    se_ratio: float = 0.25
    bn_eps: float = 1e-3
    pad_type: str = "static"  # "static" (torch k//2) | "same" (TF asym)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=self.bn_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(
                mid, (1, 1), use_bias=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(h)
            h = norm()(h)
            h = jax.nn.silu(h)

        if self.pad_type == "same":
            pads = _tf_same_pads(h.shape, self.kernel_size, self.strides)
        else:
            pad = self.kernel_size // 2
            pads = [(pad, pad), (pad, pad)]  # torch static k//2 padding
        h = nn.Conv(
            mid, (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=pads,
            feature_group_count=mid, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)
        h = norm()(h)
        h = jax.nn.silu(h)

        # Squeeze-excitation sized from the block INPUT channels
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype)(s)
        s = jax.nn.silu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype)(s)
        h = h * jax.nn.sigmoid(s)

        h = nn.Conv(
            self.features, (1, 1), use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)
        h = norm()(h)

        if self.strides == 1 and in_ch == self.features:
            h = h + x
        return h


class EfficientNetEncoder(nn.Module):
    """EfficientNet backbone emitting the 6-level smp feature pyramid.

    Feature taps match smp/timm ``out_indices``: the stem activation at
    reduction 2 (stage 1 keeps r2 but is not a tap), then stage 2 (r4),
    stage 3 (r8), stage 5 (r16), stage 7 (r32) — e.g. b5 out_channels
    (3, 48, 40, 64, 176, 512) as smp reports for timm-efficientnet-b5.
    """

    width_mult: float
    depth_mult: float
    bn_eps: float = 1e-3
    pad_type: str = "static"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        stem = _round_channels(32, self.width_mult)
        if self.pad_type == "same":
            stem_pads = _tf_same_pads(x.shape, 3, 2)
        else:
            # torch static (1,1), not XLA "SAME" (0,1) at stride 2
            stem_pads = [(1, 1), (1, 1)]
        h = nn.Conv(
            stem, (3, 3), strides=(2, 2), padding=stem_pads, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=self.bn_eps,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)
        h = jax.nn.silu(h)
        features.append(h)  # reduction 2 (stem)

        # taps AFTER stages 2 (r4), 3 (r8), 5 (r16), 7 (r32)
        taps = {2, 3, 5, 7}
        for stage_idx, (t, c, n, s, k) in enumerate(_EFFNET_BASE, start=1):
            out_ch = _round_channels(c, self.width_mult)
            repeats = _round_repeats(n, self.depth_mult)
            for i in range(repeats):
                h = MBConv(
                    out_ch, kernel_size=k,
                    strides=s if i == 0 else 1,
                    expand_ratio=t,
                    bn_eps=self.bn_eps, pad_type=self.pad_type,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                )(h, train)
            if stage_idx in taps:
                features.append(h)
        return features


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def _effnet_out_channels(width_mult: float) -> Tuple[int, ...]:
    r = lambda c: _round_channels(c, width_mult)  # noqa: E731
    return (3, r(32), r(24), r(40), r(112), r(320))


ENCODERS = {
    "resnet18": {
        "builder": lambda dtype, param_dtype, name=None: ResNetEncoder(
            stage_sizes=(2, 2, 2, 2), dtype=dtype, param_dtype=param_dtype, name=name
        ),
        "out_channels": (3, 64, 64, 128, 256, 512),
    },
    "resnet34": {
        "builder": lambda dtype, param_dtype, name=None: ResNetEncoder(
            stage_sizes=(3, 4, 6, 3), dtype=dtype, param_dtype=param_dtype, name=name
        ),
        "out_channels": (3, 64, 64, 128, 256, 512),
    },
    # the commented-out rung of the reference sweep grid (sweep.yaml:27)
    "resnet50": {
        "builder": lambda dtype, param_dtype, name=None: ResNetEncoder(
            stage_sizes=(3, 4, 6, 3), block="bottleneck",
            dtype=dtype, param_dtype=param_dtype, name=name,
        ),
        "out_channels": (3, 64, 256, 512, 1024, 2048),
    },
}

for _name, (_w, _d) in _EFFNET_PARAMS.items():
    ENCODERS[_name] = {
        "builder": (
            lambda dtype, param_dtype, name=None, w=_w, d=_d, **opts:
            EfficientNetEncoder(
                width_mult=w, depth_mult=d, dtype=dtype, param_dtype=param_dtype,
                name=name, **opts,
            )
        ),
        "out_channels": _effnet_out_channels(_w),
    }
    # smp configures these as "timm-efficientnet-bN" (sweep.yaml:28-33)
    ENCODERS[f"timm-{_name}"] = ENCODERS[_name]


def get_encoder(
    name: str,
    *,
    in_channels: int = 3,
    weights: Optional[str] = None,
    dtype: Dtype = jnp.float32,
    param_dtype: Dtype = jnp.float32,
    module_name: Optional[str] = None,
    **encoder_options,
) -> Tuple[nn.Module, Tuple[int, ...]]:
    """Build an encoder module + its ``out_channels`` tuple.

    Counterpart of smp ``get_encoder(name, in_channels, depth, weights)``.
    ``weights`` may be None, "imagenet" (warns: no egress — random init unless
    a converted file is supplied via the checkpoint loader), or a path handled
    upstream by :mod:`deadtrees_tpu.models.convert`.

    ``encoder_options`` (e.g. ``bn_eps``/``pad_type``) are forwarded to the
    EfficientNet family for the forward-convention ambiguity documented in
    docs/encoder_audit.md; ResNet builders reject them (no ambiguity there:
    torchvision conventions are fully determined).
    """
    key = name.lower().strip()
    if key not in ENCODERS:
        raise ValueError(
            f"Unknown encoder '{name}'. Available: {sorted(ENCODERS)}"
        )
    if weights == "imagenet":
        log.warning(
            "encoder_weights='imagenet' requested but this environment has no "
            "network egress; initializing with Kaiming. Load converted weights "
            "explicitly via deadtrees_tpu.models.convert to restore parity."
        )
    entry = ENCODERS[key]
    out_channels = (in_channels,) + tuple(entry["out_channels"][1:])
    opts = {k: v for k, v in encoder_options.items() if v is not None}
    return entry["builder"](dtype, param_dtype, module_name, **opts), out_channels
