"""NN building blocks for the U-Net model family (Flax, NHWC, TPU-first).

Functional counterparts of the reference's block library
(/root/reference/deadtrees/network/extra/modules.py:10-231 and the decoder
blocks built from it). Everything is channel-LAST (B, H, W, C) — the layout
XLA tiles best onto the TPU MXU — with a bf16-compute / f32-param precision
policy threaded through ``dtype`` / ``param_dtype``.

Numerical-semantics notes (for parity with the reference):

- The reference's ``PreActivatedConv2dReLU`` (modules.py:10-50), despite its
  name, composes ``Sequential(conv, bn, relu)`` exactly like ``Conv2dReLU``
  (modules.py:53-92); both are a single conv→BN→ReLU block here.
- ``SCSEModule`` (modules.py:148-165) returns ``x*cSE(x) + x*sSE(x)``.
- ``ASPP`` (resunetplusplus/decoder.py:8-78) applies conv→ReLU→BN in that
  (unusual) order; we keep that order.
- Upsampling is 2× nearest (``F.interpolate(mode="nearest")``), implemented
  as a reshape/broadcast trick that XLA lowers to a cheap copy.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour upsampling for NHWC tensors.

    Equivalent of ``F.interpolate(x, scale_factor=2, mode="nearest")``
    (e.g. resunet/decoder.py:41). Implemented with broadcast+reshape, which
    XLA fuses better than a gather-based ``jax.image.resize``.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvBnAct(nn.Module):
    """conv → BatchNorm → activation (reference Conv2dReLU, modules.py:53-92).

    Also stands in for the (identically-ordered) PreActivatedConv2dReLU.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_batchnorm: bool = True
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME" if self.kernel_size > 1 else "VALID",
            use_bias=not self.use_batchnorm,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        return self.act(x)


class SEModule(nn.Module):
    """Channel squeeze-excitation (reference SEModule, modules.py:116-132)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)  # global avg pool
        s = nn.Conv(
            max(c // self.reduction, 1), (1, 1),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype)(s)
        return x * jax.nn.sigmoid(s)


class SSEModule(nn.Module):
    """Spatial squeeze-excitation (reference sSEModule, modules.py:135-145)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return x * jax.nn.sigmoid(s)


class SCSEModule(nn.Module):
    """Concurrent spatial+channel SE (reference SCSEModule, modules.py:148-165)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cse = SEModule(
            reduction=self.reduction, dtype=self.dtype, param_dtype=self.param_dtype
        )(x)
        sse = SSEModule(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return cse + sse


def make_attention(
    name: Optional[str], *, dtype: Dtype, param_dtype: Dtype
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Attention factory (reference Attention, modules.py:211-225).

    Returns a module instance (or identity fn) for ``None``/'se'/'scse'.
    Must be called from inside an ``nn.compact`` method.
    """
    if name is None:
        return lambda x: x
    if name == "scse":
        return SCSEModule(dtype=dtype, param_dtype=param_dtype)
    if name == "se":
        return SEModule(dtype=dtype, param_dtype=param_dtype)
    raise ValueError(f"Attention {name} is not implemented")


class Lowres2x:
    """Marker for a part that stands for ``upsample2x_nearest(tensor)``
    without materializing it: 1×1 convs COMMUTE with nearest-neighbor
    upsampling (``conv1x1(up2x(x)) == up2x(conv1x1(x))``), so
    :class:`PartwiseConv1x1` convolves at LOW resolution (¼ the FLOPs)
    and the upsampled activation never round-trips HBM."""

    def __init__(self, tensor):
        self.tensor = tensor

    @property
    def channels(self) -> int:
        return self.tensor.shape[-1]

    def materialize(self):
        return upsample2x_nearest(self.tensor)


def _part_channels(p) -> int:
    return p.channels if isinstance(p, Lowres2x) else p.shape[-1]


def materialize_parts(parts) -> jnp.ndarray:
    """Concat parts (materializing any Lowres2x) — the fallback for
    consumers that can't stay partwise (3×3 convs, identity skips)."""
    ts = [p.materialize() if isinstance(p, Lowres2x) else p for p in parts]
    return ts[0] if len(ts) == 1 else jnp.concatenate(ts, axis=-1)


class PartwiseConv1x1(nn.Module):
    """1×1 conv applied to a LIST of feature maps by kernel slicing.

    ``conv1x1(concat(parts)) == Σᵢ conv1x1ᵢ(partᵢ)`` with the kernel split
    along its input axis — identical math and an IDENTICAL parameter
    ({kernel, bias}) to ``nn.Conv(features, (1, 1))`` on the concatenated
    input, but XLA never materializes the concatenation. The dense-grid
    decoder's concats were ~2 extra HBM passes of 100-170-channel tensors
    at up to 256² (PERF.md r2: 22 ms/call of `concatenate` + their
    re-reads at bs=128). :class:`Lowres2x` parts additionally convolve at
    low resolution before a (consumer-fused) broadcast upsample.
    """

    features: int
    in_features: int  # total width across parts
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, parts) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        out = None
        off = 0
        for p in parts:
            c = _part_channels(p)
            k = kernel[:, :, off : off + c, :].astype(self.dtype)
            t = p.tensor if isinstance(p, Lowres2x) else p
            y = jax.lax.conv_general_dilated(
                t.astype(self.dtype), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if isinstance(p, Lowres2x):
                y = upsample2x_nearest(y)
            out = y if out is None else out + y
            off += c
        assert off == self.in_features, (off, self.in_features)
        return out + bias.astype(self.dtype)


def _combined_expand_skip_enabled() -> bool:
    """Opt-in: compute the IR1 expand (Conv_0) and skip-projection
    (Conv_3) as ONE convolution with output-axis-concatenated kernels.

    Both convs read the same (possibly concatenated) block input as
    separate full HBM passes, and the r3 roofline shows each already at
    80-95% of the stream rate — so the only remaining lever is reading
    the input once. The win requires XLA:TPU to multi-output-fuse the
    two sliced BN/activation epilogues (measured: scripts/
    probe_combined_conv.py); parameter tree unchanged (Conv_0/Conv_3
    keep their own {kernel, bias}).
    """
    import os

    return os.environ.get("DEADTREES_COMBINED_EXPAND_SKIP", "0") == "1"


class Conv1x1Params(nn.Module):
    """Parameter holder with nn.Conv-compatible naming ({kernel, bias})
    for 1×1 convs whose compute is staged OUTSIDE the module (combined /
    partwise execution). Checkpoints and converters see the exact tree
    `nn.Conv(features, (1, 1), name=...)` would create."""

    features: int
    in_features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        return kernel, bias


class InvertedResidual(nn.Module):
    """Inverted bottleneck residual with embedded SCSE
    (reference efficientunetplusplus/decoder.py:9-60).

    pointwise-expand → BN → hardswish → depthwise → BN → hardswish →
    SCSE(reduction=squeeze_ratio) → pointwise-project → BN, plus a residual
    connection (1×1 conv + BN on the skip when channel counts differ).

    Accepts either one tensor or a LIST of tensors standing for their
    channel concatenation (dense-grid cells pass the un-materialized
    parts; the 1×1 expand and skip convs slice their kernels instead —
    parameter tree unchanged).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    expansion_ratio: int = 1
    squeeze_ratio: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        parts = list(x) if isinstance(x, (list, tuple)) else [x]
        in_ch = sum(_part_channels(p) for p in parts)
        mid = self.expansion_ratio * in_ch
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

        combined = (
            _combined_expand_skip_enabled()
            and self.expansion_ratio == 1
            and self.strides == 1
            and in_ch != self.features
        )
        skip_pre = None
        if combined:
            # One conv with [W0 | W3] on the output axis reads the block
            # input ONCE for both the expand and the skip projection
            # (partwise over un-materialized parts when given a list).
            k0, b0 = Conv1x1Params(
                mid, in_ch, name="Conv_0", param_dtype=self.param_dtype
            )()
            k3, b3 = Conv1x1Params(
                self.features, in_ch, name="Conv_3",
                param_dtype=self.param_dtype,
            )()
            kc = jnp.concatenate([k0, k3], axis=-1).astype(self.dtype)
            bc = jnp.concatenate([b0, b3], axis=-1).astype(self.dtype)
            out = None
            off = 0
            for p in parts:
                c = _part_channels(p)
                t = (p.tensor if isinstance(p, Lowres2x) else p).astype(
                    self.dtype
                )
                y = jax.lax.conv_general_dilated(
                    t, kc[:, :, off : off + c, :], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                if isinstance(p, Lowres2x):
                    y = upsample2x_nearest(y)
                out = y if out is None else out + y
                off += c
            out = out + bc
            h = out[..., :mid]
            skip_pre = out[..., mid:]
        elif self.expansion_ratio == 1 and self.strides == 1:
            # expand is 1×1: apply partwise, skipping the concat
            h = PartwiseConv1x1(
                mid, in_ch, name="Conv_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(parts)
        else:
            h = nn.Conv(
                mid, (1, 1), name="Conv_0",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(materialize_parts(parts))
        h = norm()(h)
        h = jax.nn.hard_swish(h)
        h = nn.Conv(
            mid, (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            feature_group_count=mid,  # depthwise
            name="Conv_1",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)
        h = norm()(h)
        h = jax.nn.hard_swish(h)
        h = SCSEModule(
            reduction=self.squeeze_ratio, dtype=self.dtype, param_dtype=self.param_dtype
        )(h)
        h = nn.Conv(
            self.features, (1, 1), name="Conv_2",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)
        h = norm()(h)

        if in_ch != self.features:
            if skip_pre is not None:
                x = skip_pre
            else:
                x = PartwiseConv1x1(
                    self.features, in_ch, name="Conv_3",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                )(parts)
            x = norm()(x)
        else:
            x = materialize_parts(parts)
        return x + h


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling bridge
    (reference resunetplusplus/decoder.py:8-78): three dilated 3×3 branches
    (rates 6/12/18) + one plain 3×3, each conv→ReLU→BN, concat, 1×1 merge.
    """

    features: int
    rates: Sequence[int] = (6, 12, 18)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def branch(inp, rate):
            h = nn.Conv(
                self.features, (3, 3),
                kernel_dilation=(rate, rate),
                padding=[(rate, rate), (rate, rate)],
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(inp)
            h = nn.relu(h)
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(h)

        outs = [branch(x, r) for r in self.rates] + [branch(x, 1)]
        h = jnp.concatenate(outs, axis=-1)
        return nn.Conv(
            self.features, (1, 1),
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)


class RUPPAttentionBlock(nn.Module):
    """ResUnet++ decoder attention gate
    (reference resunetplusplus/decoder.py:81-117): pre-upsample fusion of the
    (downsampled) skip with the decoder stream, reduced to a per-channel
    gate via global average pooling.
    """

    features: int  # intermediate channel count (== in_channels in reference)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: Optional[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        in_ch = x.shape[-1]
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

        out = norm()(x)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(out)

        if skip is not None:
            s = norm()(skip)
            s = nn.relu(s)
            s = nn.Conv(
                self.features, (3, 3), padding="SAME",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(s)
            s = nn.max_pool(s, (2, 2), strides=(2, 2))
            out = out + s

        out = norm()(out)
        out = nn.relu(out)
        out = nn.Conv(
            in_ch, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype
        )(out)
        out = jnp.mean(out, axis=(1, 2), keepdims=True)  # adaptive avg pool → (B,1,1,C)
        return out * x


class SegmentationHead(nn.Module):
    """Final 3×3 conv producing per-class logits
    (smp ``SegmentationHead`` as used at efficientunetplusplus/model.py:85-90).
    Output is f32 regardless of compute dtype — loss/softmax stay accurate.
    """

    classes: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.classes,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        return x.astype(jnp.float32)
