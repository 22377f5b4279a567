"""Decoder zoo: U-Net, U-Net++, ResUnet, ResUnet++, EfficientUnet++.

TPU-native (Flax, NHWC) re-designs of the five decoder families the
reference dispatches over (/root/reference/deadtrees/network/segmodel.py:61-75):

- ``UnetDecoder`` / ``UnetPlusPlusDecoder``: smp's plain and nested-dense
  decoders (the reference uses ``smp.Unet`` / ``smp.UnetPlusPlus`` directly).
- ``ResUnetDecoder`` (/root/reference/deadtrees/network/extra/resunet/decoder.py:8-134):
  conv-bn-relu pairs with an additive 1×1 identity path per block.
- ``ResUnetPlusPlusDecoder`` (resunetplusplus/decoder.py:120-225): ASPP
  bridge, per-block attention gate, doubled channel widths, final ASPP.
- ``EfficientUnetPlusPlusDecoder`` (efficientunetplusplus/decoder.py:102-184):
  the UNet++ dense grid with inverted-residual + SCSE blocks.

All decoders consume the smp-style feature pyramid ``[x, f1..f5]`` (they drop
the full-resolution head) and return a full-resolution feature map for the
segmentation head. Channel bookkeeping mirrors the reference exactly so that
converted PyTorch checkpoints map one-to-one.

The dense-grid (UNet++-family) wiring is shared by :class:`_DenseGridDecoder`
rather than duplicated per family — the reference's two copies differ only in
their block type.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from deadtrees_tpu.models.blocks import (
    ASPP,
    ConvBnAct,
    InvertedResidual,
    Lowres2x,
    RUPPAttentionBlock,
    make_attention,
    upsample2x_nearest,
)

Dtype = Any


def _partwise_grid_enabled() -> bool:
    """Opt-in: consume dense-grid concats partwise (PartwiseConv1x1).

    Measured trade-off (r2, PERF.md): removes the materialized concats
    (~22 ms/call at bs=128/512²) but blows XLA compile time from ~18 to
    >50 min for the flagship — the partwise graph carries ~60 extra
    distinct conv shapes. Off by default until compile cost is tamed.
    """
    import os

    return os.environ.get("DEADTREES_PARTWISE_GRID", "0") == "1"


def _partwise_rows() -> set:
    """Selective partwise: ``DEADTREES_PARTWISE_ROWS="3"`` (comma list of
    grid layer indices) enables concat-free consumption ONLY for those
    dense-grid rows. PERF.md r3: row 3 carries 46% of the flagship
    forward and its x_0_3 concat alone is ~22 ms/call at bs=128/512²,
    while whole-grid partwise blows compile 18→50+ min — per-row gating
    bounds the extra conv shapes to the cells that pay."""
    import os

    v = os.environ.get("DEADTREES_PARTWISE_ROWS", "")
    return {int(t) for t in v.split(",") if t.strip().isdigit()}


def _partwise_cells() -> set:
    """Finest gating: ``DEADTREES_PARTWISE_CELLS="x_0_3"`` (comma list of
    dense-grid cell names) enables concat-free consumption for exactly
    those cells. PERF.md r3: whole-row-3 partwise extends too many live
    ranges at bs=128/512² (21.3 G > 15.75 G HBM), but the single fattest
    cell (x_0_3 — its concat alone is 22.3 ms/call, the largest op on the
    post-flag timeline) may fit alone."""
    import os

    v = os.environ.get("DEADTREES_PARTWISE_CELLS", "")
    return {t.strip() for t in v.split(",") if t.strip()}


def _lowres_expand_enabled() -> bool:
    import os

    return os.environ.get("DEADTREES_LOWRES_EXPAND", "0") == "1"


# ---------------------------------------------------------------------------
# Decoder blocks
# ---------------------------------------------------------------------------


class UnetDecoderBlock(nn.Module):
    """smp Unet decoder block: 2× upsample → concat skip → [attn] →
    (conv-bn-relu) ×2 → [attn]."""

    features: int
    attention_type: Optional[str] = None
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip=None, train: bool = False
    ) -> jnp.ndarray:
        x = upsample2x_nearest(x)
        if skip is not None:
            skips = list(skip) if isinstance(skip, (list, tuple)) else [skip]
            x = jnp.concatenate([x] + skips, axis=-1)
            x = make_attention(
                self.attention_type, dtype=self.dtype, param_dtype=self.param_dtype
            )(x)
        x = ConvBnAct(
            self.features, use_batchnorm=self.use_batchnorm,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)
        x = ConvBnAct(
            self.features, use_batchnorm=self.use_batchnorm,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)
        return make_attention(
            self.attention_type, dtype=self.dtype, param_dtype=self.param_dtype
        )(x)


class ResUnetDecoderBlock(nn.Module):
    """ResUnet decoder block (resunet/decoder.py:8-52): like the Unet block
    but with an additive 1×1-projected identity path around the conv pair."""

    features: int
    attention_type: Optional[str] = None
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: Optional[jnp.ndarray] = None, train: bool = False
    ) -> jnp.ndarray:
        x = upsample2x_nearest(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
            identity = x
            x = make_attention(
                self.attention_type, dtype=self.dtype, param_dtype=self.param_dtype
            )(x)
        else:
            identity = x
        x = ConvBnAct(
            self.features, use_batchnorm=self.use_batchnorm,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)
        x = ConvBnAct(
            self.features, use_batchnorm=self.use_batchnorm,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)
        x = make_attention(
            self.attention_type, dtype=self.dtype, param_dtype=self.param_dtype
        )(x)
        identity = nn.Conv(
            self.features, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype
        )(identity)
        return x + identity


class ResUnetPlusPlusDecoderBlock(nn.Module):
    """ResUnet++ decoder block (resunetplusplus/decoder.py:120-166): an
    attention gate BEFORE upsampling, then the ResUnet block body."""

    features: int
    attention_type: Optional[str] = None
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: Optional[jnp.ndarray] = None, train: bool = False
    ) -> jnp.ndarray:
        x = RUPPAttentionBlock(
            features=x.shape[-1], dtype=self.dtype, param_dtype=self.param_dtype
        )(x, skip, train)
        x = upsample2x_nearest(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
            identity = x
            x = make_attention(
                self.attention_type, dtype=self.dtype, param_dtype=self.param_dtype
            )(x)
        else:
            identity = x
        x = ConvBnAct(
            self.features, use_batchnorm=self.use_batchnorm,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)
        x = ConvBnAct(
            self.features, use_batchnorm=self.use_batchnorm,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)
        x = make_attention(
            self.attention_type, dtype=self.dtype, param_dtype=self.param_dtype
        )(x)
        identity = nn.Conv(
            self.features, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype
        )(identity)
        return x + identity


class EffUnetPlusPlusDecoderBlock(nn.Module):
    """EfficientUnet++ decoder block (efficientunetplusplus/decoder.py:63-99):
    2× upsample → concat skip → inverted-residual ×2."""

    features: int
    squeeze_ratio: int = 1
    expansion_ratio: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip=None, train: bool = False
    ) -> jnp.ndarray:
        # skip may be one tensor or a LIST of same-resolution tensors (the
        # dense grid's predecessors). With DEADTREES_PARTWISE_GRID=1 the
        # InvertedResidual consumes the parts without materializing their
        # concatenation (blocks.py PartwiseConv1x1), optionally keeping the
        # upsampled input LOW-RES through the 1×1 convs
        # (DEADTREES_LOWRES_EXPAND=1; conv1x1 commutes with up2x). Both are
        # opt-in: see _partwise_grid_enabled for the measured trade-offs.
        skips = (
            (list(skip) if isinstance(skip, (list, tuple)) else [skip])
            if skip is not None
            else []
        )
        row = (
            int(self.name.rsplit("_", 1)[1])
            if self.name and self.name.startswith("x_")
            else None
        )
        if (
            _partwise_grid_enabled()
            or (row is not None and row in _partwise_rows())
            or (self.name in _partwise_cells())
        ):
            up = (
                Lowres2x(x) if _lowres_expand_enabled()
                else upsample2x_nearest(x)
            )
            first_in = [up] + skips
        else:
            up = upsample2x_nearest(x)
            first_in = (
                jnp.concatenate([up] + skips, axis=-1) if skips else up
            )
        x = InvertedResidual(
            self.features,
            expansion_ratio=self.expansion_ratio, squeeze_ratio=self.squeeze_ratio,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(first_in, train)
        return InvertedResidual(
            self.features,
            expansion_ratio=self.expansion_ratio, squeeze_ratio=self.squeeze_ratio,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x, train)


# ---------------------------------------------------------------------------
# Linear (U-shaped) decoders
# ---------------------------------------------------------------------------


def _prep_features(features: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Drop the full-resolution feature, reverse to deepest-first
    (both smp decoders and all reference decoders do this)."""
    return list(features[1:])[::-1]


class UnetDecoder(nn.Module):
    """smp-style plain U-Net decoder."""

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention_type: Optional[str] = None
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        feats = _prep_features(features)
        x, skips = feats[0], feats[1:]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = UnetDecoderBlock(
                ch, attention_type=self.attention_type,
                use_batchnorm=self.use_batchnorm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(x, skip, train)
        return x


class ResUnetDecoder(nn.Module):
    """ResUnet decoder (resunet/decoder.py:74-134)."""

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention_type: Optional[str] = None
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        feats = _prep_features(features)
        x, skips = feats[0], feats[1:]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = ResUnetDecoderBlock(
                ch, attention_type=self.attention_type,
                use_batchnorm=self.use_batchnorm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(x, skip, train)
        return x


class ResUnetPlusPlusDecoder(nn.Module):
    """ResUnet++ decoder (resunetplusplus/decoder.py:169-225): ASPP bridge
    into doubled-width attention blocks, final ASPP halving back."""

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention_type: Optional[str] = None
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        feats = _prep_features(features)
        x, skips = feats[0], feats[1:]
        head_ch = x.shape[-1]
        out_channels = [2 * c for c in self.decoder_channels]

        x = ASPP(
            2 * head_ch, dtype=self.dtype, param_dtype=self.param_dtype, name="center"
        )(x, train)
        for i, ch in enumerate(out_channels):
            skip = skips[i] if i < len(skips) else None
            x = ResUnetPlusPlusDecoderBlock(
                ch, attention_type=self.attention_type,
                use_batchnorm=self.use_batchnorm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(x, skip, train)
        return ASPP(
            out_channels[-1] // 2,
            dtype=self.dtype, param_dtype=self.param_dtype, name="final_aspp",
        )(x, train)


# ---------------------------------------------------------------------------
# Dense-grid (UNet++ family) decoders
# ---------------------------------------------------------------------------


class _DenseGridDecoder(nn.Module):
    """Shared nested-dense (UNet++) wiring.

    Grid cell ``x_{d}_{l}`` (depth d, layer l) upsamples its left neighbour
    and concatenates all same-resolution predecessors plus the encoder skip,
    exactly as efficientunetplusplus/decoder.py:156-184 (identical to smp's
    ``UnetPlusPlusDecoder.forward``). Output channels per cell:
    ``decoder_channels[l]`` on the d=0 row, else the skip width of layer l.
    """

    decoder_channels: Sequence[int]
    make_block: Callable[[int, str], nn.Module] = None  # (features, name) -> block

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        feats = _prep_features(features)
        skip_channels = [f.shape[-1] for f in feats[1:]] + [0]
        depth = len(self.decoder_channels) - 1

        def out_ch(d: int, l: int) -> int:
            return self.decoder_channels[l] if d == 0 else skip_channels[l]

        dense = {}
        for layer in range(depth):
            for d in range(depth - layer):
                li = d + layer
                if layer == 0:
                    dense[(d, d)] = self.make_block(out_ch(d, d), f"x_{d}_{d}")(
                        feats[d], feats[d + 1], train
                    )
                else:
                    # same-resolution predecessors + encoder skip, passed as
                    # a LIST — blocks that can, consume it concat-free
                    cat = [dense[(idx, li)] for idx in range(d + 1, li + 1)]
                    dense[(d, li)] = self.make_block(out_ch(d, li), f"x_{d}_{li}")(
                        dense[(d, li - 1)], cat + [feats[li + 1]], train
                    )
        return self.make_block(self.decoder_channels[-1], f"x_0_{depth}")(
            dense[(0, depth - 1)], None, train
        )


class UnetPlusPlusDecoder(nn.Module):
    """smp-style UNet++ decoder (dense grid of conv-bn-relu blocks)."""

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention_type: Optional[str] = None
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        def block(ch, name):
            return UnetDecoderBlock(
                ch, attention_type=self.attention_type,
                use_batchnorm=self.use_batchnorm,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )

        return _DenseGridDecoder(
            decoder_channels=tuple(self.decoder_channels), make_block=block
        )(features, train)


class EfficientUnetPlusPlusDecoder(nn.Module):
    """EfficientUnet++ decoder (efficientunetplusplus/decoder.py:102-184):
    the UNet++ grid with inverted-residual + SCSE blocks."""

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    squeeze_ratio: int = 1
    expansion_ratio: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        def block(ch, name):
            return EffUnetPlusPlusDecoderBlock(
                ch, squeeze_ratio=self.squeeze_ratio,
                expansion_ratio=self.expansion_ratio,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )

        return _DenseGridDecoder(
            decoder_channels=tuple(self.decoder_channels), make_block=block
        )(features, train)
