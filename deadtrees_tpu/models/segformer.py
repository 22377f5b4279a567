"""SegFormer: transformer segmentation on the same tile pipeline.

The stretch config of the rebuild (BASELINE.json config 5: "SegFormer /
ViT-based segmenter on same tile pipeline") — the reference has no
transformer at all (SURVEY.md §5.7). Implementation follows the SegFormer
paper (Xie et al., 2021, arXiv:2105.15203):

- MiT encoder: 4 stages of overlapped patch embedding (k7s4 then k3s2) +
  efficient self-attention with spatial-reduction (sr_ratio) + Mix-FFN
  (MLP with a 3×3 depthwise conv); LayerNorm throughout;
- all-MLP decoder: per-stage linear projection to a shared width, bilinear
  upsample to 1/4 resolution, concat, 1×1 fuse, classify, upsample ×4.

Per-tile sequence length stays ≤ (H/4)² = 4096 at 256² tiles, so no
sequence parallelism is warranted (SURVEY.md §5.7) — attention is plain
batched matmuls on the MXU. bf16 compute / f32 params like the CNN zoo.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# MiT variants: (embed_dims, depths, heads, mlp_ratio)
MIT_CONFIGS = {
    "mit-b0": ((32, 64, 160, 256), (2, 2, 2, 2), (1, 2, 5, 8), 4),
    "mit-b1": ((64, 128, 320, 512), (2, 2, 2, 2), (1, 2, 5, 8), 4),
    "mit-b2": ((64, 128, 320, 512), (3, 4, 6, 3), (1, 2, 5, 8), 4),
}
SR_RATIOS = (8, 4, 2, 1)


class EfficientAttention(nn.Module):
    """Self-attention with spatial-reduction of K/V (SegFormer eq. 2)."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads

        q = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype)(x)

        kv_in = x
        if self.sr_ratio > 1:
            r = self.sr_ratio
            sp = x.reshape(b, h, w, c)
            sp = nn.Conv(
                self.dim, (r, r), strides=(r, r),
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(sp)
            kv_in = sp.reshape(b, -1, self.dim)
            kv_in = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(
                kv_in
            )
        k = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype)(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype)(kv_in)

        def split(t):
            return t.reshape(b, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(head_dim).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype)(out)


class MixFFN(nn.Module):
    """MLP with a 3×3 depthwise conv (SegFormer eq. 3) — positional info
    without positional encodings."""

    dim: int
    mlp_ratio: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        hidden = self.dim * self.mlp_ratio
        x = nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        sp = x.reshape(b, h, w, hidden)
        sp = nn.Conv(
            hidden, (3, 3), padding="SAME", feature_group_count=hidden,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(sp)
        x = sp.reshape(b, n, hidden)
        x = jax.nn.gelu(x)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype)(x)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        ln = lambda: nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)  # noqa: E731
        x = x + EfficientAttention(
            self.dim, self.num_heads, self.sr_ratio,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(ln()(x), h, w)
        x = x + MixFFN(
            self.dim, self.mlp_ratio,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(ln()(x), h, w)
        return x


class SegFormer(nn.Module):
    """MiT encoder + all-MLP decoder; same call signature as
    :class:`deadtrees_tpu.models.factory.SegmentationModel`."""

    encoder_name: str = "mit-b0"
    decoder_dim: int = 256
    in_channels: int = 4
    classes: int = 3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, encoder_train: bool = True
    ) -> jnp.ndarray:
        dims, depths, heads, mlp_ratio = MIT_CONFIGS[self.encoder_name.lower()]
        x = x.astype(self.dtype)
        b = x.shape[0]

        feats = []
        h = x
        for stage in range(4):
            patch = (7, 4, 3) if stage == 0 else (3, 2, 1)
            k, s, p = patch
            h = nn.Conv(
                dims[stage], (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(h)
            hh, ww = h.shape[1], h.shape[2]
            seq = h.reshape(b, hh * ww, dims[stage])
            seq = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(seq)
            for _ in range(depths[stage]):
                seq = MiTBlock(
                    dims[stage], heads[stage], SR_RATIOS[stage], mlp_ratio,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                )(seq, hh, ww)
            seq = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(seq)
            h = seq.reshape(b, hh, ww, dims[stage])
            feats.append(h)

        # all-MLP decoder: project, upsample to 1/4, concat, fuse
        target_hw = feats[0].shape[1:3]
        proj = []
        for f in feats:
            p = nn.Dense(
                self.decoder_dim, dtype=self.dtype, param_dtype=self.param_dtype
            )(f)
            if p.shape[1:3] != target_hw:
                p = jax.image.resize(
                    p, (b, *target_hw, self.decoder_dim), method="bilinear"
                ).astype(self.dtype)
            proj.append(p)
        fused = jnp.concatenate(proj[::-1], axis=-1)
        fused = nn.Conv(
            self.decoder_dim, (1, 1), use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(fused)
        fused = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(fused)
        fused = nn.relu(fused)
        logits = nn.Conv(
            self.classes, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype
        )(fused)
        full = (b, x.shape[1], x.shape[2], self.classes)
        return jax.image.resize(
            logits.astype(jnp.float32), full, method="bilinear"
        )
