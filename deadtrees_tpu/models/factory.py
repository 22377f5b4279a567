"""Model assembly and architecture dispatch.

Counterpart of the reference's architecture switch
(/root/reference/deadtrees/network/segmodel.py:61-75) and the smp
``SegmentationModel`` pattern (encoder → decoder → segmentation head, e.g.
/root/reference/deadtrees/network/extra/efficientunetplusplus/model.py:55-100),
re-designed as a single Flax module in NHWC with a bf16-compute / f32-param
precision policy.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from deadtrees_tpu.models import decoders as dec
from deadtrees_tpu.models.blocks import SegmentationHead
from deadtrees_tpu.models.encoders import get_encoder

Dtype = Any

ARCHITECTURES = (
    "unet",
    "unetplusplus",
    "resunet",
    "resunetplusplus",
    "efficientunetplusplus",
    "segformer",  # stretch: transformer segmentation (BASELINE config 5)
)

_ALIASES = {
    "unet++": "unetplusplus",
    "resunet++": "resunetplusplus",
    "efficientunet++": "efficientunetplusplus",
}


def canonical_architecture(name: str) -> str:
    key = name.lower().strip()
    key = _ALIASES.get(key, key)
    if key not in ARCHITECTURES:
        raise NotImplementedError(
            "Currently only Unet, ResUnet, Unet++, ResUnet++, "
            "EfficientUnet++, and SegFormer architectures are supported"
        )
    return key


class SegmentationModel(nn.Module):
    """Encoder + decoder + segmentation head producing per-class logits.

    ``__call__`` maps (B, H, W, in_channels) NHWC input to (B, H, W, classes)
    f32 logits. ``train=True`` enables BatchNorm stat updates (caller must
    handle the ``batch_stats`` mutable collection).
    """

    architecture: str = "efficientunetplusplus"
    encoder_name: str = "timm-efficientnet-b5"
    encoder_weights: Optional[str] = None
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    in_channels: int = 4
    classes: int = 3
    decoder_attention_type: Optional[str] = None
    squeeze_ratio: int = 1
    expansion_ratio: int = 1
    # EfficientNet forward-convention selectors (None = family default);
    # see docs/encoder_audit.md and scripts/parity_vs_reference.py
    encoder_bn_eps: Optional[float] = None
    encoder_pad_type: Optional[str] = None
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, encoder_train: bool = True
    ) -> jnp.ndarray:
        """``encoder_train=False`` keeps encoder BatchNorm in inference mode
        even when ``train=True`` — the multistage freeze stage (reference
        callbacks/multistage.py:37-40 calls ``encoder.eval()`` during the
        frozen epochs)."""
        arch = canonical_architecture(self.architecture)
        x = x.astype(self.dtype)

        encoder, _ = get_encoder(
            self.encoder_name,
            in_channels=self.in_channels,
            weights=self.encoder_weights,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            module_name="encoder",
            bn_eps=self.encoder_bn_eps,
            pad_type=self.encoder_pad_type,
        )
        features = encoder(x, train and encoder_train)

        common = dict(
            decoder_channels=tuple(self.decoder_channels),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if arch == "unet":
            decoded = dec.UnetDecoder(
                attention_type=self.decoder_attention_type, name="decoder", **common
            )(features, train)
            head_kernel = 3
        elif arch == "unetplusplus":
            decoded = dec.UnetPlusPlusDecoder(
                attention_type=self.decoder_attention_type, name="decoder", **common
            )(features, train)
            head_kernel = 3
        elif arch == "resunet":
            decoded = dec.ResUnetDecoder(
                attention_type=self.decoder_attention_type, name="decoder", **common
            )(features, train)
            head_kernel = 1  # resunet/model.py:92
        elif arch == "resunetplusplus":
            decoded = dec.ResUnetPlusPlusDecoder(
                attention_type=self.decoder_attention_type, name="decoder", **common
            )(features, train)
            head_kernel = 1  # resunetplusplus/model.py:94
        else:  # efficientunetplusplus
            decoded = dec.EfficientUnetPlusPlusDecoder(
                squeeze_ratio=self.squeeze_ratio,
                expansion_ratio=self.expansion_ratio,
                name="decoder",
                **common,
            )(features, train)
            head_kernel = 3  # efficientunetplusplus/model.py:89

        return SegmentationHead(
            classes=self.classes,
            kernel_size=head_kernel,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="segmentation_head",
        )(decoded)


def create_model(
    architecture: str = "efficientunetplusplus",
    encoder_name: str = "timm-efficientnet-b5",
    *,
    encoder_weights: Optional[str] = None,
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16),
    in_channels: int = 4,
    classes: int = 3,
    decoder_attention_type: Optional[str] = None,
    encoder_bn_eps: Optional[float] = None,
    encoder_pad_type: Optional[str] = None,
    encoder_options: Optional[dict] = None,
    dtype: Dtype = jnp.bfloat16,
    param_dtype: Dtype = jnp.float32,
    **_ignored,
):
    """Architecture-string dispatch (reference segmodel.py:61-75, plus the
    SegFormer stretch).

    ``encoder_options`` is the dict form of the convention knobs (same
    spelling :func:`deadtrees_tpu.models.get_encoder` takes:
    ``{"bn_eps": ..., "pad_type": ...}``); explicit ``encoder_bn_eps`` /
    ``encoder_pad_type`` win over it. It must be first-class here — the
    trailing ``**_ignored`` (needed so whole hparams dicts round-trip)
    would otherwise swallow it silently, which masked a real pad-type
    mismatch until the torch-export oracle caught it
    (tests/test_onnx_torch_export_oracle.py, TF-SAME flagship).
    """
    if encoder_options:
        if encoder_bn_eps is None:
            encoder_bn_eps = encoder_options.get("bn_eps")
        if encoder_pad_type is None:
            encoder_pad_type = encoder_options.get("pad_type")
    arch = canonical_architecture(architecture)
    if arch == "segformer":
        from deadtrees_tpu.models.segformer import SegFormer

        return SegFormer(
            encoder_name=(
                encoder_name if encoder_name.lower().startswith("mit") else "mit-b0"
            ),
            in_channels=in_channels,
            classes=classes,
            dtype=dtype,
            param_dtype=param_dtype,
        )
    return SegmentationModel(
        architecture=canonical_architecture(architecture),
        encoder_name=encoder_name,
        encoder_weights=encoder_weights,
        decoder_channels=tuple(decoder_channels),
        in_channels=in_channels,
        classes=classes,
        decoder_attention_type=decoder_attention_type,
        encoder_bn_eps=encoder_bn_eps,
        encoder_pad_type=encoder_pad_type,
        dtype=dtype,
        param_dtype=param_dtype,
    )


def init_model(
    model: SegmentationModel,
    rng: jax.Array,
    *,
    image_size: int = 256,
    batch_size: int = 1,
) -> dict:
    """Initialize model variables ({'params', 'batch_stats'})."""
    dummy = jnp.zeros(
        (batch_size, image_size, image_size, model.in_channels), jnp.float32
    )
    return model.init(rng, dummy, train=False)
