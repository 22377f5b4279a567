from deadtrees_tpu.models.factory import (
    ARCHITECTURES,
    SegmentationModel,
    canonical_architecture,
    create_model,
    init_model,
)
from deadtrees_tpu.models.encoders import ENCODERS, get_encoder

__all__ = [
    "ARCHITECTURES",
    "ENCODERS",
    "SegmentationModel",
    "canonical_architecture",
    "create_model",
    "get_encoder",
    "init_model",
]
