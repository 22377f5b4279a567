from deadtrees_tpu.infer.blocks import (
    make_blocks_chw,
    make_blocks_nhwc,
    unmake_blocks_chw,
    unmake_blocks_nhwc,
)
from deadtrees_tpu.infer.engine import (
    EnsembleInference,
    ExportedInference,
    Inference,
    JaxInference,
)
from deadtrees_tpu.infer.sliding import make_scene_predictor, predict_scene
from deadtrees_tpu.infer.tta import make_tta_fn
from deadtrees_tpu.infer.tiler import (
    TileInfo,
    Tiler,
    divisible_without_remainder,
    inspect_tile,
)

__all__ = [
    "EnsembleInference",
    "ExportedInference",
    "Inference",
    "JaxInference",
    "TileInfo",
    "Tiler",
    "divisible_without_remainder",
    "inspect_tile",
    "make_blocks_chw",
    "make_blocks_nhwc",
    "make_scene_predictor",
    "make_tta_fn",
    "predict_scene",
    "unmake_blocks_chw",
    "unmake_blocks_nhwc",
]
