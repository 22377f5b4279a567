from deadtrees_tpu.serve.models import PredictionStats, predictionstats_to_str
from deadtrees_tpu.serve.server import SegmentationService, create_app, serve_stdlib

__all__ = [
    "PredictionStats",
    "SegmentationService",
    "create_app",
    "predictionstats_to_str",
    "serve_stdlib",
]
