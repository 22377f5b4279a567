from deadtrees_tpu.core.checkpoint import (
    BestCheckpointKeeper,
    load_checkpoint,
    load_model,
    save_checkpoint,
)

__all__ = [
    "BestCheckpointKeeper",
    "load_checkpoint",
    "load_model",
    "save_checkpoint",
]
