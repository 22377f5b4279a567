from deadtrees_tpu.core.checkpoint import (
    AsyncCheckpointWriter,
    BestCheckpointKeeper,
    load_checkpoint,
    load_model,
    save_checkpoint,
)

__all__ = [
    "AsyncCheckpointWriter",
    "BestCheckpointKeeper",
    "load_checkpoint",
    "load_model",
    "save_checkpoint",
]
