from deadtrees_tpu.train.loss import CompoundLoss, CompoundLossConfig, build_loss
from deadtrees_tpu.train.optim import (
    MultiStageConfig,
    OptimizerConfig,
    cosine_annealing_schedule,
    make_optimizer,
)
from deadtrees_tpu.train.steps import (
    TrainState,
    make_eval_step,
    make_predict_step,
    make_train_step,
)

__all__ = [
    "CompoundLoss",
    "CompoundLossConfig",
    "MultiStageConfig",
    "OptimizerConfig",
    "TrainState",
    "build_loss",
    "cosine_annealing_schedule",
    "make_eval_step",
    "make_optimizer",
    "make_predict_step",
    "make_train_step",
]
