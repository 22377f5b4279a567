from deadtrees_tpu.losses.functional import (
    class2one_hot,
    one_hot2dist,
    probs2class,
    probs2one_hot,
)
from deadtrees_tpu.losses.losses import (
    BoundaryLoss,
    CrossEntropy,
    DiceLoss,
    FocalLoss,
    GeneralizedDice,
    GeneralizedDiceLoss,
    GeneralizedWassersteinDiceLoss,
    SurfaceLoss,
)
from deadtrees_tpu.losses.metrics import (
    confusion_matrix,
    dice_score,
    fscore,
)

__all__ = [
    "class2one_hot",
    "one_hot2dist",
    "probs2class",
    "probs2one_hot",
    "BoundaryLoss",
    "CrossEntropy",
    "DiceLoss",
    "FocalLoss",
    "GeneralizedDice",
    "GeneralizedDiceLoss",
    "GeneralizedWassersteinDiceLoss",
    "SurfaceLoss",
    "confusion_matrix",
    "dice_score",
    "fscore",
]
