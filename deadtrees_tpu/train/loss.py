"""Compound-loss configuration and computation.

Mirrors the reference's loss parser and compound loss exactly:

- parser over the ``losses`` config list (GDICE | GWDICE | DICE | FOCAL |
  BOUNDARY | BOUNDARY-RAMPED), /root/reference/deadtrees/network/segmodel.py:113-138;
- GDICE and DICE are mutually exclusive, a dice-family term is required
  (segmodel.py:109-111, 143);
- compound sum dice + (alpha·)boundary + focal (segmodel.py:169-200);
- alpha ramp ``min((epoch + 1) * 0.01, 0.99)`` (segmodel.py:157-160).

Everything here is jit-traceable; the config objects are static pytrees of
plain Python values closed over inside the compiled step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.losses.losses import (
    BoundaryLoss,
    DiceLoss,
    FocalLoss,
    GeneralizedDiceLoss,
    GeneralizedWassersteinDiceLoss,
)

# Default GWDL class-distance matrix (segmodel.py:119)
_GWDL_DIST_MAT = np.array([[0.0, 1.0, 1.0], [1.0, 0.0, 0.5], [1.0, 0.5, 0.0]])


@dataclasses.dataclass(frozen=True)
class CompoundLossConfig:
    """Static description of the compound loss (hashable, jit-safe)."""

    losses: Tuple[str, ...] = ("GDICE", "FOCAL", "BOUNDARY")
    num_classes: int = 3
    initial_alpha: float = 0.01  # segmodel.py:106


class CompoundLoss:
    """Callable computing the reference's compound loss + per-term parts."""

    def __init__(self, config: CompoundLossConfig):
        self.config = config
        names = tuple(config.losses)

        if "GDICE" in names and "DICE" in names:
            raise AssertionError(f"Only GDICE _OR_ DICE allowed {names}")

        classes_int = list(range(config.num_classes))
        classes_wout_bg = [c for c in classes_int if c != 0]

        self.dice_loss = None
        self.dice_is_gwdl = False
        self.focal_loss = None
        self.boundary_loss = None
        self.boundary_ramped = False

        for name in names:
            if name == "GDICE":
                self.dice_loss = GeneralizedDiceLoss()
            elif name == "GWDICE":
                self.dice_loss = GeneralizedWassersteinDiceLoss(
                    dist_matrix=_GWDL_DIST_MAT[: config.num_classes, : config.num_classes]
                )
                self.dice_is_gwdl = True
            elif name == "DICE":
                self.dice_loss = DiceLoss(idc=classes_wout_bg)
            elif name == "FOCAL":
                self.focal_loss = FocalLoss(idc=classes_int, gamma=2)
            elif name in ("BOUNDARY", "BOUNDARY-RAMPED"):
                self.boundary_loss = BoundaryLoss(idc=classes_wout_bg)
                self.boundary_ramped = name == "BOUNDARY-RAMPED"
            else:
                raise NotImplementedError(
                    f"The loss component <{name}> is not recognized"
                )

        # "we require GDICE!" (segmodel.py:142-143)
        assert self.dice_loss is not None

    def alpha(self, epoch: jnp.ndarray) -> jnp.ndarray:
        """Boundary-loss blend: ramps 0.01→0.99 by epoch (segmodel.py:157-160)."""
        return jnp.minimum((epoch + 1) * self.config.initial_alpha, 0.99)

    def __call__(
        self,
        probs: jnp.ndarray,  # softmax(logits), (B, H, W, K)
        target_one_hot: jnp.ndarray,  # (B, H, W, K)
        *,
        logits: Optional[jnp.ndarray] = None,  # needed for GWDICE
        distmap: Optional[jnp.ndarray] = None,  # (B, H, W, K) signed distance
        epoch: jnp.ndarray | int = 0,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        parts: Dict[str, jnp.ndarray] = {}
        loss = jnp.float32(0.0)

        if self.dice_is_gwdl:
            # "hack to make gwdice work" (segmodel.py:176-178): logits +
            # integer target
            loss_gd = self.dice_loss(logits, jnp.argmax(target_one_hot, axis=-1))
        else:
            loss_gd = self.dice_loss(probs, target_one_hot)
        parts["dice_loss"] = loss_gd
        loss = loss + loss_gd

        if self.boundary_loss is not None and distmap is not None:
            loss_bd = self.boundary_loss(probs, distmap)
            parts["boundary_loss"] = loss_bd
            if self.boundary_ramped:
                loss = loss + self.alpha(jnp.asarray(epoch, jnp.float32)) * loss_bd
            else:
                loss = loss + loss_bd

        if self.focal_loss is not None:
            loss_fo = self.focal_loss(probs, target_one_hot)
            parts["focal_loss"] = loss_fo
            loss = loss + loss_fo

        parts["total_loss"] = loss
        return loss, parts


def build_loss(
    losses: Sequence[str], num_classes: int, initial_alpha: float = 0.01
) -> CompoundLoss:
    return CompoundLoss(
        CompoundLossConfig(
            losses=tuple(losses), num_classes=num_classes, initial_alpha=initial_alpha
        )
    )
