"""Optimizer, LR schedule, and multistage freeze/unfreeze.

Reference semantics re-expressed functionally:

- Adam lr 3e-4 + ``CosineAnnealingLR(T_max=10)`` stepped per EPOCH
  (/root/reference/deadtrees/network/segmodel.py:420-429,
  configs/model/default.yaml:12-13);
- gradient clipping by global norm 0.5 (configs/trainer/default.yaml:18 via
  Lightning's default clip algorithm);
- MultiStage (callbacks/multistage.py:10-73, configs/callbacks/default.yaml:29-33):
  freeze encoder until ``unfreeze_epoch`` (20), then at ``lr_reduce_epoch``
  (40) swap in a FRESH Adam with lr/``lr_reduce_fraction`` (3). Here the
  freeze is a gradient mask inside the compiled step (no trainer mutation),
  and the optimizer swap is a host-side opt-state re-init at the epoch
  boundary — same observable behavior, no recompilation.

  NOTE (documented divergence): the reference's freeze is a no-op bug — it
  assigns ``m.requires_grad_ = False`` (an attribute) instead of CALLING
  ``requires_grad_(False)`` (multistage.py:39-40,46-47), so only
  ``encoder.eval()`` ever took effect. We implement the evidently intended
  behavior (true freeze + encoder BN eval) and keep it off by default unless
  the multistage callback is configured, exactly like the reference config.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 3e-4
    cosineannealing_tmax: int = 10  # epochs per half-cosine
    gradient_clip_val: float = 0.5
    steps_per_epoch: int = 1  # OPTIMIZER updates per epoch (micro-steps/k)
    eta_min: float = 0.0
    # Lightning Trainer(accumulate_grad_batches=k): average grads over k
    # micro-batches, apply one optimizer update — effective batch k× what
    # fits in HBM (bs>128 compile-OOMs on v5e at 256², PERF.md r3)
    accumulate_grad_batches: int = 1


@dataclasses.dataclass(frozen=True)
class MultiStageConfig:
    unfreeze_epoch: int = 20
    lr_reduce_epoch: Optional[int] = 40
    lr_reduce_fraction: Optional[float] = 3.0


def cosine_annealing_schedule(config: OptimizerConfig, base_lr: float):
    """torch ``CosineAnnealingLR`` closed form, stepped per epoch:

    lr(e) = eta_min + (lr0 - eta_min) * (1 + cos(pi * e / T_max)) / 2

    (continues past T_max, oscillating with period 2*T_max, like torch).
    """

    def schedule(step):
        epoch = step // config.steps_per_epoch
        cos = jnp.cos(jnp.pi * epoch / config.cosineannealing_tmax)
        return config.eta_min + (base_lr - config.eta_min) * (1.0 + cos) / 2.0

    return schedule


def make_optimizer(
    config: OptimizerConfig, *, lr_scale: float = 1.0
) -> optax.GradientTransformation:
    """clip-by-global-norm → Adam with per-epoch cosine annealing.

    With ``accumulate_grad_batches=k > 1`` the whole chain wraps in
    ``optax.MultiSteps``: micro-step gradients accumulate (mean) and the
    inner chain — including the clip, which therefore acts on the
    FULL-batch gradient like a real big batch — applies every k-th step.
    The cosine schedule's step count ticks once per applied update, so
    ``steps_per_epoch`` must already be expressed in optimizer updates
    (the Trainer divides by k)."""
    schedule = cosine_annealing_schedule(config, config.learning_rate * lr_scale)
    tx = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip_val),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    k = int(getattr(config, "accumulate_grad_batches", 1) or 1)
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k).gradient_transformation()
    return tx


def encoder_grad_mask(grads: Any, frozen: jnp.ndarray) -> Any:
    """Zero the ``encoder`` subtree of a gradient pytree when ``frozen``.

    ``frozen`` is a traced boolean so stage switches don't recompile the
    train step. Adam moments for the frozen subtree decay toward zero during
    the freeze, which matches a freshly-thawed optimizer closely enough.
    """
    if "encoder" not in grads:
        return grads
    factor = jnp.where(frozen, 0.0, 1.0)
    masked = jax.tree_util.tree_map(lambda g: g * factor, grads["encoder"])
    return {**grads, "encoder": masked}
