"""Jitted train / eval steps and the train state.

The hot loop of the framework: one compiled XLA program per step doing
forward (bf16 on the MXU), compound loss, backward, gradient all-reduce
(inserted by XLA across the ``data`` mesh axis), clip + Adam + cosine LR,
BatchNorm stat update, and metric computation — the TPU-native equivalent of
the reference's Lightning ``training_step`` + backward + optimizer hooks
(/root/reference/deadtrees/network/segmodel.py:210-229 and Lightning
internals).

Reference semantics preserved:

- softmax before loss (segmodel.py:216-218), one-hot target
  (losses.py:124-141);
- NaN/Inf loss guard skips the optimizer step (segmodel.py:220-222);
- dice metrics = smp Fscore with and without background
  (segmodel.py:145-149, 202-208);
- multistage encoder freeze as a STATIC step variant: with ``frozen=True``
  XLA dead-code-eliminates the whole encoder backward, so frozen epochs are
  cheaper — not just masked (cf. optim.py divergence note).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deadtrees_tpu.core.tpu_opts import tpu_compiler_options
from deadtrees_tpu.losses.functional import class2one_hot
from deadtrees_tpu.losses.metrics import fscore
from deadtrees_tpu.train.loss import CompoundLoss
from deadtrees_tpu.train.optim import encoder_grad_mask


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def replace_tx(self, tx: optax.GradientTransformation) -> "TrainState":
        """Swap in a fresh optimizer (multistage lr-reduce stage,
        reference callbacks/multistage.py:53-72 creates a brand-new Adam)."""
        return self.replace(tx=tx, opt_state=tx.init(self.params))


def _select(pred: jnp.ndarray, a: Any, b: Any) -> Any:
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def make_train_step(
    model,
    loss: CompoundLoss,
    *,
    num_classes: int,
    remat: bool = False,
    frozen_bn: bool = False,
):
    """Build the jitted train step.

    Returns ``train_step(state, batch, epoch, frozen=False)``; ``frozen`` is
    static (two compile-cache entries across a whole run).
    ``batch`` is a dict with 'image' (B,H,W,C) f32, 'mask' (B,H,W) int32 and
    optionally 'distmap' (B,H,W,K) f32.

    ``remat=True`` checkpoints the model forward: the backward recomputes
    activations instead of saving them — trades ~one extra forward for
    the HBM spills a batch-128 step otherwise incurs (see PERF.md r2).

    ``frozen_bn=True`` runs every BatchNorm on its running statistics
    (inference mode) while still training all weights, incl. BN affine
    scale/bias — the net-wide version of what the reference's MultiStage
    freeze stage does to the encoder (callbacks/multistage.py:37-40
    ``encoder.eval()``). This is the standard frozen-BN fine-tuning recipe
    AND a throughput mode: without batch-stat computation XLA drops one
    full read pass per BN site in the forward and the normalization-stat
    chain from the backward (PERF.md r3). ``batch_stats`` pass through
    unchanged, so a frozen-BN stage composes with resume/checkpointing.
    """

    @partial(
        jax.jit,
        static_argnames=("frozen",),
        donate_argnums=(0,),
        # measured-win TPU flags (core/tpu_opts.py); None off-TPU
        compiler_options=tpu_compiler_options(),
    )
    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        epoch: jnp.ndarray,
        frozen: bool = False,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        img = batch["image"]
        mask = batch["mask"]
        distmap = batch.get("distmap")

        def forward(params, img):
            if frozen_bn:
                # no dropout anywhere in the model zoo, so train=False only
                # switches BN to running stats; grads still flow through the
                # BN affine params. No mutable collection -> stats untouched.
                logits = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    img,
                    train=False,
                )
                return logits, {"batch_stats": state.batch_stats}
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img,
                train=True,
                encoder_train=not frozen,
                mutable=["batch_stats"],
            )

        if remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            logits, mut = forward(params, img)
            y = class2one_hot(mask, num_classes)
            probs = jax.nn.softmax(logits, axis=-1)
            total, parts = loss(
                probs, y, logits=logits, distmap=distmap, epoch=epoch
            )
            return total, (parts, mut["batch_stats"], probs, y)

        (total, (parts, new_bs, probs, y)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if frozen:
            grads = encoder_grad_mask(grads, jnp.bool_(True))

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        # NaN/Inf guard: keep old state when the loss is not finite
        finite = jnp.isfinite(total)
        new_state = state.replace(
            step=state.step + 1,
            params=_select(finite, new_params, state.params),
            batch_stats=_select(finite, new_bs, state.batch_stats),
            opt_state=_select(finite, new_opt_state, state.opt_state),
        )

        metrics = dict(parts)
        metrics["dice"] = fscore(probs, y, ignore_channels=[0])
        metrics["dice_with_bg"] = fscore(probs, y)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model, loss: CompoundLoss, *, num_classes: int, tta: int = 0):
    """Build the jitted eval step.

    Returns per-batch metrics plus unnormalized confusion-matrix counts
    (overall and forest-masked via the ``lu`` layer) that the eval loop sums
    on host — the jit-friendly version of the reference's epoch-end concat +
    torchmetrics CM (segmodel.py:291-335).

    ``tta`` (0/4/8): dihedral test-time-augmentation views (infer/tta.py) —
    metrics come from the mean view probabilities (~views× compute; measured
    +0.010 fg-dice at tta=8, PROOFS/tta_accuracy_r3.json). Loss parts that
    need raw scores (GWDICE) get log-probabilities, which preserve argmax
    and ordering.
    """

    @partial(jax.jit, compiler_options=tpu_compiler_options())
    def eval_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], epoch: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        img = batch["image"]
        mask = batch["mask"]
        distmap = batch.get("distmap")
        lu = batch.get("lu")

        def logits_fn(x):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x,
                train=False,
            )

        y = class2one_hot(mask, num_classes)
        if tta:
            from deadtrees_tpu.infer.tta import make_tta_fn

            probs = make_tta_fn(logits_fn, views=tta)(img)
            logits = jnp.log(jnp.clip(probs, 1e-7, 1.0))
        else:
            logits = logits_fn(img)
            probs = jax.nn.softmax(logits, axis=-1)
        total, parts = loss(probs, y, logits=logits, distmap=distmap, epoch=epoch)

        pred = jnp.argmax(probs, axis=-1)
        t = mask.reshape(-1).astype(jnp.int32)
        p = pred.reshape(-1).astype(jnp.int32)
        idx = t * num_classes + p
        cm = jnp.bincount(idx, length=num_classes * num_classes).reshape(
            num_classes, num_classes
        )

        out = dict(parts)
        out["dice"] = fscore(probs, y, ignore_channels=[0])
        out["dice_with_bg"] = fscore(probs, y)
        out["cm"] = cm
        if lu is not None:
            sel = lu.reshape(-1) == 1
            idx_m = jnp.where(sel, idx, num_classes * num_classes)
            out["cm_masked"] = jnp.bincount(
                idx_m, length=num_classes * num_classes + 1
            )[:-1].reshape(num_classes, num_classes)
        return out

    return eval_step


def make_predict_step(model, *, return_probs: bool = True):
    """Jitted inference: images -> argmax classes (+ probabilities).

    ``return_probs=False`` skips materializing the softmax entirely
    (argmax(logits) == argmax(softmax(logits))) — at 512² batch-128 the
    probability tensor alone is ~400 MB of HBM writes per call.
    """

    # NOTE: no compiler_options here — these steps get nested inside
    # top-level serving jits (bench.py, profile_step.py) which carry the
    # TPU flags themselves, and JAX rejects options on a nested jit.
    @jax.jit
    def predict_step(
        params: Any, batch_stats: Any, img: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, train=False
        )
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.argmax(probs, axis=-1), probs

    @jax.jit
    def predict_step_classes(
        params: Any, batch_stats: Any, img: jnp.ndarray
    ) -> jnp.ndarray:
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, train=False
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    return predict_step if return_probs else predict_step_classes
