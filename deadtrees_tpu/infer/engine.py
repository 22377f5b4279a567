"""Inference engines: single-model, ensemble mode-vote, AOT-exported.

Counterpart of the engine hierarchy in
/root/reference/deadtrees/deployment/inference.py:14-143:

- :class:`JaxInference` ≙ ``PyTorchInference``: load checkpoint, sniff the
  channel count from the first conv kernel (reference sniffs the first
  weight, inference.py:42), RGBN→RGB slicing when a 3-channel model gets
  4-band input (inference.py:57-59), jit-compiled batched argmax prediction;
- :class:`EnsembleInference` ≙ ``PyTorchEnsembleInference``: odd-N majority
  vote — the reference's ``torch.mode`` over stacked argmaxes
  (inference.py:116) becomes an on-device one-hot sum + argmax (vmapped over
  stacked parameter pytrees, one compiled program for the whole ensemble);
- :class:`ExportedInference` ≙ ``ONNXInference``: runs an AOT-serialized
  artifact from ``jax.export`` (export.py) — the ONNX analogue.

Engines accept NHWC uint8/float arrays; normalization happens inside the
compiled function (val_transform semantics, deadtreedata.py:148-154).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Sequence, Union

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.core.checkpoint import load_model
from deadtrees_tpu.core.tpu_opts import tpu_compiler_options
from deadtrees_tpu.data.augment import normalize
from deadtrees_tpu.data.config import DATASET_CONFIG

log = logging.getLogger(__name__)


def _sniff_in_channels(params, hparams: Optional[dict] = None) -> int:
    """Channel count: from hparams when present, else the encoder STEM conv
    kernel (HWIO layout). The reference sniffs the first weight of the state
    dict (inference.py:42); a flax tree iterates alphabetically, so we look
    up the stem by name ('Conv_0' in both encoder families) rather than
    taking whatever kernel comes first."""
    if hparams and "in_channels" in hparams:
        return int(hparams["in_channels"])
    enc = params.get("encoder", params)
    stem = enc.get("Conv_0")
    if stem is not None and "kernel" in stem:
        return int(stem["kernel"].shape[2])
    # fallback: the 4-D kernel with the smallest input-channel dim
    leaves = [
        leaf
        for _, leaf in jax.tree_util.tree_leaves_with_path(enc)
        if getattr(leaf, "ndim", 0) == 4
    ]
    if not leaves:
        raise ValueError("Could not sniff input channels from params")
    return int(min(leaf.shape[2] for leaf in leaves))


class Inference:
    """ABC surface matching the reference (inference.py:14-27)."""

    def run(self, batch: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class JaxInference(Inference):
    def __init__(
        self,
        checkpoint: Union[str, Path],
        *,
        mean: Sequence[float] = DATASET_CONFIG.mean,
        std: Sequence[float] = DATASET_CONFIG.std,
        fused_decoder: Union[bool, str] = False,
        quantized: Union[bool, str] = False,
        quant_sites: Sequence[str] = ("y",),
        tta: Union[bool, int] = False,
    ):
        """``fused_decoder`` (efficientunet++ checkpoints only) routes the
        decoder through Pallas kernels with BatchNorms folded at load:

        - ``"auto"``: batch-size-aware — requests with ≤32 images run the
          CHW W-in-lanes kernels (measured over flax at 512²: 1.42× at
          bs=4, 1.25× at 8, 1.20× at 16, 1.19× at 32 — PERF.md r3;
          per-image grids pay off exactly when the batch can't fill
          XLA's batch-minor layouts), larger batches take the flax/XLA
          path (fastest at bs=128). The serving API uses this.
        - ``"chw"`` (or ``True``, the historical spelling) / ``"nhwc"``:
          force one kernel family. CHW is the small-batch winner; the
          NHWC fat-cell kernel measured 0.71× vs flax at bs=128
          (ops/fused_cell.py) and exists for layout experiments.

        Argmax-equivalent to the flax path in every mode.

        ``quantized=True`` (or ``"w8"``) round-trips kernels through
        per-channel int8 ONCE at load time and then runs the normal
        bf16/f32 program — it simulates serving from a 4× smaller int8
        artifact (the footprint win lives in export.py's ``quantize=``
        payload) and measures the accuracy delta (tests/test_quantize.py).
        It does NOT keep int8 weights in HBM: in-graph dequantization was
        measured 3.4× slower (defeats XLA weight prefetch) and rejected.

        ``quantized="w8a8"`` (efficientunet++ checkpoints) additionally
        stores the decoder's intra-block ACTIVATIONS as int8 in HBM with
        per-channel scales calibrated on the FIRST batch passed to
        :meth:`run` (infer/act_quant.py) — the bandwidth-bound decoder
        passes move 4× fewer bytes. ``quant_sites`` selects which of the
        three intra-block activations (y = post-expand, h = post-dw,
        s = post-SCSE) are stored int8: the default single-site ``("y",)``
        meets the ≥99.5% argmax-agreement serving bar on a converged
        model (0.9960; full ``("y", "h", "s")`` = max byte savings at
        0.9924 — PROOFS/w8a8_accuracy_r3.json)."""
        _fused_choices = (False, True, "", "auto", "chw", "nhwc")
        if fused_decoder not in _fused_choices:
            raise ValueError(
                f"fused_decoder={fused_decoder!r}; expected one of "
                f"{_fused_choices}"
            )
        if quantized not in (False, True, "", "w8", "w8a8"):
            raise ValueError(
                f"quantized={quantized!r}; expected False, True ('w8'), "
                "'w8' or 'w8a8'"
            )
        if quantized == "w8a8" and fused_decoder:
            raise ValueError(
                "quantized='w8a8' runs its own folded-decoder program; "
                "it cannot be combined with fused_decoder"
            )
        bad_sites = set(quant_sites) - {"y", "h", "s"}
        if bad_sites:
            raise ValueError(f"unknown quant_sites {sorted(bad_sites)}")
        if tta not in (False, 0, True, 4, 8):
            raise ValueError(f"tta={tta!r}; expected False, True (8), 4 or 8")
        if tta and (fused_decoder or quantized == "w8a8"):
            raise ValueError(
                "tta composes with the standard predict path only "
                "(not fused_decoder / quantized='w8a8')"
            )
        self.tta_views = 8 if tta is True else int(tta)
        self.model, self.variables, self.hparams = load_model(checkpoint)
        self.in_channels = _sniff_in_channels(self.variables["params"], self.hparams)
        mean = tuple(mean)[: self.in_channels]
        std = tuple(std)[: self.in_channels]

        model = self.model
        self.quantized = quantized
        if quantized in (True, "w8", "w8a8"):
            # int8 is a STORAGE format: round-trip the weights through
            # per-channel int8 once at load (simulating an int8 artifact)
            # and run the normal bf16/f32 predict program. Dequantizing
            # inside the compiled program instead measured 3.4× SLOWER
            # (90 vs 305 tiles/s at bs=128/512²): computed weights defeat
            # XLA's weight prefetching and constant layouts.
            from deadtrees_tpu.infer.quantize import (
                dequantize_params,
                quantize_params,
            )

            self.variables = {
                "params": jax.device_put(
                    dequantize_params(
                        quantize_params(self.variables["params"]),
                        dtype=jnp.bfloat16,
                    )
                ),
                "batch_stats": self.variables["batch_stats"],
            }

        self._scales = None  # w8a8: calibrated on the first run() batch
        if quantized == "w8a8":
            from deadtrees_tpu.infer.act_quant import (
                calibrate_decoder,
                make_int8_block_fn,
            )
            from deadtrees_tpu.ops.fused_decoder import (
                apply_head,
                encode_features,
                fold_effunetpp_decoder,
                fused_decoder_nhwc,
            )

            folded = fold_effunetpp_decoder(self.variables)
            dc = tuple(self.model.decoder_channels)

            @partial(jax.jit, compiler_options=tpu_compiler_options())
            def _calibrate(params, batch_stats, img_u8):
                img = normalize(img_u8.astype(jnp.float32), mean, std)
                feats = encode_features(
                    model, {"params": params, "batch_stats": batch_stats}, img
                )
                return calibrate_decoder(feats, folded, dc)

            @partial(jax.jit, compiler_options=tpu_compiler_options())
            def _predict(params, batch_stats, scales, img_u8):
                img = normalize(img_u8.astype(jnp.float32), mean, std)
                variables = {"params": params, "batch_stats": batch_stats}
                feats = encode_features(model, variables, img)
                decoded = fused_decoder_nhwc(
                    feats, folded, dc,
                    block_fn=make_int8_block_fn(
                        scales, sites=frozenset(quant_sites)
                    ),
                )
                logits = apply_head(variables, decoded)
                return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

            self._calibrate = _calibrate
            self._predict_w8a8 = _predict
            _predict = None  # run() routes through the w8a8 pair

        elif fused_decoder:
            from deadtrees_tpu.ops.fused_decoder import (
                fold_effunetpp_decoder,
                fused_forward,
            )

            folded = fold_effunetpp_decoder(self.variables)
            interp = jax.devices()[0].platform != "tpu"
            # True keeps its historical meaning: the CHW W-in-lanes
            # kernels (the measured small-batch win); NHWC is opt-in.
            layout = "nhwc" if fused_decoder == "nhwc" else "chw"
            auto = fused_decoder == "auto"

            @partial(jax.jit, compiler_options=tpu_compiler_options())
            def _predict(params, batch_stats, img_u8):
                img = normalize(img_u8.astype(jnp.float32), mean, std)
                variables = {"params": params, "batch_stats": batch_stats}
                # shapes are static under jit: each batch size traces its
                # own program, so this branch is resolved at compile time
                if auto and img_u8.shape[0] > 32:
                    logits = model.apply(variables, img, train=False)
                else:
                    logits = fused_forward(
                        model, variables, folded, img,
                        interpret=interp,
                        layout=layout,
                    )
                return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        elif self.tta_views:
            from deadtrees_tpu.infer.tta import make_tta_fn

            views = self.tta_views

            @partial(jax.jit, compiler_options=tpu_compiler_options())
            def _predict(params, batch_stats, img_u8):
                img = normalize(img_u8.astype(jnp.float32), mean, std)

                def logits_fn(x):
                    return model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        x, train=False,
                    )

                probs = make_tta_fn(logits_fn, views)(img)
                return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

        else:

            @partial(jax.jit, compiler_options=tpu_compiler_options())
            def _predict(params, batch_stats, img_u8):
                img = normalize(img_u8.astype(jnp.float32), mean, std)
                logits = model.apply(
                    {"params": params, "batch_stats": batch_stats}, img, train=False
                )
                probs = jax.nn.softmax(logits, axis=-1)
                return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

        self._predict = _predict

    def _slice_channels(self, batch: np.ndarray) -> np.ndarray:
        # RGBN checkpoint trained on 3 channels: drop NIR (inference.py:57-59)
        if batch.shape[-1] > self.in_channels:
            batch = batch[..., : self.in_channels]
        return batch

    def run(self, batch: np.ndarray) -> np.ndarray:
        """(B, H, W, C) uint8 → (B, H, W) uint8 class map."""
        batch = self._slice_channels(np.asarray(batch))
        if self.quantized == "w8a8":
            if self._scales is None:
                # post-training calibration on (a slice of) the first
                # served batch — the full-bs calibration program can
                # exceed HBM at flagship scale
                self._scales = jax.tree_util.tree_map(
                    jnp.asarray,
                    self._calibrate(
                        self.variables["params"],
                        self.variables["batch_stats"], batch[:32],
                    ),
                )
            return np.asarray(
                self._predict_w8a8(
                    self.variables["params"], self.variables["batch_stats"],
                    self._scales, batch,
                )
            )
        return np.asarray(
            self._predict(
                self.variables["params"], self.variables["batch_stats"], batch
            )
        )


class EnsembleInference(Inference):
    """Odd-N majority vote over model checkpoints.

    The reference loads N arbitrary checkpoints and modes their argmaxes
    (inference.py:65-116). Two execution strategies:

    - all members share hparams (the common case): the N parameter sets
      are stacked and the whole ensemble runs as ONE vmapped compiled
      program — a single dispatch per batch;
    - mixed architectures/encoders: each member runs its own jitted
      predict (sequential dispatches, reference semantics) and the votes
      are summed on host. Members must agree on ``classes``.
    """

    def __init__(
        self,
        checkpoints: Sequence[Union[str, Path]],
        *,
        mean: Sequence[float] = DATASET_CONFIG.mean,
        std: Sequence[float] = DATASET_CONFIG.std,
    ):
        if len(checkpoints) % 2 != 1:
            raise ValueError(
                f"Ensemble inference expects odd number of models, got {len(checkpoints)}"
            )
        models, variables_list = [], []
        for c in checkpoints:
            m, v, hp = load_model(c)
            models.append((m, hp))
            variables_list.append(v)
        hp0 = models[0][1]
        self.homogeneous = all(hp == hp0 for _, hp in models[1:])
        self.model = models[0][0]
        self.hparams = hp0
        self.num_classes = hp0.get("classes", 3)
        for _, hp in models[1:]:
            if hp.get("classes", 3) != self.num_classes:
                raise ValueError(
                    "Ensemble members must agree on `classes` "
                    f"({[h.get('classes', 3) for _, h in models]})"
                )
        self.in_channels = _sniff_in_channels(variables_list[0]["params"], hp0)

        if self.homogeneous:
            mean_h = tuple(mean)[: self.in_channels]
            std_h = tuple(std)[: self.in_channels]
            self.stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *variables_list
            )
            model = self.model
            k = self.num_classes

            @partial(jax.jit, compiler_options=tpu_compiler_options())
            def _predict(stacked_vars, img_u8):
                img = normalize(img_u8.astype(jnp.float32), mean_h, std_h)

                def single(variables):
                    logits = model.apply(variables, img, train=False)
                    return jnp.argmax(logits, axis=-1)

                preds = jax.vmap(single)(stacked_vars)  # (M, B, H, W)
                votes = jax.nn.one_hot(preds, k, dtype=jnp.int32).sum(axis=0)
                # torch.mode returns the SMALLEST mode on ties; argmax picks
                # the first maximum, which is the same class index ordering.
                # NOTE: vmapped convs may differ from the unvmapped program
                # by an ulp, so pixels whose top-2 logits are near-tied can
                # vote differently than a single-model run — observed at
                # O(1e-4) of pixels; inherent to batched-vs-loop fp
                # lowering, not a bug.
                return jnp.argmax(votes, axis=-1).astype(jnp.uint8)

            self._predict = _predict
        else:
            # Heterogeneous fallback: one JaxInference per member. Slower
            # (N dispatches) but matches the reference's anything-goes
            # member loading. in_channels may differ per member; run()
            # slices per member, so keep the WIDEST input here.
            del variables_list  # don't hold N param sets across the re-load
            self._members = [
                JaxInference(c, mean=mean, std=std) for c in checkpoints
            ]
            self.in_channels = max(m.in_channels for m in self._members)

    def run(self, batch: np.ndarray) -> np.ndarray:
        batch = np.asarray(batch)
        if batch.shape[-1] > self.in_channels:
            batch = batch[..., : self.in_channels]
        if self.homogeneous:
            return np.asarray(self._predict(self.stacked, batch))
        votes = np.zeros(batch.shape[:3] + (self.num_classes,), np.int32)
        classes = np.arange(self.num_classes)
        for member in self._members:
            preds = member.run(batch)  # member slices its own channels
            votes += (preds[..., None] == classes).astype(np.int32)
        return np.argmax(votes, axis=-1).astype(np.uint8)


class ExportedInference(Inference):
    """Runs a serialized jax.export artifact (the ONNX analogue)."""

    def __init__(self, artifact: Union[str, Path]):
        from deadtrees_tpu.infer.export import load_exported

        self._fn, self.meta = load_exported(artifact)
        self.in_channels = self.meta.get("in_channels", 4)

    def run(self, batch: np.ndarray) -> np.ndarray:
        batch = np.asarray(batch)
        if batch.shape[-1] > self.in_channels:
            batch = batch[..., : self.in_channels]
        return np.asarray(self._fn(batch.astype(np.uint8)))
