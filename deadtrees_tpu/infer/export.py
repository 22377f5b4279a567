"""AOT export of the inference function — the ONNX-artifact analogue.

The reference ships serving as an ONNX file with a dynamic batch axis
(/root/reference/scripts/create_onnx.py:31-45, opset 11). The TPU-native
equivalent is a serialized ``jax.export`` StableHLO artifact: the jitted
uint8→classmap predictor (normalize folded in, params baked as constants)
exported with a symbolic batch dimension, loadable without the original
Python model code.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Callable, Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from jax import export as jax_export

from deadtrees_tpu.core.checkpoint import load_model
from deadtrees_tpu.data.augment import normalize
from deadtrees_tpu.data.config import DATASET_CONFIG

log = logging.getLogger(__name__)

_MAGIC = b"DTPUEXP1\n"


def export_inference(
    checkpoint: Union[str, Path],
    outfile: Union[str, Path],
    *,
    image_size: int = 256,
    mean=DATASET_CONFIG.mean,
    std=DATASET_CONFIG.std,
    quantize: bool = False,
) -> None:
    """Checkpoint → serialized AOT artifact with dynamic batch axis.

    ``quantize=True`` bakes int8 per-channel-scaled kernels into the
    artifact (~4× smaller, the int8 serving path — quantize.py);
    dequantization happens inside the exported program."""
    model, variables, hp = load_model(checkpoint)
    in_channels = hp.get("in_channels", 4)
    mean = tuple(mean)[:in_channels]
    std = tuple(std)[:in_channels]
    params, batch_stats = variables["params"], variables["batch_stats"]

    weights_payload = None
    if quantize:
        from deadtrees_tpu.infer.quantize import quantize_params

        # int8 weights travel in the payload (4× smaller artifact); the
        # exported program takes BF16 weights as an ARGUMENT and the
        # loader dequantizes ONCE at load. Dequantizing inside the program
        # measured 3.4× slower (weight prefetch defeated); baking weights
        # as closed-over constants would eagerly fold back to dense f32.
        def predict(p, img_u8):
            img = normalize(img_u8.astype(jnp.float32), mean, std)
            logits = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, train=False
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        weights_payload = serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, quantize_params(params))
        )

    else:

        def predict(img_u8):
            img = normalize(img_u8.astype(jnp.float32), mean, std)
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, img, train=False
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, in_channels), jnp.uint8)
    if quantize:
        from deadtrees_tpu.infer.quantize import (
            dequantize_params,
            quantize_params,
        )

        bf16_params = dequantize_params(
            quantize_params(params), dtype=jnp.bfloat16
        )
        pspec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
            bf16_params,
        )
        exported = jax_export.export(jax.jit(predict))(pspec, spec)
    else:
        exported = jax_export.export(jax.jit(predict))(spec)

    payload = {
        "artifact": exported.serialize(),
        "meta": json.dumps(
            {
                "in_channels": in_channels,
                "image_size": image_size,
                "classes": hp.get("classes", 3),
                "quantized": bool(quantize),
                "hparams": hp,
            }
        ).encode(),
    }
    if weights_payload is not None:
        payload["weights"] = weights_payload
    outfile = Path(outfile)
    outfile.parent.mkdir(parents=True, exist_ok=True)
    with open(outfile, "wb") as f:
        f.write(_MAGIC)
        f.write(serialization.msgpack_serialize(payload))
    log.info(f"Exported inference artifact to {outfile}")


def load_exported(
    path: Union[str, Path]
) -> Tuple[Callable[[np.ndarray], Any], Dict]:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"Not an exported artifact: {path}")
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload["meta"])
    exported = jax_export.deserialize(payload["artifact"])

    if "weights" in payload:  # quantized artifact: int8 weights in payload
        from deadtrees_tpu.infer.quantize import dequantize_params

        # dequantize ONCE at load; the program takes bf16 weight args
        params = jax.device_put(
            dequantize_params(
                serialization.msgpack_restore(payload["weights"]),
                dtype=jnp.bfloat16,
            )
        )

        def fn(img_u8: np.ndarray):
            return exported.call(params, jnp.asarray(img_u8))

    else:

        def fn(img_u8: np.ndarray):
            return exported.call(jnp.asarray(img_u8))

    return fn, meta
