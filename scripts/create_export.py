#!/usr/bin/env python
"""Export a checkpoint as an AOT inference artifact (the ONNX analogue).

Port of /root/reference/scripts/create_onnx.py:10-48: instead of
``model.to_onnx(opset 11, dynamic batch axis)`` this serializes the jitted
uint8→classmap predictor via ``jax.export`` with a symbolic batch dimension
(deadtrees_tpu/infer/export.py).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", type=Path)
    parser.add_argument("outfile", type=Path, nargs="?", default=None)
    parser.add_argument("--image-size", type=int, default=256)
    args = parser.parse_args()

    outfile = args.outfile or args.checkpoint.with_suffix(".dtexp")

    from deadtrees_tpu.infer.export import export_inference

    export_inference(args.checkpoint, outfile, image_size=args.image_size)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
