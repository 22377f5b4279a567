"""Evaluation CLI (reference /root/reference/eval.py:30-141).

    python eval.py bestmodel=checkpoints/epoch_277.ckpt datamodule=...

Same config surface as run.py but runs only the test loop from the given
checkpoint (``trainer.test(ckpt_path=config.bestmodel)``, eval.py:117-119).

Extra over the reference: ``tta=4`` / ``tta=8`` evaluates with dihedral
test-time augmentation (mean view probabilities; measured +0.010 fg-dice
at tta=8 — PROOFS/tta_accuracy_r3.json) at ~views× device compute.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""


def main() -> None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s: %(message)s"
    )
    from deadtrees_tpu.config import compose, print_config
    from deadtrees_tpu.train.trainer import Trainer
    from deadtrees_tpu.utils import load_envs

    load_envs()

    config_dir = Path(__file__).parent / "configs"
    cfg = compose(config_dir, "config", overrides=sys.argv[1:])
    if cfg.get("print_config", True):
        print_config(cfg)

    ckpt = cfg.get("bestmodel")
    if not ckpt:
        raise SystemExit("eval requires bestmodel=<checkpoint path>")

    trainer = Trainer(cfg)
    trainer._build()
    metrics = trainer.test(ckpt_path=ckpt)
    print(metrics)


if __name__ == "__main__":
    main()
