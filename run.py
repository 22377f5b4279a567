"""Training CLI (reference /root/reference/run.py:11-35).

    python run.py model=unet trainer.max_epochs=50 mode=debug

Composes the Hydra-style config tree from ./configs, loads .env, pretty
prints the config, creates a timestamped run dir, and calls train().
"""

from __future__ import annotations

import datetime
import logging
import os
import sys
from pathlib import Path

# axon plugin registers as 'tpu'; profile-exported JAX_PLATFORMS=axon breaks
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""


def main() -> None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s: %(message)s"
    )
    from deadtrees_tpu.config import compose, print_config
    from deadtrees_tpu.train.trainer import train
    from deadtrees_tpu.utils import load_envs

    load_envs()  # .env bootstrap (reference run.py:8 load_envs)

    config_dir = Path(__file__).parent / "configs"
    cfg = compose(config_dir, "config", overrides=sys.argv[1:])

    now = datetime.datetime.now()
    run_dir = (
        Path(cfg.get("run_dir", "logs/runs"))
        / now.strftime("%Y-%m-%d")
        / now.strftime("%H-%M-%S")
    )
    run_dir.mkdir(parents=True, exist_ok=True)

    if cfg.get("print_config", True):
        print_config(cfg, save_path=run_dir / "config_tree.log")

    result = train(cfg, work_dir=run_dir)
    print(result)


if __name__ == "__main__":
    main()
