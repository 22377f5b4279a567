"""Package-level train/eval CLI entries (shared by run.py, eval.py, and
``python -m deadtrees_tpu train|eval``)."""

from __future__ import annotations

import datetime
import logging
from pathlib import Path
from typing import Optional, Sequence


def _compose(overrides: Sequence[str], config_dir: Optional[Path] = None):
    from deadtrees_tpu.config import compose
    from deadtrees_tpu.utils import load_envs

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    load_envs()
    config_dir = config_dir or Path.cwd() / "configs"
    return compose(config_dir, "config", overrides=list(overrides))


def train_from_cli(
    overrides: Sequence[str], config_dir: Optional[Path] = None
):
    from deadtrees_tpu.config import print_config
    from deadtrees_tpu.train.trainer import train

    cfg = _compose(overrides, config_dir)
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
    return result


def eval_from_cli(
    overrides: Sequence[str], config_dir: Optional[Path] = None
):
    from deadtrees_tpu.config import print_config
    from deadtrees_tpu.train.trainer import Trainer

    cfg = _compose(overrides, config_dir)
    if cfg.get("print_config", True):
        print_config(cfg)
    ckpt = cfg.get("bestmodel")
    if not ckpt:
        raise SystemExit("eval requires bestmodel=<checkpoint path>")
    trainer = Trainer(cfg)
    trainer._build()
    metrics = trainer.test(ckpt_path=ckpt)
    print(metrics)
    return metrics
