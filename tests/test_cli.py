"""CLI surface: run.py → train artifacts, eval.py → test metrics.

The outermost user path (reference run.py:11-35 / eval.py:30-141),
exercised in-process (conftest already pins the CPU platform) by patching
sys.argv with Hydra-style overrides.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

from tests.test_data import _write_shard

REPO = Path(__file__).resolve().parents[1]


def _load(name):
    spec = importlib.util.spec_from_file_location(name, REPO / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def dataset(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    for i in range(5):
        _write_shard(d / f"train-{i:06d}.tar", 8, seed=i)
    return d


def test_run_and_eval_cli(dataset, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("TRAIN_DATASET_PATH", str(dataset))
    monkeypatch.chdir(tmp_path)

    overrides = [
        "model=unet",
        "datamodule=deadtrees",
        "datamodule.pattern='*.tar'",
        "mode=debug",
        "model.network.encoder_name=resnet18",
        "model.network.decoder_channels=[16,16,8,8,8]",
        "datamodule.batch_size=4",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1",
        "trainer.devices=1",
        "trainer.precision=f32",
        "test_after_training=false",
        "seed=1",
        "print_config=true",
    ]
    monkeypatch.setattr(sys, "argv", ["run.py"] + overrides)
    _load("run").main()
    out = capsys.readouterr().out
    assert "val/dice" in out

    ckpts = list(tmp_path.glob("**/checkpoints/last.ckpt"))
    assert ckpts, "run.py produced no checkpoint"
    cfg_trees = list(tmp_path.glob("**/config_tree.log"))
    assert cfg_trees, "run.py did not dump the config tree"

    monkeypatch.setattr(
        sys, "argv", ["eval.py", f"bestmodel={ckpts[0]}"] + overrides
    )
    _load("eval").main()
    out = capsys.readouterr().out
    assert "dice" in out
