"""Config composition tests: the Hydra-surface parity layer.

Covers the behaviors the reference relies on (configs/config.yaml:4-22):
defaults tree, @package _global_ patching, group + value CLI overrides,
mode=debug trainer swap, env interpolation, error paths.
"""

import os
from pathlib import Path

import pytest

from deadtrees_tpu.config import ConfigError, compose

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


@pytest.fixture(autouse=True)
def _env():
    os.environ["TRAIN_DATASET_PATH"] = "/data/test"
    yield
    os.environ.pop("TRAIN_DATASET_PATH", None)


def test_default_composition():
    cfg = compose(CONFIG_DIR)
    assert cfg["model"]["network"]["architecture"] == "efficientunet++"
    # datamodule group patches model.network at root (@package _global_)
    assert cfg["model"]["network"]["classes"] == [
        "background", "conifers", "deciduous",
    ]
    assert cfg["model"]["network"]["in_channels"] == 4
    assert cfg["trainer"]["max_epochs"] == 300
    assert cfg["data_dir"] == "/data/test"


def test_group_and_value_overrides():
    cfg = compose(
        CONFIG_DIR,
        overrides=[
            "model=unet",
            "trainer.max_epochs=7",
            "datamodule=deadtrees_multi_datasets_singleclass_rgb",
        ],
    )
    assert cfg["model"]["network"]["architecture"] == "unet"
    assert cfg["trainer"]["max_epochs"] == 7
    assert cfg["model"]["network"]["in_channels"] == 3
    assert cfg["datamodule"]["batch_size_extra"] == [2, 15]


def test_debug_mode_swaps_trainer_but_cli_wins():
    cfg = compose(CONFIG_DIR, overrides=["mode=debug", "trainer.max_epochs=5"])
    assert cfg["debug_mode"] is True
    assert cfg["trainer"]["limit_train_batches"] == 2  # from trainer/debug
    assert cfg["trainer"]["max_epochs"] == 5  # CLI beats mode swap
    assert cfg["trainer"]["gradient_clip_val"] == 0.5  # inherited default


def test_unknown_group_option_raises():
    with pytest.raises(ConfigError):
        compose(CONFIG_DIR, overrides=["model=doesnotexist"])


def test_env_interpolation_missing_raises(tmp_path):
    (tmp_path / "c.yaml").write_text("x: ${env:SURELY_UNSET_VAR_123}\n")
    with pytest.raises(ConfigError):
        compose(tmp_path, "c")


def test_env_interpolation_default(tmp_path):
    (tmp_path / "c.yaml").write_text("x: ${env:SURELY_UNSET_VAR_123,fallback}\n")
    assert compose(tmp_path, "c")["x"] == "fallback"


def test_plus_override_adds_key():
    cfg = compose(CONFIG_DIR, overrides=["+optimized_metric=val/dice"])
    assert cfg["optimized_metric"] == "val/dice"


def test_experiment_group_composes():
    """configs/experiment files are @package _global_ overrides of the whole
    tree (reference configs/experiment/ group semantics)."""
    from deadtrees_tpu.config import compose

    cfg = compose("configs", overrides=["experiment=quick_unet_debug"])
    assert cfg["model"]["network"]["architecture"] == "unet"
    assert cfg["trainer"]["max_epochs"] == 2
    assert cfg["name"] == "quick_unet_debug"

    flag = compose("configs", overrides=["experiment=flagship_b5_multistage"])
    assert flag["callbacks"]["multistage"]["unfreeze_epoch"] == 20
    assert flag["trainer"]["max_epochs"] == 300


def test_hparams_search_group_composes():
    from deadtrees_tpu.config import compose

    cfg = compose("configs", overrides=["hparams_search=architecture_grid"])
    params = cfg["hparams_search"]["parameters"]
    assert "model.network.architecture" in params
    assert cfg["optimized_metric"] == "val/dice"
