"""Sweep runner (job-level parallelism, reference sweep.yaml:1-33 +
sweep_slurm.py:22-56): grid expansion, command emission for external
schedulers, local execution with metric capture and best-config report,
and the configs/hparams_search group wiring.
"""

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]

_spec = importlib.util.spec_from_file_location(
    "sweep_script", REPO / "scripts" / "sweep.py"
)
sweep_script = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sweep_script)
expand_grid = sweep_script.expand_grid


def test_expand_grid_product_and_scalars():
    grid = list(
        expand_grid(
            {
                "model.lr": {"values": [0.1, 0.2, 0.3]},
                "model.bs": {"values": [16, 32]},
                "mode": "debug",  # scalar pins a single value
            }
        )
    )
    assert len(grid) == 6
    assert all(c["mode"] == "debug" for c in grid)
    assert {(c["model.lr"], c["model.bs"]) for c in grid} == {
        (lr, bs) for lr in (0.1, 0.2, 0.3) for bs in (16, 32)
    }


def sweep_cfg(tmp_path, program="run.py"):
    cfg = {
        "program": program,
        "metric": {"name": "val/dice", "goal": "maximize"},
        "parameters": {
            "model.lr": {"values": [0.1, 0.4, 0.2]},
            "trainer.max_epochs": {"values": [1]},
        },
    }
    path = tmp_path / "sweep.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def test_print_launcher_emits_commands(tmp_path):
    cfg = sweep_cfg(tmp_path)
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "sweep.py"), str(cfg),
         "--launcher", "print", "--extra", "mode=debug"],
        check=True, capture_output=True, text=True, cwd=str(tmp_path),
    )
    cmds = [l for l in res.stdout.splitlines() if "run.py" in l]
    assert len(cmds) == 3
    for cmd in cmds:
        assert "model.lr=" in cmd
        assert "trainer.max_epochs=1" in cmd
        assert "mode=debug" in cmd  # --extra rides along on every run
        assert "optimized_metric=val/dice" in cmd


def test_local_launcher_records_and_ranks(tmp_path):
    # stub objective: echoes 2 * lr, so lr=0.4 must win under maximize
    stub = tmp_path / "objective.py"
    stub.write_text(
        "import sys\n"
        "vals = dict(a.split('=', 1) for a in sys.argv[1:])\n"
        "print('log noise')\n"
        "print(float(vals['model.lr']) * 2)\n"
    )
    cfg = sweep_cfg(tmp_path, program="objective.py")
    results = tmp_path / "results.jsonl"
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "sweep.py"), str(cfg),
         "--launcher", "local", "--results", str(results)],
        check=True, capture_output=True, text=True, cwd=str(tmp_path),
    )
    recs = [json.loads(l) for l in results.read_text().splitlines()]
    assert len(recs) == 3
    assert all(r["returncode"] == 0 for r in recs)
    # the metric is parsed from the LAST float line of each run's stdout
    got = {r["value"] for r in recs}
    assert got == {0.2, 0.8, 0.4}
    assert "BEST val/dice=0.8" in res.stdout
    winner = next(l for l in res.stdout.splitlines() if l.startswith("BEST"))
    assert "model.lr=0.4" in winner


def test_from_config_group(tmp_path):
    """--from-config NAME loads configs/hparams_search/NAME.yaml (the
    Hydra-style group) and expands its architecture × encoder grid."""
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "sweep.py"),
         "--from-config", "architecture_grid", "--launcher", "print"],
        check=True, capture_output=True, text=True, cwd=str(REPO),
    )
    cmds = [l for l in res.stdout.splitlines() if "run.py" in l]
    # 5 architectures x 2 encoders (configs/hparams_search/architecture_grid.yaml)
    assert len(cmds) == 10
    assert sum("architecture=efficientunet++" in c for c in cmds) == 2


def test_wandb_launcher_with_mock(tmp_path, monkeypatch):
    """--launcher wandb (reference sweep_slurm.py:36-56): the sweep.yaml
    document goes to wandb.sweep verbatim, an agent loop pulls configs,
    runs the program with Hydra-style overrides, and logs the objective.
    Driven with a mock wandb module (the real package is not installed /
    no egress)."""
    import types
    from types import SimpleNamespace

    stub = tmp_path / "objective.py"
    stub.write_text(
        "import sys\n"
        "vals = dict(a.split('=', 1) for a in sys.argv[1:])\n"
        "print('noise')\n"
        "print(float(vals['model.lr']) * 2)\n"
    )
    cfg = {
        "program": str(stub),
        "metric": {"name": "val/dice", "goal": "maximize"},
        "parameters": {"model.lr": {"values": [0.1, 0.4, 0.2]}},
    }

    logged, finished = [], []
    state = {"combos": None, "next": None}

    class FakeRun:
        def __init__(self, config):
            self.config = config

        def log(self, d):
            logged.append(d)

        def finish(self, exit_code=0):
            finished.append(exit_code)

    fake = types.ModuleType("wandb")

    def fake_sweep(sweep_cfg, project=None, entity=None):
        state["combos"] = list(expand_grid(sweep_cfg["parameters"]))
        fake._project = project
        return "sweep123"

    def fake_init():
        return FakeRun(dict(state["next"]))

    def fake_agent(sweep_id, function=None, count=None):
        assert sweep_id == "sweep123"
        todo = state["combos"][:count] if count else state["combos"]
        for combo in todo:
            state["next"] = combo
            function()

    fake.sweep, fake.init, fake.agent = fake_sweep, fake_init, fake_agent
    monkeypatch.setitem(sys.modules, "wandb", fake)

    args = SimpleNamespace(sweep_id=None, project="deadtrees-tpu",
                           entity=None, extra=["mode=debug"], count=None)
    sweep_script.run_wandb_sweep(cfg, args, "val/dice")

    assert fake._project == "deadtrees-tpu"
    assert [d["val/dice"] for d in logged] == pytest.approx([0.2, 0.8, 0.4])
    assert finished == [0, 0, 0]

    # --count caps the agent's runs; --sweep-id joins without creating
    logged.clear()
    finished.clear()
    args = SimpleNamespace(sweep_id="sweep123", project=None, entity=None,
                           extra=[], count=2)
    sweep_script.run_wandb_sweep(cfg, args, "val/dice")
    assert len(logged) == 2
