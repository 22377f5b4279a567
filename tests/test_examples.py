"""The examples/ walkthroughs stay runnable (the reference ships
notebooks/01-Training.ipynb + 02-Inference.ipynb; ours are literate
scripts so CI can execute them — docs/MIGRATION.md 'Notebooks').

Each example runs in a SUBPROCESS: the scripts pin jax_platforms=cpu and
set TRAIN_DATASET_PATH, both process-global — in-process runpy would
either be silently defeated (backend already initialized by an earlier
test → the 'CPU-sized' walkthrough compiles on the TPU tunnel) or leak
the pin/env into the rest of the suite.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(script: str, workdir: Path) -> str:
    env = dict(os.environ)
    # the scripts pin CPU themselves (config API); drop test-session flags
    # so the example exercises the exact out-of-the-box path a user gets
    env.pop("XLA_FLAGS", None)
    env.pop("DEADTREES_EXAMPLE_TPU", None)
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), str(workdir)],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, (
        f"{script} failed\nstdout tail: {out.stdout[-2000:]}\n"
        f"stderr tail: {out.stderr[-2000:]}"
    )
    return out.stdout


def test_training_example(tmp_path):
    out = _run("01_training.py", tmp_path)
    assert "train result:" in out
    assert "class map" in out


def test_inference_example(tmp_path):
    out = _run("02_inference.py", tmp_path)
    assert "scene:" in out
    assert "ensemble(3):" in out
    assert "exported artifact:" in out


def test_serving_example(tmp_path):
    out = _run("03_serving.py", tmp_path)
    assert "1 device dispatch(es)" in out
    assert "packed:" in out and out.strip().endswith("OK")
