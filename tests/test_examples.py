"""The examples/ walkthroughs stay runnable (the reference ships
notebooks/01-Training.ipynb + 02-Inference.ipynb; ours are literate
scripts so CI can execute them — docs/MIGRATION.md 'Notebooks')."""

import runpy
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(script: str, workdir: Path, monkeypatch):
    monkeypatch.setattr(sys, "argv", [script, str(workdir)])
    runpy.run_path(str(REPO / "examples" / script), run_name="__main__")


def test_training_example(tmp_path, monkeypatch, capsys):
    _run("01_training.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "train result:" in out
    assert "class map" in out


def test_inference_example(tmp_path, monkeypatch, capsys):
    _run("02_inference.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "scene:" in out
    assert "ensemble(3):" in out
    assert "exported artifact:" in out
