"""Tests for the first-party lint gate (scripts/lint.py).

The gate is CI-blocking (.github/workflows/main.yml), so its checks are
pinned here: each rule fires on a crafted bad file, stays silent on clean
code, and --fix repairs the mechanical classes. The final test runs the
gate over the real repo — the burndown must stay at zero findings.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

import lint  # noqa: E402


def run_checks(path):
    text = path.read_text()
    findings = lint.check_whitespace(path, text, False)
    if path.suffix == ".py":
        findings += lint.check_python(path, text)
    return [(code, line) for (_, line, code, _) in findings]


def test_trailing_whitespace_and_eof(tmp_path):
    p = tmp_path / "bad.py"
    p.write_text("x = 1 \n\ny = 2")
    codes = [c for c, _ in run_checks(p)]
    assert "W291" in codes
    assert "W292" in codes


def test_fix_repairs_mechanical_classes(tmp_path):
    p = tmp_path / "bad.py"
    p.write_text("x = 1 \n   \ny = 2\n\n\n")
    lint.check_whitespace(p, p.read_text(), True)
    assert p.read_text() == "x = 1\n\ny = 2\n"
    assert run_checks(p) == []


def test_unused_import_flagged(tmp_path):
    p = tmp_path / "mod.py"
    p.write_text("import os\nimport sys\n\nprint(sys.argv)\n")
    assert ("F401", 1) in run_checks(p)
    assert all(line != 2 for code, line in run_checks(p) if code == "F401")


def test_used_via_attribute_and_string_annotation(tmp_path):
    p = tmp_path / "mod.py"
    p.write_text(
        "import numpy\nfrom typing import Optional\n\n"
        "def f(x: 'Optional[int]'):\n    return numpy.abs(x)\n"
    )
    assert run_checks(p) == []


def test_future_and_noqa_and_init_exempt(tmp_path):
    p = tmp_path / "mod.py"
    p.write_text(
        "from __future__ import annotations\n"
        "import json  # noqa\n"
    )
    assert run_checks(p) == []
    init = tmp_path / "__init__.py"
    init.write_text("from os import path\n")
    assert run_checks(init) == []


def test_comparison_and_multi_import(tmp_path):
    p = tmp_path / "mod.py"
    p.write_text("import os, sys\n\nif os.sep == None or sys.argv == True:\n    pass\n")
    codes = [c for c, _ in run_checks(p)]
    assert "E401" in codes and "E711" in codes and "E712" in codes


def test_repo_is_clean():
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "lint.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
