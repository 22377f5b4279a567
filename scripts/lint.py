#!/usr/bin/env python
"""First-party lint gate: the enforceable subset of the pre-commit config.

The reference gates commits with isort/black/flake8
(/root/reference/.pre-commit-config.yaml:1-16). This build image has no
egress, so those exact tools cannot run here; this checker implements the
subset of their rules that CAN be verified exactly with the stdlib, and CI
runs it as a BLOCKING step (.github/workflows/main.yml). The full
pre-commit job stays advisory in CI (where egress exists) and uploads an
auto-fix patch artifact.

Checks (ids mirror pycodestyle/pyflakes where one exists):

  W291/W293  trailing whitespace (also the trailing-whitespace hook)
  W292       missing newline at end of file / >1 blank trailing line
             (the end-of-file-fixer hook)
  W191       tab characters in indentation
  E401       multiple imports on one line (``import os, sys``)
  E711/E712  ``== None`` / ``== True`` / ``== False`` comparisons
  F401       imported name unused (AST; honors ``# noqa`` and the
             per-file-ignore for ``__init__.py`` re-export surfaces from
             .flake8)
  YAML       every *.yaml/*.yml parses
  LARGE      no tracked file > 2 MiB (check-added-large-files --maxkb=2048)

Usage: python scripts/lint.py [--fix] [paths...]
``--fix`` rewrites the mechanical classes (whitespace, EOF) in place.
Exit 0 = clean.
"""

from __future__ import annotations

import argparse
import ast
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

EXCLUDE_PARTS = {".git", "__pycache__", "build", "dist", ".dtpu_cache", "logs",
                 "node_modules", ".pytest_cache", "PROOFS"}
MAX_BYTES = 2048 * 1024


def tracked_files() -> list[Path]:
    out = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
        check=True,
    ).stdout.splitlines()
    files = []
    for rel in out:
        p = REPO / rel
        if not p.is_file():
            continue
        if EXCLUDE_PARTS.intersection(p.relative_to(REPO).parts):
            continue
        files.append(p)
    return files


def is_text(path: Path) -> bool:
    if path.suffix in {".png", ".jpg", ".gz", ".tar", ".so", ".tif", ".ico",
                       ".whl", ".pyc", ".onnx", ".npz", ".npy"}:
        return False
    try:
        path.read_bytes()[:4096].decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def check_whitespace(path: Path, text: str, fix: bool):
    findings = []
    lines = text.split("\n")
    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            code = "W293" if not line.strip() else "W291"
            findings.append((path, i, code, "trailing whitespace"))
        if path.suffix == ".py" and line[: len(line) - len(line.lstrip())].count("\t"):
            findings.append((path, i, "W191", "tab in indentation"))
    if text and not text.endswith("\n"):
        findings.append((path, len(lines), "W292", "no newline at end of file"))
    if text.endswith("\n\n"):
        findings.append((path, len(lines), "W292", "multiple blank lines at EOF"))
    if fix and findings:
        fixed = "\n".join(line.rstrip() for line in lines)
        fixed = fixed.rstrip("\n") + "\n" if fixed.strip() else ""
        path.write_text(fixed)
    return findings


def _noqa_lines(text: str) -> set[int]:
    return {i for i, line in enumerate(text.split("\n"), 1) if "# noqa" in line}


class _ImportVisitor(ast.NodeVisitor):
    """Collect imported bindings and all used names (incl. attribute roots
    and names inside type-annotation strings left unparsed)."""

    def __init__(self):
        self.imports: list[tuple[str, str, int]] = []  # (asname, code, line)
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports.append((name, "F401", node.lineno))
        self.generic_visit(node)

    def visit_ImportFrom(self, node: ast.ImportFrom):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            self.imports.append((name, "F401", node.lineno))
        self.generic_visit(node)

    def visit_Name(self, node: ast.Name):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute):
        self.generic_visit(node)

    def visit_Constant(self, node: ast.Constant):
        # string annotations / docstrings can reference imported names
        if isinstance(node.value, str):
            import re

            self.used.update(re.findall(r"[A-Za-z_]\w*", node.value))
        self.generic_visit(node)


def check_python(path: Path, text: str):
    findings = []
    noqa = _noqa_lines(text)
    try:
        tree = ast.parse(text)
    except SyntaxError as e:
        return [(path, e.lineno or 0, "E999", f"syntax error: {e.msg}")]

    for node in ast.walk(tree):
        if isinstance(node, ast.Import) and len(node.names) > 1 and \
                node.lineno not in noqa:
            findings.append((path, node.lineno, "E401",
                             "multiple imports on one line"))
        if isinstance(node, ast.Compare) and node.lineno not in noqa:
            for op, cmp_ in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and isinstance(
                        cmp_, ast.Constant) and (
                        cmp_.value is None or cmp_.value is True or
                        cmp_.value is False):
                    code = "E711" if cmp_.value is None else "E712"
                    findings.append(
                        (path, node.lineno, code,
                         f"comparison to {cmp_.value} (use is/is not)"))

    if path.name != "__init__.py":  # .flake8 per-file-ignores: F401
        v = _ImportVisitor()
        v.visit(tree)
        # __all__ entries count as uses
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__" and \
                            isinstance(node.value, (ast.List, ast.Tuple)):
                        for el in node.value.elts:
                            if isinstance(el, ast.Constant) and \
                                    isinstance(el.value, str):
                                v.used.add(el.value)
        for name, code, line in v.imports:
            if name not in v.used and line not in noqa and \
                    not name.startswith("_"):
                findings.append((path, line, code, f"'{name}' imported but unused"))
    return findings


def check_yaml(path: Path, text: str):
    try:
        import yaml

        list(yaml.safe_load_all(text))
        return []
    except ImportError:
        return []
    except Exception as e:
        return [(path, getattr(getattr(e, "problem_mark", None), "line", 0),
                 "YAML", str(e).split("\n")[0])]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("paths", nargs="*", type=Path)
    ap.add_argument("--fix", action="store_true",
                    help="rewrite trailing-whitespace/EOF findings in place")
    args = ap.parse_args(argv)

    files = [p.resolve() for p in args.paths] if args.paths else tracked_files()
    findings = []
    for path in files:
        if path.stat().st_size > MAX_BYTES:
            findings.append((path, 0, "LARGE",
                             f"{path.stat().st_size // 1024} KiB > 2048 KiB"))
        if not is_text(path):
            continue
        text = path.read_text()
        findings += check_whitespace(path, text, args.fix)
        if path.suffix == ".py":
            findings += check_python(path, text)
        elif path.suffix in (".yaml", ".yml"):
            findings += check_yaml(path, text)

    for path, line, code, msg in sorted(findings, key=lambda f: (str(f[0]), f[1])):
        rel = path.relative_to(REPO) if path.is_relative_to(REPO) else path
        print(f"{rel}:{line}: {code} {msg}")
    n = len(findings)
    print(f"{n} finding(s) across {len(files)} files"
          + (" (mechanical classes were auto-fixed)" if args.fix and n else ""))
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
