"""Stdlib lint gate for cellulus_tpu.

The reference enforces ruff + mypy strict via pre-commit in its test target
(/root/reference/Makefile:7-10). This sandbox has no network and no lint
tools installed, so this script implements the enforceable subset with the
stdlib only — it always runs, and `make lint` additionally runs ruff/mypy
when they are available (config lives in pyproject.toml).

Checks per file:
  - parses (syntax)
  - no wildcard imports
  - no unused imports (module scope and function scope)
  - no mutable default arguments ([], {}, set())
  - no bare `except:`
  - no f-string-less `print("%s" % ...)`-style leftovers (debug `print(` in
    package code must carry a `# noqa: print` or go through utils/progress)

Exit code 0 = clean, 1 = findings.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TARGETS = ["cellulus_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"]

# Modules imported for re-export or side effects; referenced in __init__ files.
ALLOW_UNUSED_IN_INIT = True
# print() is the user-facing progress channel in these CLI-facing modules.
PRINT_OK = {
    "cli.py", "train.py", "infer.py", "predict.py", "detect.py", "segment.py",
    "evaluate.py", "pipeline.py", "progress.py", "logger.py", "profiling.py",
    "misc.py", "export.py", "distributed.py",
}


class Finding:
    def __init__(self, path: Path, line: int, msg: str):
        self.path, self.line, self.msg = path, line, msg

    def __str__(self):
        return f"{self.path.relative_to(REPO)}:{self.line}: {self.msg}"


def _collect_names(tree: ast.AST) -> set[str]:
    """Every identifier referenced anywhere (loads, attributes, strings in __all__)."""
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            # walk to root name
            cur = node
            while isinstance(cur, ast.Attribute):
                cur = cur.value
            if isinstance(cur, ast.Name):
                names.add(cur.id)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                                names.add(elt.value)
    return names


def check_file(path: Path) -> list[Finding]:
    findings: list[Finding] = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [Finding(path, e.lineno or 0, f"syntax error: {e.msg}")]

    is_init = path.name == "__init__.py"
    referenced = _collect_names(tree)
    noqa_lines = {
        i + 1 for i, ln in enumerate(src.splitlines()) if "# noqa" in ln
    }
    # imports inside try: blocks are feature probes (except ImportError
    # fallbacks) — exempt from the unused-import check
    try_import_lines: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Try):
            for sub in ast.walk(node):
                if isinstance(sub, (ast.Import, ast.ImportFrom)):
                    try_import_lines.add(sub.lineno)
    in_package = "cellulus_tpu" in path.parts

    for node in ast.walk(tree):
        if (
            in_package
            and path.name not in PRINT_OK
            and isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
            and node.lineno not in noqa_lines
        ):
            findings.append(
                Finding(path, node.lineno,
                        "print() outside the CLI-facing allowlist "
                        "(use warnings/utils.progress, or # noqa)")
            )
        if isinstance(node, ast.ImportFrom) and any(a.name == "*" for a in node.names):
            if node.lineno not in noqa_lines:
                findings.append(Finding(path, node.lineno, "wildcard import"))
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if is_init and ALLOW_UNUSED_IN_INIT:
                continue
            if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                continue
            if node.lineno in noqa_lines or node.lineno in try_import_lines:
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound = alias.asname or alias.name.split(".")[0]
                if bound not in referenced and f"{bound}" != "__future__":
                    findings.append(
                        Finding(path, node.lineno, f"unused import: {bound}")
                    )
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + node.args.kw_defaults:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        Finding(path, node.lineno,
                                f"mutable default argument in {node.name}()")
                    )
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            if node.lineno not in noqa_lines:
                findings.append(Finding(path, node.lineno, "bare except:"))
    return findings


def main() -> int:
    files: list[Path] = []
    for t in TARGETS:
        p = REPO / t
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.exists():
            files.append(p)
    all_findings: list[Finding] = []
    for f in files:
        all_findings.extend(check_file(f))
    for fi in all_findings:
        print(fi)
    print(f"lint: {len(files)} files checked, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main())
