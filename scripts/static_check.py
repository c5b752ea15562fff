#!/usr/bin/env python
"""A dependency-free static checker for the library sources.

The reference gates CI on black+isort+pylint+mypy
(ref: ``.github/workflows/static-check.yml``); this environment has no
egress and none of those tools, so this script implements the highest-value
subset on the stdlib ``ast`` module:

- undefined names (pyflakes-grade scope resolution: typo'd symbols that
  would raise NameError in rarely exercised branches)
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
import builtins
import sys
from pathlib import Path

LIB = Path(__file__).resolve().parent.parent / "cirkit_tpu"

# names that look unused but are re-exported or have import side effects
REEXPORT_FILES = {"__init__.py"}

BUILTINS = set(dir(builtins)) | {
    "__file__",
    "__name__",
    "__doc__",
    "__package__",
    "__spec__",
    "__loader__",
    "__builtins__",
    "__debug__",
    "__path__",
    "__class__",  # implicit cell in methods (zero-arg super)
    "__qualname__",
    "__module__",
    "__annotations__",
    "__dict__",
}


# ---------------------------------------------------------------------------
# Undefined-name detection
# ---------------------------------------------------------------------------
#
# Presence-based scope resolution: a name is "defined" in a scope if ANY
# statement in that scope binds it (imports, assignments, defs, params,
# for/with/except targets, walrus, global/nonlocal, match patterns).
# Use-before-def ordering is deliberately NOT checked — presence-only has
# zero false positives on forward references while still catching the
# NameError class that matters: misspelled / never-bound symbols.
#
# Scope chain rules follow Python's: function and comprehension scopes see
# enclosing function scopes and the module but NOT enclosing class bodies;
# a class body sees enclosing functions + module; the first iterable of a
# comprehension is evaluated in the enclosing scope (so it CAN see class
# attributes when written directly in a class body).


class _Scope:
    __slots__ = ("kind", "bound", "star")

    def __init__(self, kind: str) -> None:
        self.kind = kind  # "module" | "class" | "function" | "comp"
        self.bound: set[str] = set()
        self.star = False  # saw `from m import *` — disables the check


_SCOPE_NODES = (
    ast.FunctionDef,
    ast.AsyncFunctionDef,
    ast.ClassDef,
    ast.Lambda,
    ast.ListComp,
    ast.SetComp,
    ast.DictComp,
    ast.GeneratorExp,
)


def _collect_nodes(nodes, scope: _Scope, in_comp: bool = False) -> None:
    """Record every name the given nodes (and their non-scope descendants)
    bind in ``scope``.  Nested function/class/lambda bodies are their own
    scopes and are not descended into; comprehensions are descended only to
    pick up walrus targets (PEP 572 binds them in the enclosing scope)."""
    for child in nodes:
        if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            scope.bound.add(child.name)
            continue  # own scope
        if isinstance(child, ast.Lambda):
            continue  # own scope
        if isinstance(child, (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)):
            _collect_nodes(ast.iter_child_nodes(child), scope, in_comp=True)
            continue
        if isinstance(child, ast.NamedExpr):
            if isinstance(child.target, ast.Name):
                scope.bound.add(child.target.id)
            _collect_nodes([child.value], scope, in_comp=in_comp)
            continue
        if isinstance(child, ast.Name):
            if isinstance(child.ctx, (ast.Store, ast.Del)) and not in_comp:
                scope.bound.add(child.id)
            continue
        if isinstance(child, ast.Import):
            for a in child.names:
                scope.bound.add(a.asname or a.name.split(".")[0])
            continue
        if isinstance(child, ast.ImportFrom):
            for a in child.names:
                if a.name == "*":
                    scope.star = True
                else:
                    scope.bound.add(a.asname or a.name)
            continue
        if isinstance(child, ast.ExceptHandler) and child.name:
            scope.bound.add(child.name)
        elif isinstance(child, (ast.Global, ast.Nonlocal)):
            scope.bound.update(child.names)
        elif isinstance(child, ast.MatchAs) and child.name:
            scope.bound.add(child.name)
        elif isinstance(child, ast.MatchStar) and child.name:
            scope.bound.add(child.name)
        elif isinstance(child, ast.MatchMapping) and child.rest:
            scope.bound.add(child.rest)
        _collect_nodes(ast.iter_child_nodes(child), scope, in_comp=in_comp)


def _collect_args(args: ast.arguments, scope: _Scope) -> None:
    for a in (
        *args.posonlyargs,
        *args.args,
        *args.kwonlyargs,
        *([args.vararg] if args.vararg else []),
        *([args.kwarg] if args.kwarg else []),
    ):
        scope.bound.add(a.arg)


class _NameResolver:
    def __init__(self, rel: str) -> None:
        self.rel = rel
        self.problems: list[str] = []

    # -- helpers ------------------------------------------------------------
    def _lookup(self, name: str, chain: list[_Scope]) -> bool:
        if name in BUILTINS:
            return True
        for s in chain:
            if name in s.bound:
                return True
        return any(s.star for s in chain)

    @staticmethod
    def _inner_chain(scope: _Scope, chain: list[_Scope]) -> list[_Scope]:
        # function/comprehension/class bodies skip enclosing CLASS scopes
        return [scope] + [s for s in chain if s.kind != "class"]

    # -- traversal ----------------------------------------------------------
    def check_module(self, tree: ast.Module) -> list[str]:
        scope = _Scope("module")
        _collect_nodes(tree.body, scope)
        self._visit_body(tree.body, [scope])
        return self.problems

    def _visit_body(self, body, chain: list[_Scope]) -> None:
        for stmt in body:
            self._visit(stmt, chain)

    def _visit(self, node: ast.AST, chain: list[_Scope]) -> None:
        if isinstance(node, ast.Name):
            if isinstance(node.ctx, ast.Load) and not self._lookup(node.id, chain):
                self.problems.append(
                    f"{self.rel}:{node.lineno}: undefined name '{node.id}'"
                )
            return
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for dec in node.decorator_list:
                self._visit(dec, chain)
            for default in [*node.args.defaults, *node.args.kw_defaults]:
                if default is not None:
                    self._visit(default, chain)
            for a in (
                *node.args.posonlyargs,
                *node.args.args,
                *node.args.kwonlyargs,
                *([node.args.vararg] if node.args.vararg else []),
                *([node.args.kwarg] if node.args.kwarg else []),
            ):
                if a.annotation is not None:
                    self._visit(a.annotation, chain)
            if node.returns is not None:
                self._visit(node.returns, chain)
            scope = _Scope("function")
            _collect_args(node.args, scope)
            _collect_nodes(node.body, scope)
            self._visit_body(node.body, self._inner_chain(scope, chain))
            return
        if isinstance(node, ast.ClassDef):
            for dec in node.decorator_list:
                self._visit(dec, chain)
            for base in [*node.bases, *node.keywords]:
                self._visit(base.value if isinstance(base, ast.keyword) else base, chain)
            scope = _Scope("class")
            _collect_nodes(node.body, scope)
            self._visit_body(node.body, self._inner_chain(scope, chain))
            return
        if isinstance(node, ast.Lambda):
            for default in [*node.args.defaults, *node.args.kw_defaults]:
                if default is not None:
                    self._visit(default, chain)
            scope = _Scope("function")
            _collect_args(node.args, scope)
            _collect_nodes([node.body], scope)
            self._visit(node.body, self._inner_chain(scope, chain))
            return
        if isinstance(node, (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)):
            # first iterable is evaluated in the ENCLOSING scope
            self._visit(node.generators[0].iter, chain)
            scope = _Scope("comp")
            for gen in node.generators:
                _collect_nodes([gen.target], scope)
            inner = self._inner_chain(scope, chain)
            for i, gen in enumerate(node.generators):
                if i > 0:
                    self._visit(gen.iter, inner)
                for cond in gen.ifs:
                    self._visit(cond, inner)
            if isinstance(node, ast.DictComp):
                self._visit(node.key, inner)
                self._visit(node.value, inner)
            else:
                self._visit(node.elt, inner)
            return
        for child in ast.iter_child_nodes(node):
            self._visit(child, chain)


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
    try:
        rel = path.relative_to(LIB.parent)
    except ValueError:  # checking a file outside the repo (tests)
        rel = path

    # ---- undefined names ---------------------------------------------------
    problems.extend(_NameResolver(str(rel)).check_module(tree))

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
