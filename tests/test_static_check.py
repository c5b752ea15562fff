"""The stdlib-ast static gate (scripts/static_check.py) — the CI analogue of
the reference's black+isort+pylint+mypy workflow (ref:
.github/workflows/static-check.yml:1): those tools cannot install in this
environment, so the checker implements the highest-value subset itself.
These tests prove the undefined-name detector actually bites (a seeded
NameError-class typo fails the gate) and that the shipped library is clean.
"""

from __future__ import annotations

import ast
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))

from static_check import LIB, _NameResolver, check_file  # noqa: E402


def _undefined(src: str) -> list[str]:
    return _NameResolver("t.py").check_module(ast.parse(src))


class TestUndefinedNameDetection:
    def test_seeded_typo_is_flagged(self, tmp_path):
        """A typo'd symbol in a rarely exercised branch — the exact bug class
        the gate exists for — must fail check_file on a real file."""
        mod = tmp_path / "cirkit_tpu" / "broken.py"
        mod.parent.mkdir()
        mod.write_text(
            "import numpy as np\n"
            "def entropy(p):\n"
            "    if p.ndim == 3:  # rare branch\n"
            "        return -(p * nq.log(p)).sum()\n"
            "    return -(p * np.log(p)).sum()\n"
        )
        problems = check_file(mod)
        assert any("undefined name 'nq'" in p for p in problems)

    def test_plain_typo(self):
        assert _undefined("def f(x):\n    return x + undefned\n")

    def test_comprehension_target_does_not_leak(self):
        probs = _undefined("def f():\n    _ = [t for t in range(3)]\n    return t\n")
        assert any("'t'" in p for p in probs)

    @pytest.mark.parametrize(
        "src",
        [
            # forward references via presence-only binding
            "def f():\n    return later()\ndef later():\n    return 1\n",
            # closures capture names assigned after the inner def
            "def o():\n    def i():\n        return c\n    c = 1\n    return i\n",
            # class attributes visible to the first comprehension iterable
            "class A:\n    xs = [1]\n    ys = [x for x in xs]\n",
            # TYPE_CHECKING-guarded imports still bind at module scope
            "import typing\nif typing.TYPE_CHECKING:\n    from m import T\n"
            "def f(x):\n    y: T = x\n    return y\n",
            # walrus inside a comprehension binds in the enclosing scope
            "def f(xs):\n    _ = [y for x in xs if (y := x)]\n    return y\n",
            # try/except import fallbacks
            "try:\n    import fancy\nexcept ImportError:\n    fancy = None\n",
            # global / nonlocal declarations
            "def f():\n    global g\n    g = 1\ng = 0\n",
            # star imports disable the check for that module
            "from os import *\ndef f():\n    return getcwd()\n",
            # match-statement capture patterns bind
            "def f(v):\n    match v:\n        case [a, *rest]:\n"
            "            return a, rest\n        case {**kw}:\n            return kw\n",
        ],
    )
    def test_no_false_positive(self, src):
        assert _undefined(src) == []


def test_library_is_clean():
    """The shipped library passes the full gate (same check scripts/check.sh
    runs); this keeps the gate enforced from inside the test suite too."""
    out = subprocess.run(
        [sys.executable, str(SCRIPTS / "static_check.py")],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert LIB.is_dir()
