#!/usr/bin/env bash
# Static-check + test gate (the reference's CI analogue, ref:
# .github/workflows/static-check.yml and tests.yml).
#
# Runs the strong tools (ruff/black/mypy, configured in pyproject.toml)
# when they are installed; always runs the dependency-free fallbacks:
# byte-compilation of every source and the stdlib-ast lint in
# scripts/static_check.py.
#
# Tests default to the FAST tier (-m "not slow", a few minutes): the slow
# marks cover example smoke-runs, fuzz/parity grids, TP mesh grids, and the
# heavyweight per-feature cases, each of which has fast sibling coverage.
# Pass --full for the whole suite (~19 min), --no-tests to skip pytest.
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0
step() { echo "== $1"; shift; "$@" || fail=1; }

if command -v ruff >/dev/null 2>&1; then
  step "ruff" ruff check cirkit_tpu
else
  echo "== ruff: not installed, skipped (config in pyproject.toml)"
fi
if command -v black >/dev/null 2>&1; then
  step "black" black --check cirkit_tpu
else
  echo "== black: not installed, skipped"
fi
if command -v mypy >/dev/null 2>&1; then
  step "mypy" mypy
else
  echo "== mypy: not installed, skipped (strict config in pyproject.toml)"
fi

step "compileall" python -m compileall -q cirkit_tpu
step "ast lint" python scripts/static_check.py
step "api docs" python scripts/gen_api_docs.py
step "docs links" python scripts/check_links.py

case "${1:-}" in
  --no-tests) ;;
  --full) step "pytest (full)" python -m pytest tests/ -q ;;
  *) step "pytest (fast tier)" python -m pytest tests/ -q -m "not slow" ;;
esac

exit $fail
