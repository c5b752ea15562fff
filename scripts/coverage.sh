#!/usr/bin/env bash
# Full-suite coverage gate (parity with the reference's scripts/coverage.sh,
# ref: /root/reference/scripts/coverage.sh:1). Uses pytest-cov when
# installed; falls back to the plain full suite otherwise (this image has
# no egress, so coverage tooling may be absent).
set -uo pipefail
cd "$(dirname "$0")/.."

if python -c "import pytest_cov" >/dev/null 2>&1; then
  python -m pytest tests/ -q \
    --cov=cirkit_tpu --cov-report=term-missing --cov-report=xml \
    --cov-fail-under=80
else
  echo "== pytest-cov: not installed, running the full suite uninstrumented"
  python -m pytest tests/ -q
fi
