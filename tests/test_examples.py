"""Smoke-run the fast example scripts so they cannot bit-rot (the slower
training examples are exercised manually / on-device)."""

import runpy

import pytest


@pytest.mark.parametrize("name", ["logic_wmc", "sum_of_squares"])
def test_example_runs(name, capsys):
    runpy.run_path(f"examples/{name}.py", run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip()
