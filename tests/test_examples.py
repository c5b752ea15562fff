"""Smoke-run every example script at tiny shapes so none can bit-rot
(VERDICT r1 item 9). Shapes/steps shrink via the examples' env knobs; each
run must complete and print something."""

import os
import runpy

import pytest

pytestmark = pytest.mark.slow  # every example smoke-run rebuilds+compiles a full pipeline

# name -> env overrides that shrink it to smoke-test size
EXAMPLES = {
    "logic_wmc": {},
    "sum_of_squares": {},
    "compilation_options": {"UNITS": "4", "SIDE": "4"},
    "compression_cp": {"STEPS": "600"},
    "learning_a_gmm": {"EPOCHS": "12"},
    "learning_a_circuit": {"SIDE": "4", "UNITS": "4", "EPOCHS": "1"},
    "learning_a_qpc": {"SIDE": "4", "UNITS": "4", "STEPS": "4"},
    "classifier_circuit": {
        "SIDE": "4", "UNITS": "4", "STEPS": "10", "BATCH": "64", "LAMBDAS": "0.5",
    },
    "em_training": {"SIDE": "4", "UNITS": "4", "EPOCHS": "3", "BATCH": "128"},
    "ensemble_mixture": {"SIDE": "4", "UNITS": "4", "EPOCHS": "1"},
    "structure_learning": {"VARS": "5", "SAMPLES": "600"},
    "model_fusion": {"UNITS": "4", "EPOCHS": "3", "SAMPLES": "800"},
    "interop_formats": {"VARS": "5", "SAMPLES": "600"},
    "model_distillation": {"SIDE": "3", "UNITS": "4", "EPOCHS": "3"},
    "prune_finetune": {},
    "warm_serving": {"SIDE": "4", "UNITS": "4", "BATCH": "8"},
    "serving_server": {"SIDE": "4", "UNITS": "4", "BATCH": "8"},
    "region_graphs_comparison": {
        "SIDE": "4", "UNITS": "4", "EPOCHS": "1", "BATCH": "128",
        "REGION_GRAPHS": "quad-tree-2", "LAYERS": "cp,tucker",
    },
}


@pytest.mark.parametrize("name", sorted(EXAMPLES))
def test_example_runs(name, capsys, tmp_path, monkeypatch):
    for k, v in EXAMPLES[name].items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("CKPT", str(tmp_path / "ckpt.npz"))
    monkeypatch.delenv("MNIST_NPZ", raising=False)
    runpy.run_path(f"examples/{name}.py", run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip()
