"""Structural-property and IR-validation tests (ref:
``tests/symbolic/test_from_region_graph.py``, ``symbolic/circuit.py:391-458``)."""

import pytest

from cirkit_tpu.symbolic import (
    CategoricalLayer,
    Circuit,
    HadamardLayer,
    SumLayer,
    are_compatible,
)
from cirkit_tpu.utils import Scope

from tests.fixtures import build_bivariate_categorical_pc, build_multivariate_categorical_pc


def test_structural_properties_structured():
    sc = build_multivariate_categorical_pc(num_variables=4)
    assert sc.is_smooth
    assert sc.is_decomposable
    assert sc.is_structured_decomposable
    assert sc.num_variables == 4
    assert are_compatible(sc, sc)


def test_non_smooth_circuit_detected():
    x0 = CategoricalLayer(Scope([0]), 2, num_categories=2)
    x1 = CategoricalLayer(Scope([1]), 2, num_categories=2)
    s = SumLayer(2, 1, arity=2)  # sums layers over different scopes
    sc = Circuit([x0, x1, s], {s: [x0, x1]}, [s])
    assert not sc.is_smooth
    assert sc.is_decomposable


def test_non_decomposable_circuit_detected():
    x0 = CategoricalLayer(Scope([0]), 2, num_categories=2)
    x0b = CategoricalLayer(Scope([0]), 2, num_categories=2)
    h = HadamardLayer(2, arity=2)
    sc = Circuit([x0, x0b, h], {h: [x0, x0b]}, [h])
    assert not sc.is_decomposable


def test_arity_validation():
    x0 = CategoricalLayer(Scope([0]), 2, num_categories=2)
    s = SumLayer(2, 1, arity=2)
    with pytest.raises(ValueError, match="arity"):
        Circuit([x0, s], {s: [x0]}, [s])


def test_unit_count_validation():
    x0 = CategoricalLayer(Scope([0]), 3, num_categories=2)
    s = SumLayer(2, 1)
    with pytest.raises(ValueError, match="input units"):
        Circuit([x0, s], {s: [x0]}, [s])


def test_scopes_bottom_up():
    sc = build_bivariate_categorical_pc()
    assert sc.scope == Scope([0, 1])
    out = sc.outputs[0]
    assert sc.layer_scope(out) == Scope([0, 1])
    for sl in sc.input_layers:
        assert len(sl.scope) == 1


def test_layer_copyref_shares_tensor_parameters():
    sc = build_bivariate_categorical_pc()
    out = sc.outputs[0]
    copy = out.copyref()
    from cirkit_tpu.symbolic import ReferenceParameter

    refs = [n for n in copy.params["weight"].nodes if isinstance(n, ReferenceParameter)]
    assert len(refs) == 1
    assert refs[0].deref() is out.params["weight"].output
