"""Logic-circuit tests: smoothing, pruning, SDD loading and (weighted)
model counting checked against exhaustive enumeration (the reference covers
this subsystem only indirectly; the ground-truth-by-enumeration pattern
follows ``tests/backend/torch/test_compile_circuit.py:27-50``)."""

import itertools

import numpy as np
import pytest

from cirkit_tpu.models.logic import (
    BottomNode,
    ConjunctionNode,
    DisjunctionNode,
    LiteralNode,
    LogicalCircuit,
    NegatedLiteralNode,
    SDD,
    TopNode,
)
from cirkit_tpu.models.utils import InputLayerFactory
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic.initializers import ConstantTensorInitializer
from cirkit_tpu.symbolic.layers import CategoricalLayer
from cirkit_tpu.symbolic.parameters import Parameter, TensorParameter
from cirkit_tpu.utils.scope import Scope


def _formula_graph():
    """(x0 and x1) or (not x0 and x2)."""
    x0, x1, x2 = LiteralNode(0), LiteralNode(1), LiteralNode(2)
    nx0 = NegatedLiteralNode(0)
    c1, c2 = ConjunctionNode(), ConjunctionNode()
    root = DisjunctionNode()
    nodes = [x0, x1, x2, nx0, c1, c2, root]
    in_nodes = {c1: [x0, x1], c2: [nx0, x2], root: [c1, c2]}
    return LogicalCircuit(nodes, in_nodes, [root])


def _truth(w):
    return (w[0] and w[1]) or ((not w[0]) and w[2])


def _worlds(n):
    return np.array(list(itertools.product([0, 1], repeat=n)), dtype=np.int64)


def test_node_scope_and_num_variables():
    lc = _formula_graph()
    assert lc.num_variables == 3
    assert lc.node_scope(lc.output) == Scope([0, 1, 2])


def test_smooth_produces_smooth_circuit():
    lc = _formula_graph()
    sc = lc.build_circuit(enforce_smoothness=True)
    assert sc.is_smooth
    assert sc.is_decomposable


def test_smooth_conjunction_shared_by_multiple_disjunctions():
    # Regression: a conjunction disjunct shared by two disjunctions with
    # different scopes. Growing it in place for the wider parent would leak
    # the new variables into the narrower parent (whose cached scope is
    # stale), leaving the result non-smooth.
    x0, x1, x2 = LiteralNode(0), LiteralNode(1), LiteralNode(2)
    nx0 = NegatedLiteralNode(0)
    c = ConjunctionNode()  # x0 and x1 — shared between d1 and d2
    t = ConjunctionNode()  # x0 and x1 and x2
    u = ConjunctionNode()  # not x0 and x1
    d1, d2, root = DisjunctionNode(), DisjunctionNode(), DisjunctionNode()
    lc = LogicalCircuit(
        [x0, x1, x2, nx0, c, t, u, d1, d2, root],
        {
            c: [x0, x1],
            t: [x0, x1, x2],
            u: [nx0, x1],
            d1: [c, t],
            d2: [c, u],
            root: [d1, d2],
        },
        [root],
    )
    sc = lc.build_circuit(enforce_smoothness=True)
    assert sc.is_smooth
    assert sc.is_decomposable

    # Disjunctions lower to sums, so overlapping disjuncts accumulate
    # multiplicity: value(w) = [x0^x1] + [x0^x1^x2] + [x0^x1] + [~x0^x1].
    ctx = PipelineContext(semiring="sum-product", fold=True)
    cc = ctx.compile(sc)
    worlds = _worlds(3)
    want = np.array(
        [2.0 * (w[0] & w[1]) + (w[0] & w[1] & w[2]) + ((1 - w[0]) & w[1]) for w in worlds]
    )
    np.testing.assert_allclose(np.asarray(cc(worlds))[:, 0, 0], want, atol=1e-12)
    icc = ctx.integrate(cc)
    z = np.asarray(icc(ctx.parameters, worlds[:1]))[0, 0, 0]
    np.testing.assert_allclose(z, want.sum(), rtol=1e-12)


@pytest.mark.parametrize("semiring", ["sum-product", "lse-sum"])
def test_boolean_evaluation_and_model_count(semiring):
    lc = _formula_graph()
    sc = lc.build_circuit()
    ctx = PipelineContext(semiring=semiring, fold=True)
    cc = ctx.compile(sc)
    worlds = _worlds(3)
    out = np.asarray(cc(worlds))[:, 0, 0]
    vals = np.exp(out) if semiring == "lse-sum" else out
    want = np.array([float(_truth(w)) for w in worlds])
    np.testing.assert_allclose(vals, want, atol=1e-9)

    # model count via the integral circuit
    icc = ctx.integrate(cc)
    z = np.asarray(icc(ctx.parameters, worlds[:1]))[0, 0, 0]
    z = np.exp(z) if semiring == "lse-sum" else z
    np.testing.assert_allclose(z, want.sum(), rtol=1e-9)


def test_prune_unit_propagation():
    # (x0 and False) or (x1 and True) == x1
    x0, x1 = LiteralNode(0), LiteralNode(1)
    bot, top = BottomNode(), TopNode()
    c1, c2 = ConjunctionNode(), ConjunctionNode()
    root = DisjunctionNode()
    lc = LogicalCircuit(
        [x0, x1, c1, c2, root, bot, top],
        {c1: [x0, bot], c2: [x1, top], root: [c1, c2]},
        [root],
    )
    lc.prune()
    # c1 absorbed by Bottom and dropped from the disjunction; c2 collapses to x1
    assert all(not isinstance(n, (TopNode, BottomNode)) for n in lc.nodes)
    assert isinstance(lc.output, DisjunctionNode)
    assert lc.node_inputs(lc.output) == [x1]

    sc = lc.build_circuit()
    ctx = PipelineContext(semiring="sum-product", fold=True)
    cc = ctx.compile(sc)
    worlds = _worlds(2)
    np.testing.assert_allclose(
        np.asarray(cc(worlds))[:, 0, 0], worlds[:, 1].astype(float), atol=1e-12
    )


def test_prune_to_constant_raises():
    x0 = LiteralNode(0)
    c = ConjunctionNode()
    lc = LogicalCircuit([x0, c, BottomNode()], {c: [x0, BottomNode()]}, [c])
    with pytest.raises(ValueError, match="reduced to a constant"):
        lc.build_circuit()


def _weighted_literal_factory(weights: np.ndarray, negated: bool) -> InputLayerFactory:
    # Logits parameterization: its partition function is ReduceLSE of the
    # logits, so unnormalized literal weights integrate correctly (the probs
    # parameterization is assumed normalized, matching the reference:
    # ``symbolic/operators.py:52-64``).
    def factory(scope: Scope, num_units: int) -> CategoricalLayer:
        (var,) = tuple(scope)
        w = weights[var, 1 - int(negated)]
        with np.errstate(divide="ignore"):  # log(0) = -inf is intended
            logits = np.log(np.array([w, 0.0]) if negated else np.array([0.0, w]))
        return CategoricalLayer(
            scope,
            num_units,
            num_categories=2,
            logits=Parameter.from_input(
                TensorParameter(
                    1, 2, initializer=ConstantTensorInitializer(logits), learnable=False
                )
            ),
        )

    return factory


def test_weighted_model_counting():
    rng = np.random.default_rng(42)
    weights = rng.uniform(0.1, 1.0, size=(3, 2))  # weights[v, value]
    lc = _formula_graph()
    sc = lc.build_circuit(
        literal_input_factory=_weighted_literal_factory(weights, negated=False),
        negated_literal_input_factory=_weighted_literal_factory(weights, negated=True),
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = _worlds(3)
    icc = ctx.integrate(cc)
    wmc = np.exp(np.asarray(icc(ctx.parameters, worlds[:1]))[0, 0, 0])
    want = sum(
        np.prod([weights[v, w[v]] for v in range(3)])
        for w in worlds
        if _truth(w)
    )
    np.testing.assert_allclose(wmc, want, rtol=1e-9)


def test_sdd_load_and_model_count(tmp_path):
    # (x0 and x1) or (not x0 and x2) as an SDD decomposition
    text = """c a comment line
sdd 6
L 1 0 1
L 2 2 2
L 3 0 -1
L 4 4 3
D 0 1 2 1 2 3 4
"""
    path = tmp_path / "formula.sdd"
    path.write_text(text, encoding="utf-8")
    sdd = SDD.load(str(path))
    assert sdd.num_variables == 3
    sc = sdd.build_circuit()
    ctx = PipelineContext(semiring="sum-product", fold=True)
    cc = ctx.compile(sc)
    worlds = _worlds(3)
    out = np.asarray(cc(worlds))[:, 0, 0]
    want = np.array([float(_truth(w)) for w in worlds])
    np.testing.assert_allclose(out, want, atol=1e-9)


def test_sdd_load_with_true_node(tmp_path):
    # x0 or (not x0 and True) == True over x0's branch; model count checks
    # that Top nodes inside decompositions prune correctly:
    # D = (x0 and x1) or (not x0 and True)
    text = """sdd 5
L 1 0 1
L 2 2 2
L 3 0 -1
T 4
D 0 1 2 1 2 3 4
"""
    path = tmp_path / "t.sdd"
    path.write_text(text, encoding="utf-8")
    sdd = SDD.load(str(path))
    sc = sdd.build_circuit()
    ctx = PipelineContext(semiring="sum-product", fold=True)
    cc = ctx.compile(sc)
    worlds = _worlds(2)
    want = np.array([float((w[0] and w[1]) or not w[0]) for w in worlds])
    np.testing.assert_allclose(np.asarray(cc(worlds))[:, 0, 0], want, atol=1e-9)


def test_sdd_malformed_raises(tmp_path):
    path = tmp_path / "bad.sdd"
    path.write_text("D 0 1 2 1 2\n", encoding="utf-8")
    with pytest.raises(ValueError, match="malformed"):
        SDD.load(str(path))


def test_most_probable_model_via_map_query():
    """Logic circuits compile deterministic (each world activates one
    parse), so MAPQuery is EXACT: it returns the highest-weight satisfying
    assignment — weighted MaxSAT by circuit compilation."""
    from cirkit_tpu.backend.jax.queries import MAPQuery

    rng = np.random.default_rng(43)
    weights = rng.uniform(0.1, 1.0, size=(3, 2))
    lc = _formula_graph()
    sc = lc.build_circuit(
        literal_input_factory=_weighted_literal_factory(weights, negated=False),
        negated_literal_input_factory=_weighted_literal_factory(weights, negated=True),
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    asg, val = MAPQuery(cc)(store=ctx.parameters)
    worlds = _worlds(3)
    sat = [w for w in worlds if _truth(w)]
    want = max(sat, key=lambda w: np.prod([weights[v, w[v]] for v in range(3)]))
    np.testing.assert_array_equal(np.asarray(asg[0]).astype(int), want)
    np.testing.assert_allclose(
        float(val[0]),
        np.log(np.prod([weights[v, want[v]] for v in range(3)])),
        rtol=1e-6,
    )
    # ... and the returned world satisfies the formula
    assert _truth(np.asarray(asg[0]).astype(int))
