"""Compiled-evaluation coverage for the remaining layer types and operators:
Binomial and Embedding inputs, polynomial products, compiled concatenation —
all against the enumeration/reference evaluator (ref coverage spread over
``tests/backend/torch/test_compile_circuit*.py``)."""

import numpy as np
import pytest

from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic.circuit import Circuit
from cirkit_tpu.symbolic.initializers import ConstantTensorInitializer
from cirkit_tpu.symbolic.layers import (
    BinomialLayer,
    EmbeddingLayer,
    HadamardLayer,
    PolynomialLayer,
    SumLayer,
)
from cirkit_tpu.symbolic.parameters import Parameter, TensorParameter
from cirkit_tpu.utils.scope import Scope

from tests.reference_eval import enumerate_worlds, eval_circuit

GRID = [(f, s) for f in (False, True) for s in ("sum-product", "lse-sum")]


def _const(arr):
    arr = np.asarray(arr, dtype=np.float64)
    return Parameter.from_input(
        TensorParameter(*arr.shape, initializer=ConstantTensorInitializer(arr))
    )


def _binomial_pc(rng, n=4):
    l0 = BinomialLayer(Scope([0]), 2, total_count=n, probs=_const(rng.uniform(0.2, 0.8, (2,))))
    l1 = BinomialLayer(Scope([1]), 2, total_count=n, probs=_const(rng.uniform(0.2, 0.8, (2,))))
    h = HadamardLayer(2, arity=2)
    s = SumLayer(2, 1, weight=_const(rng.dirichlet(np.ones(2))[None]))
    return Circuit([l0, l1, h, s], {h: [l0, l1], s: [h]}, [s])


@pytest.mark.parametrize("fold,semiring", GRID)
def test_compile_binomial_all_worlds_and_partition(fold, semiring):
    rng = np.random.default_rng(5)
    sc = _binomial_pc(rng)
    ctx = PipelineContext(semiring=semiring, fold=fold)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, 5)  # counts 0..4
    want = eval_circuit(sc, worlds)[:, 0, 0]
    got = np.asarray(cc(worlds))[:, 0, 0]
    if semiring == "lse-sum":
        got = np.exp(got)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # binomials are normalized: total probability mass is 1
    np.testing.assert_allclose(want.sum(), 1.0, rtol=1e-9)
    icc = ctx.integrate(cc)
    z = np.asarray(icc(ctx.parameters, worlds[:1]))[0, 0, 0]
    np.testing.assert_allclose(np.exp(z) if semiring == "lse-sum" else z, 1.0, rtol=1e-9)


@pytest.mark.parametrize("fold,semiring", GRID)
def test_compile_embedding_matches_reference(fold, semiring):
    rng = np.random.default_rng(6)
    l0 = EmbeddingLayer(Scope([0]), 3, num_states=4, weight=_const(rng.uniform(0.1, 1, (3, 4))))
    l1 = EmbeddingLayer(Scope([1]), 3, num_states=4, weight=_const(rng.uniform(0.1, 1, (3, 4))))
    h = HadamardLayer(3, arity=2)
    s = SumLayer(3, 1, weight=_const(rng.uniform(0.1, 1, (1, 3))))
    sc = Circuit([l0, l1, h, s], {h: [l0, l1], s: [h]}, [s])
    ctx = PipelineContext(semiring=semiring, fold=fold)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, 4)
    want = eval_circuit(sc, worlds)[:, 0, 0]
    got = np.asarray(cc(worlds))[:, 0, 0]
    if semiring == "lse-sum":
        got = np.exp(got)
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize("fold", [False, True])
def test_compiled_polynomial_product(fold):
    """Product of two polynomial circuits == product of the polynomials
    (FFT coefficient convolution at compile time, ref:
    ``parameters/nodes.py:991-1021``)."""
    rng = np.random.default_rng(7)
    c1 = rng.normal(size=(1, 3))  # degree 2
    c2 = rng.normal(size=(1, 4))  # degree 3

    def poly_circuit(coeff):
        p = PolynomialLayer(Scope([0]), 1, degree=coeff.shape[1] - 1, coeff=_const(coeff))
        s = SumLayer(1, 1, weight=_const([[1.0]]))
        return Circuit([p, s], {s: [p]}, [s])

    ctx = PipelineContext(semiring="sum-product", fold=fold)
    cc1 = ctx.compile(poly_circuit(c1))
    cc2 = ctx.compile(poly_circuit(c2))
    pcc = ctx.multiply(cc1, cc2)
    xs = np.linspace(-2.0, 2.0, 9)[:, None]
    got = np.asarray(pcc(xs))[:, 0, 0]
    want = np.polyval(c1[0, ::-1], xs[:, 0]) * np.polyval(c2[0, ::-1], xs[:, 0])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("fold,semiring", GRID)
def test_compiled_concatenate(fold, semiring):
    from tests.fixtures import build_bivariate_categorical_pc

    ctx = PipelineContext(semiring=semiring, fold=fold)
    sc1 = build_bivariate_categorical_pc(rng=np.random.default_rng(8))
    sc2 = build_bivariate_categorical_pc(rng=np.random.default_rng(9))
    cc1, cc2 = ctx.compile(sc1), ctx.compile(sc2)
    ccat = ctx.concatenate(cc1, cc2)
    worlds = enumerate_worlds(2, 3)
    got = np.asarray(ccat(worlds))
    assert got.shape[1] == 2  # two outputs stacked
    w1 = eval_circuit(sc1, worlds)[:, 0, 0]
    w2 = eval_circuit(sc2, worlds)[:, 0, 0]
    if semiring == "lse-sum":
        got = np.exp(got)
    np.testing.assert_allclose(got[:, 0, 0], w1, rtol=1e-9)
    np.testing.assert_allclose(got[:, 1, 0], w2, rtol=1e-9)

def test_out_of_range_categories_clamp():
    """Out-of-range category/state indices clamp to the valid range instead
    of mapping to an all-zero one-hot row (which would silently yield
    log p = 0, i.e. probability 1)."""
    from cirkit_tpu.symbolic.layers import CategoricalLayer

    rng = np.random.default_rng(11)
    probs = rng.dirichlet(np.ones(3), size=(1,))  # (K=1, N=3)
    cat = CategoricalLayer(Scope([0]), 1, num_categories=3, probs=_const(probs))
    s = SumLayer(1, 1, weight=_const(np.ones((1, 1))))
    sc = Circuit([cat, s], {s: [cat]}, [s])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    x = np.array([[0], [2], [3], [99], [-1]], dtype=np.int64)
    got = np.exp(np.asarray(cc(x))[:, 0, 0])
    np.testing.assert_allclose(got[2:4], probs[0, 2], rtol=1e-6)  # clamp high
    np.testing.assert_allclose(got[4], probs[0, 0], rtol=1e-6)  # clamp low

    emb = EmbeddingLayer(Scope([0]), 1, num_states=3, weight=_const(probs))
    s2 = SumLayer(1, 1, weight=_const(np.ones((1, 1))))
    sc2 = Circuit([emb, s2], {s2: [emb]}, [s2])
    cc2 = ctx.compile(sc2)
    got2 = np.exp(np.asarray(cc2(x))[:, 0, 0])
    np.testing.assert_allclose(got2[2:4], probs[0, 2], rtol=1e-6)
    np.testing.assert_allclose(got2[4], probs[0, 0], rtol=1e-6)
