"""Compile + evaluate correctness vs enumeration / quadrature ground truth,
parametrized over the fold x semiring grid (ref:
``tests/backend/torch/test_compile_circuit.py``)."""

import numpy as np
import pytest

from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import (
    build_bivariate_categorical_pc,
    build_bivariate_gaussian_pc,
    build_multivariate_categorical_pc,
)
from tests.reference_eval import enumerate_worlds, eval_circuit, partition_function

GRID = [
    (fold, semiring)
    for fold in (False, True)
    for semiring in ("sum-product", "lse-sum")
]
# the reference's key correctness harness parametrizes fold x optimize x
# semiring (ref: test_compile_circuit.py:76,88-91)
GRID3 = [(f, s, o) for f, s in GRID for o in ((False, True) if f else (False,))]


def _check(sc, ctx, worlds, num_states):
    cc = ctx.compile(sc)
    got = np.asarray(cc(worlds))
    want = eval_circuit(sc, worlds)
    if ctx._backend_kwargs.get("semiring") == "lse-sum":
        want = np.log(want)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    return cc


@pytest.mark.parametrize("fold,semiring", GRID)
def test_compile_bivariate_categorical(fold, semiring):
    ctx = PipelineContext(semiring=semiring, fold=fold)
    sc = build_bivariate_categorical_pc(rng=np.random.default_rng(0))
    _check(sc, ctx, enumerate_worlds(2, 3), 3)


@pytest.mark.parametrize("fold,semiring", GRID)
@pytest.mark.parametrize("use_softmax,use_logits", [(True, False), (False, True)])
def test_compile_parameterized_categorical(fold, semiring, use_softmax, use_logits):
    ctx = PipelineContext(semiring=semiring, fold=fold)
    sc = build_bivariate_categorical_pc(
        use_softmax=use_softmax, use_logits=use_logits, rng=np.random.default_rng(1)
    )
    _check(sc, ctx, enumerate_worlds(2, 3), 3)


@pytest.mark.parametrize("fold,semiring,optimize", GRID3)
def test_compile_multivariate_all_worlds_and_partition(fold, semiring, optimize):
    ctx = PipelineContext(semiring=semiring, fold=fold, optimize=optimize)
    sc = build_multivariate_categorical_pc(num_variables=4, rng=np.random.default_rng(2))
    cc = _check(sc, ctx, enumerate_worlds(4, 2), 2)
    icc = ctx.integrate(cc)
    z = np.asarray(icc(batch_size=1))[0, 0, 0]
    z_true = partition_function(sc, 2)[0, 0]
    if semiring == "lse-sum":
        z_true = np.log(z_true)
    np.testing.assert_allclose(z, z_true, rtol=1e-9)


def test_folding_reduces_layers_preserving_outputs():
    sc = build_multivariate_categorical_pc(num_variables=8, rng=np.random.default_rng(3))
    worlds = enumerate_worlds(8, 2)
    ctx_u = PipelineContext(semiring="lse-sum", fold=False)
    ctx_f = PipelineContext(semiring="lse-sum", fold=True)
    cc_u = ctx_u.compile(sc)
    cc_f = ctx_f.compile(sc)
    assert len(cc_f.layers) < len(cc_u.layers)
    np.testing.assert_allclose(
        np.asarray(cc_u(worlds)), np.asarray(cc_f(worlds)), rtol=1e-10
    )
    # parameter-count invariant: folding never changes the total
    assert cc_u.num_parameters() == cc_f.num_parameters()
    # but it does merge tensor slots (ref invariant: fewer folded tensors)
    assert len(cc_f.slots) < len(cc_u.slots)


@pytest.mark.parametrize("fold", [False, True])
def test_compile_gaussian_quadrature(fold):
    """Continuous ground truth via scipy dblquad (ref strategy:
    ``test_compile_circuit.py:53-73``)."""
    ctx = PipelineContext(semiring="lse-sum", fold=fold)
    sc = build_bivariate_gaussian_pc(rng=np.random.default_rng(4))
    cc = ctx.compile(sc)

    # pointwise check on a few points
    xs = np.array([[0.0, 0.0], [1.0, -1.0], [-0.5, 2.0]])
    got = np.asarray(cc(xs))[:, 0, 0]
    want = np.log(eval_circuit(sc, xs))[:, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-9)

    # the integral circuit computes Z == numerical quadrature of the density
    icc = ctx.integrate(cc)
    z = float(np.asarray(icc(batch_size=1))[0, 0, 0])
    nodes, weights = np.polynomial.legendre.leggauss(128)
    lo, hi = -12.0, 12.0
    pts = 0.5 * (hi - lo) * nodes + 0.5 * (hi + lo)
    w = 0.5 * (hi - lo) * weights
    xx, yy = np.meshgrid(pts, pts, indexing="ij")
    grid = np.stack([xx.ravel(), yy.ravel()], axis=1)
    vals = eval_circuit(sc, grid)[:, 0, 0].reshape(len(pts), len(pts))
    z_quad = float(w @ vals @ w)
    np.testing.assert_allclose(np.exp(z), z_quad, rtol=1e-6)


@pytest.mark.parametrize("fold,semiring", GRID)
def test_initialized_circuit_runs(fold, semiring):
    """Default-parameterized circuits (softmax/sigmoid reparams, random init).
    The sum weights use a softmax factory: raw Normal weights can be negative,
    which is NaN under lse-sum (matching the reference's semantics)."""
    from cirkit_tpu.symbolic import (
        CategoricalLayer,
        Circuit,
        HadamardLayer,
        NormalInitializer,
        Parameter,
        SoftmaxParameter,
        SumLayer,
        TensorParameter,
    )
    from cirkit_tpu.utils import Scope

    def softmax_factory(shape):
        return Parameter.from_unary(
            SoftmaxParameter(shape),
            TensorParameter(*shape, initializer=NormalInitializer()),
        )

    x0 = CategoricalLayer(Scope([0]), 3, num_categories=4)
    x1 = CategoricalLayer(Scope([1]), 3, num_categories=4)
    h = HadamardLayer(3, arity=2)
    s = SumLayer(3, 1, weight_factory=softmax_factory)
    sc = Circuit([x0, x1, h, s], {h: [x0, x1], s: [h]}, [s])
    ctx = PipelineContext(semiring=semiring, fold=fold)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, 4)
    out = np.asarray(cc(worlds))
    assert out.shape == (16, 1, 1)
    assert np.isfinite(out).all()


def test_pad_batch_to_reuses_one_compiled_program():
    sc = build_multivariate_categorical_pc(rng=np.random.default_rng(9))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    store = ctx.parameters
    full = enumerate_worlds(4, 2)
    want = np.asarray(cc.jit_evaluate(store, full))
    for b in (1, 3, 7, 16):
        got = np.asarray(cc.jit_evaluate(store, full[:b], pad_batch_to=16))
        np.testing.assert_allclose(got, want[:b], rtol=1e-12)
    # all padded sizes share the single "fwd" cache entry
    assert list(cc._jit_cache) == ["fwd"]
