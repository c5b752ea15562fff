"""Compiled circuit-operator tests: products, evidence, differentiation and
parameter sharing across derived circuits (ref:
``tests/backend/torch/test_compile_circuit_operators.py``)."""

import numpy as np
import pytest

from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import (
    build_bivariate_categorical_pc,
    build_bivariate_gaussian_pc,
    build_mixing_categorical_pc,
    build_multivariate_categorical_pc,
)
from tests.reference_eval import enumerate_worlds, eval_circuit

GRID = [(f, s) for f in (False, True) for s in ("sum-product", "lse-sum")]
# operator pipelines under the fusion optimizer too (rewrites must preserve
# the pointer-sharing and provenance machinery)
GRID_OPT = [(f, s, o) for f, s in GRID for o in ((False, True) if f else (False,))]


def _ctx(fold, semiring, optimize=False):
    return PipelineContext(semiring=semiring, fold=fold, optimize=optimize)


def _to_semiring(values, semiring):
    return np.log(values) if semiring == "lse-sum" else values


@pytest.mark.parametrize("fold,semiring,optimize", GRID_OPT)
@pytest.mark.parametrize("product", ["hadamard", "kronecker"])
def test_compiled_product(fold, semiring, optimize, product):
    ctx = _ctx(fold, semiring, optimize)
    sc1 = build_bivariate_categorical_pc(product=product, rng=np.random.default_rng(11))
    sc2 = build_bivariate_categorical_pc(product=product, rng=np.random.default_rng(12))
    cc1, cc2 = ctx.compile(sc1), ctx.compile(sc2)
    pcc = ctx.multiply(cc1, cc2)
    worlds = enumerate_worlds(2, 3)
    v1 = eval_circuit(sc1, worlds)[:, 0, 0]
    v2 = eval_circuit(sc2, worlds)[:, 0, 0]
    got = np.asarray(pcc(worlds))[:, 0, 0]
    np.testing.assert_allclose(got, _to_semiring(v1 * v2, semiring), rtol=1e-9)


@pytest.mark.parametrize("fold,semiring,optimize", GRID_OPT)
@pytest.mark.parametrize("a1,a2", [(2, 2), (2, 3)])
def test_compiled_product_mixing_sums(fold, semiring, optimize, a1, a2):
    """Products of mixing-sum (arity>1) circuits: the kron-weight column
    permutation in ``multiply_sum_layers`` must survive compilation, folding
    and the fusion optimizer (the reference lacks the permutation and gets
    these wrong)."""
    ctx = _ctx(fold, semiring, optimize)
    sc1 = build_mixing_categorical_pc(2, mix_arity=a1, seed=21)
    sc2 = build_mixing_categorical_pc(3, mix_arity=a2, seed=22)
    cc1, cc2 = ctx.compile(sc1), ctx.compile(sc2)
    pcc = ctx.multiply(cc1, cc2)
    worlds = enumerate_worlds(2, 3)
    v1 = eval_circuit(sc1, worlds)[:, 0, 0]
    v2 = eval_circuit(sc2, worlds)[:, 0, 0]
    got = np.asarray(pcc(worlds))[:, 0, 0]
    np.testing.assert_allclose(got, _to_semiring(v1 * v2, semiring), rtol=1e-9)
    ipcc = ctx.integrate(pcc)
    z = np.asarray(ipcc(batch_size=1))[0, 0, 0]
    np.testing.assert_allclose(z, _to_semiring((v1 * v2).sum(), semiring), rtol=1e-9)


@pytest.mark.parametrize("fold,semiring,optimize", GRID_OPT)
def test_compiled_product_then_integrate(fold, semiring, optimize):
    ctx = _ctx(fold, semiring, optimize)
    sc1 = build_multivariate_categorical_pc(rng=np.random.default_rng(13))
    sc2 = build_multivariate_categorical_pc(rng=np.random.default_rng(14))
    cc1, cc2 = ctx.compile(sc1), ctx.compile(sc2)
    pcc = ctx.multiply(cc1, cc2)
    ipcc = ctx.integrate(pcc)
    worlds = enumerate_worlds(4, 2)
    want = (
        eval_circuit(sc1, worlds)[:, 0, 0] * eval_circuit(sc2, worlds)[:, 0, 0]
    ).sum()
    got = np.asarray(ipcc(batch_size=1))[0, 0, 0]
    np.testing.assert_allclose(got, _to_semiring(want, semiring), rtol=1e-9)


@pytest.mark.parametrize("fold,semiring,optimize", GRID_OPT)
def test_compiled_gaussian_product(fold, semiring, optimize):
    ctx = _ctx(fold, semiring, optimize)
    sc1 = build_bivariate_gaussian_pc(rng=np.random.default_rng(15))
    sc2 = build_bivariate_gaussian_pc(rng=np.random.default_rng(16))
    cc1, cc2 = ctx.compile(sc1), ctx.compile(sc2)
    pcc = ctx.multiply(cc1, cc2)
    xs = np.array([[0.0, 0.5], [1.0, -1.5], [-2.0, 0.25]])
    v1 = eval_circuit(sc1, xs)[:, 0, 0]
    v2 = eval_circuit(sc2, xs)[:, 0, 0]
    got = np.asarray(pcc(xs))[:, 0, 0]
    np.testing.assert_allclose(got, _to_semiring(v1 * v2, semiring), rtol=1e-8)


@pytest.mark.parametrize("fold,semiring,optimize", GRID_OPT)
def test_compiled_evidence(fold, semiring, optimize):
    ctx = _ctx(fold, semiring, optimize)
    sc = build_multivariate_categorical_pc(rng=np.random.default_rng(17))
    cc = ctx.compile(sc)
    import cirkit_tpu.symbolic.functional as SF

    esc = SF.evidence(sc, {0: 1, 1: 0, 2: 1, 3: 1})
    ecc = ctx.compile(esc)
    want = eval_circuit(sc, np.array([[1, 0, 1, 1]]))[0, 0, 0]
    got = np.asarray(ecc(batch_size=1))[0, 0, 0]
    np.testing.assert_allclose(got, _to_semiring(want, semiring), rtol=1e-9)


@pytest.mark.parametrize("fold", [False, True])
def test_compiled_differentiation(fold):
    from tests.symbolic.test_operators import _poly_pc

    ctx = PipelineContext(semiring="sum-product", fold=fold)
    sc = _poly_pc()
    cc = ctx.compile(sc)
    dcc = ctx.differentiate(cc)
    xs = np.array([[0.3, -1.2], [1.5, 0.7]])
    eps = 1e-6
    got = np.asarray(dcc(xs))[:, :, 0]  # (B, 3)
    for i, x in enumerate(xs):
        f = lambda a, b: eval_circuit(sc, np.array([[a, b]]))[0, 0, 0]
        d0 = (f(x[0] + eps, x[1]) - f(x[0] - eps, x[1])) / (2 * eps)
        d1 = (f(x[0], x[1] + eps) - f(x[0], x[1] - eps)) / (2 * eps)
        np.testing.assert_allclose(got[i, 0], d0, rtol=1e-5)
        np.testing.assert_allclose(got[i, 1], d1, rtol=1e-5)
        np.testing.assert_allclose(got[i, 2], f(*x), rtol=1e-9)


@pytest.mark.parametrize("fold", [False, True])
def test_parameter_sharing_after_update(fold):
    """Updating the shared store changes both the base and derived circuits:
    the slot-pointer chain (ReferenceParameter -> JaxPointerSlot) really
    aliases storage rather than copying."""
    import jax.numpy as jnp

    ctx = PipelineContext(semiring="lse-sum", fold=fold)
    # logits-parameterized: the integral circuit's log-partition is a
    # ReduceLSE over a *pointer* to the base circuit's logits slots
    sc = build_bivariate_categorical_pc(use_logits=True, rng=np.random.default_rng(18))
    cc = ctx.compile(sc)
    icc = ctx.integrate(cc)
    store = dict(ctx.parameters)
    z0 = float(np.asarray(icc(store, batch_size=1))[0, 0, 0])
    # perturb every learnable slot of the BASE circuit
    for s in cc.learnable_slots:
        store[s] = store[s] * 2.0
    z1 = float(np.asarray(icc(store, batch_size=1))[0, 0, 0])
    assert not np.isclose(z0, z1)
    # and the derived circuit tracks the base exactly
    worlds = enumerate_worlds(2, 3)
    lls = np.asarray(cc(store, jnp.asarray(worlds)))[:, 0, 0]
    np.testing.assert_allclose(np.log(np.exp(lls).sum()), z1, rtol=1e-9)


@pytest.mark.parametrize("fold,semiring,optimize", GRID_OPT)
def test_compiled_multiply_then_evidence(fold, semiring, optimize):
    """Product circuit pinned to an observation: multiply then evidence
    (ref coverage: ``test_compile_circuit_operators.py`` multiply-evidence)."""
    import cirkit_tpu.symbolic.functional as SF

    ctx = _ctx(fold, semiring, optimize)
    sc1 = build_bivariate_categorical_pc(rng=np.random.default_rng(21))
    sc2 = build_bivariate_categorical_pc(rng=np.random.default_rng(22))
    ctx.compile(sc1), ctx.compile(sc2)
    prod = SF.multiply(sc1, sc2)
    esc = SF.evidence(prod, {0: 2, 1: 1})
    ecc = ctx.compile(esc)
    xs = np.array([[2, 1]])
    want = eval_circuit(sc1, xs)[0, 0, 0] * eval_circuit(sc2, xs)[0, 0, 0]
    got = np.asarray(ecc(batch_size=1))[0, 0, 0]
    np.testing.assert_allclose(got, _to_semiring(want, semiring), rtol=1e-9)


@pytest.mark.parametrize("fold", [False, True])
def test_compiled_second_order_differentiation(fold):
    """order=2 differentiation: second partials vs central finite
    differences of the compiled circuit."""
    from tests.symbolic.test_operators import _poly_pc

    ctx = PipelineContext(semiring="sum-product", fold=fold)
    sc = _poly_pc()
    cc = ctx.compile(sc)
    d2cc = ctx.differentiate(cc, order=2)
    xs = np.array([[0.4, -0.8], [1.1, 0.6]])
    got = np.asarray(d2cc(xs))[:, :, 0]  # (B, num_output_blocks)

    def f(x):
        return np.asarray(cc(x[None]))[0, 0, 0]

    eps = 1e-4
    for b, x in enumerate(xs):
        # d^2/dx0^2 via central differences
        e0 = np.array([eps, 0.0])
        d2x0 = (f(x + e0) - 2 * f(x) + f(x - e0)) / eps**2
        np.testing.assert_allclose(got[b, 0], d2x0, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fold,semiring,optimize", GRID_OPT)
def test_compiled_disjoint_scope_product(fold, semiring, optimize):
    """ctx.multiply of circuits over DISJOINT scopes (an extension; the
    reference restricts products to same-scope): the compiled product
    equals the outer product on the union scope, with shared parameters."""

    ctx = _ctx(fold, semiring, optimize)
    from tests.fixtures import build_pc_over

    sc1 = build_pc_over((0, 1), seed=21)
    sc2 = build_pc_over((2, 3), seed=22)
    cc1, cc2 = ctx.compile(sc1), ctx.compile(sc2)
    pcc = ctx.multiply(cc1, cc2)
    worlds = enumerate_worlds(4, 3)
    w1 = eval_circuit(sc1, worlds)[:, 0, 0]
    w2 = eval_circuit(sc2, worlds)[:, 0, 0]
    got = np.asarray(pcc(worlds))[:, 0, :].reshape(-1)
    np.testing.assert_allclose(got, _to_semiring(w1 * w2, semiring), rtol=1e-9)
