"""Symbolic-operator tests with enumeration oracles (ref:
``tests/symbolic/test_circuit_operators.py``)."""

import numpy as np
import pytest

import cirkit_tpu.symbolic.functional as SF
from cirkit_tpu.symbolic import (
    CategoricalLayer,
    Circuit,
    ConstantValueLayer,
    EvidenceLayer,
    HadamardLayer,
    KroneckerLayer,
    PolynomialLayer,
    StructuralPropertyError,
    SumLayer,
)
from cirkit_tpu.utils import Scope

from tests.fixtures import (
    build_bivariate_categorical_pc,
    build_mixing_categorical_pc,
    build_multivariate_categorical_pc,
    build_pc_over,
    const_param,
)
from tests.reference_eval import enumerate_worlds, eval_circuit, partition_function


def test_integrate_replaces_input_layers():
    sc = build_bivariate_categorical_pc()
    isc = SF.integrate(sc)
    assert all(
        isinstance(sl, (ConstantValueLayer, HadamardLayer, SumLayer)) for sl in isc.layers
    )
    # the integral circuit computes the exhaustive-sum partition function
    z_enum = partition_function(sc, num_states=3)
    z_circ = eval_circuit(isc, np.zeros((1, 0)))[0]
    assert np.allclose(z_circ, z_enum, rtol=1e-12)


def test_integrate_partial_scope():
    sc = build_multivariate_categorical_pc(num_variables=4)
    isc = SF.integrate(sc, Scope([1, 3]))
    worlds = enumerate_worlds(4, 2)
    full = eval_circuit(sc, worlds).reshape(2, 2, 2, 2)
    marg = full.sum(axis=(1, 3))  # sum over vars 1 and 3
    # evaluate the integral circuit on the remaining vars 0 and 2
    for a in range(2):
        for c in range(2):
            x = np.zeros((1, 4), dtype=np.int64)
            x[0, 0], x[0, 2] = a, c
            got = eval_circuit(isc, x)[0, 0, 0]
            assert np.isclose(got, marg[a, c], rtol=1e-12)


def test_integrate_requires_structural_properties():
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit

    x0 = CategoricalLayer(Scope([0]), 2, num_categories=2)
    x0b = CategoricalLayer(Scope([0]), 2, num_categories=2)
    h = HadamardLayer(2, arity=2)
    sc = Circuit([x0, x0b, h], {h: [x0, x0b]}, [h])
    with pytest.raises(StructuralPropertyError):
        SF.integrate(sc)


@pytest.mark.parametrize("product", ["hadamard", "kronecker"])
def test_multiply_matches_pointwise_product(product):
    rng1 = np.random.default_rng(1)
    rng2 = np.random.default_rng(2)
    sc1 = build_bivariate_categorical_pc(product=product, rng=rng1)
    sc2 = build_bivariate_categorical_pc(product=product, rng=rng2)
    psc = SF.multiply(sc1, sc2)
    worlds = enumerate_worlds(2, 3)
    v1 = eval_circuit(sc1, worlds)[:, 0, 0]
    v2 = eval_circuit(sc2, worlds)[:, 0, 0]
    vp = eval_circuit(psc, worlds)[:, 0, 0]
    assert np.allclose(vp, v1 * v2, rtol=1e-10)
    assert psc.is_smooth and psc.is_decomposable


def test_multiply_then_integrate_expectation():
    sc1 = build_multivariate_categorical_pc(rng=np.random.default_rng(3))
    sc2 = build_multivariate_categorical_pc(rng=np.random.default_rng(4))
    psc = SF.multiply(sc1, sc2)
    ipsc = SF.integrate(psc)
    worlds = enumerate_worlds(4, 2)
    expected = (
        eval_circuit(sc1, worlds)[:, 0, 0] * eval_circuit(sc2, worlds)[:, 0, 0]
    ).sum()
    got = eval_circuit(ipsc, np.zeros((1, 0)))[0, 0, 0]
    assert np.isclose(got, expected, rtol=1e-10)


def test_multiply_incompatible_raises():
    # different vtrees: ((0,1),(2,3)) vs ((0,(1,2)),3)-ish via different splits
    sc1 = build_multivariate_categorical_pc(num_variables=3)
    sc2 = build_multivariate_categorical_pc(num_variables=4)
    with pytest.raises((StructuralPropertyError, NotImplementedError)):
        SF.multiply(sc1, sc2)


def test_evidence_pins_observation():
    sc = build_bivariate_categorical_pc()
    esc = SF.evidence(sc, {0: 1, 1: 2})
    assert any(isinstance(sl, EvidenceLayer) for sl in esc.layers)
    x = np.array([[1, 2]])
    want = eval_circuit(sc, x)[0, 0, 0]
    got = eval_circuit(esc, np.zeros((1, 0)))[0, 0, 0]
    assert np.isclose(got, want, rtol=1e-12)


def _poly_pc():
    c0 = const_param(np.array([[1.0, 2.0, 1.0], [0.5, 0.0, 1.0]]))
    c1 = const_param(np.array([[0.0, 1.0], [2.0, 3.0]]))
    x0 = PolynomialLayer(Scope([0]), 2, degree=2, coeff=c0)
    x1 = PolynomialLayer(Scope([1]), 2, degree=1, coeff=c1)
    h = HadamardLayer(2, arity=2)
    s = SumLayer(2, 1, weight=const_param(np.array([[1.0, 0.5]])))
    from cirkit_tpu.symbolic import Circuit

    return Circuit([x0, x1, h, s], {h: [x0, x1], s: [h]}, [s])


def test_differentiate_polynomial_circuit():
    sc = _poly_pc()
    dsc = SF.differentiate(sc)
    assert len(dsc.outputs) == 3  # d/dx0, d/dx1, plus a copy of the circuit
    xs = np.array([[0.3, -1.2], [1.5, 0.7]])
    eps = 1e-6
    vals = eval_circuit(dsc, xs)[:, :, 0]  # (B, 3)
    for i, x in enumerate(xs):
        f = lambda a, b: eval_circuit(sc, np.array([[a, b]]))[0, 0, 0]
        d0 = (f(x[0] + eps, x[1]) - f(x[0] - eps, x[1])) / (2 * eps)
        d1 = (f(x[0], x[1] + eps) - f(x[0], x[1] - eps)) / (2 * eps)
        assert np.isclose(vals[i, 0], d0, rtol=1e-5)
        assert np.isclose(vals[i, 1], d1, rtol=1e-5)
        assert np.isclose(vals[i, 2], f(*x), rtol=1e-10)


def test_multiply_polynomials():
    sc1, sc2 = _poly_pc(), _poly_pc()
    psc = SF.multiply(sc1, sc2)
    xs = np.array([[0.3, -1.2], [1.5, 0.7]])
    v = eval_circuit(sc1, xs)[:, 0, 0]
    vp = eval_circuit(psc, xs)[:, 0, 0]
    assert np.allclose(vp, v * v, rtol=1e-10)


def test_concatenate_stacks_outputs():
    sc1 = build_bivariate_categorical_pc(rng=np.random.default_rng(5))
    sc2 = build_bivariate_categorical_pc(rng=np.random.default_rng(6))
    csc = SF.concatenate([sc1, sc2])
    worlds = enumerate_worlds(2, 3)
    got = eval_circuit(csc, worlds)
    assert got.shape == (9, 2, 1)
    assert np.allclose(got[:, 0], eval_circuit(sc1, worlds)[:, 0])
    assert np.allclose(got[:, 1], eval_circuit(sc2, worlds)[:, 0])


def test_conjugate_real_circuit_is_identity():
    sc = build_bivariate_categorical_pc()
    csc = SF.conjugate(sc)
    worlds = enumerate_worlds(2, 3)
    assert np.allclose(
        eval_circuit(csc, worlds), eval_circuit(sc, worlds), rtol=1e-12
    )


def test_multiply_kronecker_permutation():
    """The Kronecker x Kronecker product rule emits a constant permutation sum
    layer; check the composed circuit computes the true pointwise product."""
    sc1 = build_bivariate_categorical_pc(product="kronecker", rng=np.random.default_rng(7))
    sc2 = build_bivariate_categorical_pc(product="kronecker", rng=np.random.default_rng(8))
    psc = SF.multiply(sc1, sc2)
    assert any(isinstance(sl, KroneckerLayer) for sl in psc.layers)
    worlds = enumerate_worlds(2, 3)
    v1 = eval_circuit(sc1, worlds)[:, 0, 0]
    v2 = eval_circuit(sc2, worlds)[:, 0, 0]
    vp = eval_circuit(psc, worlds)[:, 0, 0]
    assert np.allclose(vp, v1 * v2, rtol=1e-10)


@pytest.mark.parametrize("prod_cls", [KroneckerLayer, HadamardLayer])
@pytest.mark.parametrize(
    "order1,order2",
    [((1, 0), (0, 1)), ((1, 0), (1, 0)), ((1, 2, 0), (0, 1, 2)), ((2, 0, 1), (1, 2, 0))],
)
def test_multiply_kronecker_child_order(prod_cls, order1, order2):
    """Products of circuits whose PRODUCT layers wire children in
    non-scope-sorted order: the recursion must pair children by scope in
    l1's OWN child order and (for Kronecker) post-compose a digit
    correction, because the parent sum weights were laid out against each
    operand's own composite-digit order. A total-order scope sort (our
    pre-round-5 code) silently breaks even the both-reversed case; the
    reference's subset-partial-order "sort" pairs positionally, which is
    correct for same-order operands but REJECTS mixed-order ones as
    incompatible — we accept and get both right (see
    ``test_reference_parity.py::
    test_kronecker_child_order_product_beyond_reference``)."""
    nv = len(order1)
    rng = np.random.default_rng(31)
    K = 2

    def build(seed, order):
        r = np.random.default_rng(seed)
        leaves = []
        for v in range(nv):
            raw = r.uniform(0.1, 1.0, (K, 3))
            leaves.append(
                CategoricalLayer(
                    Scope([v]), K, num_categories=3,
                    probs=const_param(raw / raw.sum(1, keepdims=True)),
                )
            )
        prod = prod_cls(K, arity=nv)
        kin = K**nv if prod_cls is KroneckerLayer else K
        root = SumLayer(kin, 1, weight=const_param(r.uniform(0.1, 1.0, (1, kin))))
        kids = [leaves[i] for i in order]
        return Circuit(leaves + [prod, root], {prod: kids, root: [prod]}, [root])

    sc1, sc2 = build(41, order1), build(42, order2)
    worlds = enumerate_worlds(nv, 3)
    v1 = eval_circuit(sc1, worlds)[:, 0, 0]
    v2 = eval_circuit(sc2, worlds)[:, 0, 0]
    vp = eval_circuit(SF.multiply(sc1, sc2), worlds)[:, 0, 0]
    assert np.allclose(vp, v1 * v2, rtol=1e-10)


@pytest.mark.parametrize(
    "a1,a2,k1,k2", [(2, 2, 2, 3), (1, 2, 2, 3), (3, 2, 2, 2), (2, 3, 3, 2), (2, 2, 1, 3)]
)
def test_multiply_mixing_sums(a1, a2, k1, k2):
    """Products of circuits with arity>1 (mixing) sums: the kron'd weight
    columns run (a1, i1, a2, i2) while the paired children are wired
    (a1, a2, i1, i2) — ``multiply_sum_layers`` must permute. The reference
    omits the permutation (``symbolic/operators.py:260-270``), so its
    mixing-sum products are silently wrong; here every combination is pinned
    against the enumeration oracle."""
    sc1 = build_mixing_categorical_pc(k1, mix_arity=a1, seed=11)
    sc2 = build_mixing_categorical_pc(k2, mix_arity=a2, seed=12)
    psc = SF.multiply(sc1, sc2)
    worlds = enumerate_worlds(2, 3)
    v1 = eval_circuit(sc1, worlds)[:, 0, 0]
    v2 = eval_circuit(sc2, worlds)[:, 0, 0]
    vp = eval_circuit(psc, worlds)[:, 0, 0]
    assert np.allclose(vp, v1 * v2, rtol=1e-10)
    # the integral of the product (expectation-style pipeline) also agrees
    # with the exhaustive sum
    z = eval_circuit(SF.integrate(psc), np.zeros((1, 0)))[0]
    assert np.allclose(z, np.sum(v1 * v2), rtol=1e-10)


def test_multiply_disjoint_scopes_is_outer_product():
    """Disjoint-scope multiply — an extension (the reference restricts to
    same-scope, ref functional.py:295-296): p(x_{0,1}) q(x_{2,3}) over the
    union scope equals the outer product, stays smooth + decomposable,
    and partial overlap still raises."""
    sc1 = build_pc_over((0, 1), seed=5)
    sc2 = build_pc_over((2, 3), seed=6)
    psc = SF.multiply(sc1, sc2)
    assert psc.scope == Scope([0, 1, 2, 3])
    assert psc.is_smooth and psc.is_decomposable
    worlds = enumerate_worlds(4, 3)
    # eval_circuit gathers each circuit's own scope columns from the full
    # worlds; evaluate everything on the full assignment
    vp = eval_circuit(psc, worlds)[:, 0, 0]
    w1 = eval_circuit(sc1, worlds)[:, 0, 0]
    w2 = eval_circuit(sc2, worlds)[:, 0, 0]
    assert np.allclose(vp, w1 * w2, rtol=1e-10)

    # operator composition over the union scope: integrate factorizes
    ipsc = SF.integrate(psc)
    z1 = eval_circuit(SF.integrate(sc1), np.zeros((1, 0)))[0, 0, 0]
    z2 = eval_circuit(SF.integrate(sc2), np.zeros((1, 0)))[0, 0, 0]
    zp = eval_circuit(ipsc, np.zeros((1, 0)))[0, 0, 0]
    assert np.isclose(zp, z1 * z2, rtol=1e-10)

    # partial overlap composes too (see test_multiply_partial_overlap_*)
    sc3 = build_pc_over((1, 2), seed=7)
    po = SF.multiply(sc1, sc3)
    assert po.scope == Scope([0, 1, 2])
    assert po.is_smooth and po.is_decomposable


def test_multiply_disjoint_multi_output_shares_splices():
    """Multi-output disjoint products memoize the spliced copies: the
    shared operand's layers appear ONCE, not once per output pair."""
    from cirkit_tpu.symbolic.layers import CategoricalLayer, HadamardLayer, SumLayer
    from cirkit_tpu.symbolic.circuit import Circuit

    sc1 = build_pc_over((0, 1), seed=8)
    # a 2-output circuit over (2, 3): two roots over one shared product
    rng = np.random.default_rng(9)
    leaves = []
    for v in (2, 3):
        raw = rng.uniform(0.1, 1.0, size=(2, 3))
        leaves.append(
            CategoricalLayer(Scope([v]), 2, num_categories=3,
                             probs=const_param(raw / raw.sum(1, keepdims=True)))
        )
    prod = HadamardLayer(2, arity=2)
    r1 = SumLayer(2, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, 2))))
    r2 = SumLayer(2, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, 2))))
    sc2 = Circuit(leaves + [prod, r1, r2],
                  {prod: leaves, r1: [prod], r2: [prod]}, [r1, r2])

    psc = SF.multiply(sc1, sc2)
    n1 = len(list(sc1.topological_ordering()))
    n2 = len(list(sc2.topological_ordering()))
    np_ = len(list(psc.topological_ordering()))
    # shared splices: every operand layer once + one Kronecker per pair
    assert np_ == n1 + n2 + 2, (np_, n1, n2)
    # both heads still compute the right products
    worlds = enumerate_worlds(4, 3)
    vp = eval_circuit(psc, worlds)
    w1 = eval_circuit(sc1, worlds)[:, 0, 0]
    w2 = eval_circuit(sc2, worlds)  # (B, 2, 1)
    assert np.allclose(vp[:, 0, 0], w1 * w2[:, 0, 0], rtol=1e-10)
    assert np.allclose(vp[:, 1, 0], w1 * w2[:, 1, 0], rtol=1e-10)


# -- partial-overlap products (extension; the reference is same-scope only) --


def _chain_pc(vars_, kind, seed, num_units=2):
    """p(v0, v1) with one product (Hadamard/Kronecker) and a dense root."""
    rng = np.random.default_rng(seed)
    leaves = []
    for v in vars_:
        raw = rng.uniform(0.1, 1.0, size=(num_units, 3))
        leaves.append(
            CategoricalLayer(
                Scope([v]), num_units, num_categories=3,
                probs=const_param(raw / raw.sum(axis=1, keepdims=True)),
            )
        )
    if len(vars_) == 1:
        root = SumLayer(
            num_units, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, num_units)))
        )
        return Circuit(leaves + [root], {root: leaves}, [root])
    prod_cls = HadamardLayer if kind == "had" else KroneckerLayer
    prod = prod_cls(num_units, arity=len(vars_))
    m = num_units if kind == "had" else num_units ** len(vars_)
    root = SumLayer(m, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, m))))
    return Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])


@pytest.mark.parametrize("k1,k2", [("had", "had"), ("kron", "kron"), ("had", "kron")])
def test_multiply_partial_overlap_chain(k1, k2):
    """p(x0, x1) q(x1, x2): the product over the union scope equals the
    pointwise product — sums distribute one-sidedly, the shared-scope
    children pair, the private children splice through, and mixed-width
    composites assemble via the broadcast combine. Beyond the reference
    (same-scope only, ref functional.py:295-296)."""
    sc1 = _chain_pc((0, 1), k1, seed=11)
    sc2 = _chain_pc((1, 2), k2, seed=12, num_units=3)
    psc = SF.multiply(sc1, sc2)
    assert psc.scope == Scope([0, 1, 2])
    assert psc.is_smooth and psc.is_decomposable
    worlds = enumerate_worlds(3, 3)
    want = eval_circuit(sc1, worlds)[:, 0, 0] * eval_circuit(sc2, worlds)[:, 0, 0]
    got = eval_circuit(psc, worlds)[:, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-10)
    z = eval_circuit(SF.integrate(psc), np.zeros((1, 0)))[0, 0, 0]
    np.testing.assert_allclose(z, want.sum(), rtol=1e-10)


def test_multiply_partial_overlap_univariate_absorb():
    """p(x0, x1) q(x1): the univariate factor lands inside the matching
    product child; widths differ (2 vs 3 units) on purpose."""
    sc1 = _chain_pc((0, 1), "kron", seed=13)
    sc2 = _chain_pc((1,), "had", seed=14, num_units=3)  # single-var circuit
    psc = SF.multiply(sc1, sc2)
    worlds = enumerate_worlds(2, 3)
    want = eval_circuit(sc1, worlds)[:, 0, 0] * eval_circuit(sc2, worlds)[:, 0, 0]
    np.testing.assert_allclose(eval_circuit(psc, worlds)[:, 0, 0], want, rtol=1e-10)


def test_multiply_disjoint_unequal_widths():
    """Disjoint-scope multiply no longer requires equal root widths: the
    broadcast combine builds the (w1 * w2) outer product directly."""
    sc1 = _chain_pc((0,), "had", seed=15, num_units=2)
    sc2 = _chain_pc((1,), "had", seed=16, num_units=3)
    psc = SF.multiply(sc1, sc2)
    worlds = enumerate_worlds(2, 3)
    want = eval_circuit(sc1, worlds)[:, 0, 0] * eval_circuit(sc2, worlds)[:, 0, 0]
    np.testing.assert_allclose(eval_circuit(psc, worlds)[:, 0, 0], want, rtol=1e-10)


def test_multiply_partial_overlap_granularity_mismatch():
    """p partitions {0,1} as ONE child while q splits {0} / {1,3} at its
    top level — a granularity mismatch, NOT an incompatibility: both sides
    eventually split {0} / {1}, so the component matcher groups q's finer
    children under a virtual product and the product is exact."""
    rng = np.random.default_rng(17)

    def leaf(v, k=2):
        raw = rng.uniform(0.1, 1.0, size=(k, 3))
        return CategoricalLayer(
            Scope([v]), k, num_categories=3,
            probs=const_param(raw / raw.sum(axis=1, keepdims=True)),
        )

    # p over {0,1,2}: ({0,1}, {2})
    l0, l1, l2v = leaf(0), leaf(1), leaf(2)
    h01 = HadamardLayer(2, arity=2)
    s01 = SumLayer(2, 2, weight=const_param(rng.uniform(0.1, 1.0, (2, 2))))
    hp = HadamardLayer(2, arity=2)
    rp = SumLayer(2, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, 2))))
    p = Circuit(
        [l0, l1, l2v, h01, s01, hp, rp],
        {h01: [l0, l1], s01: [h01], hp: [s01, l2v], rp: [hp]},
        [rp],
    )
    # q over {0,1,3}: ({0}, {1,3})
    m0, m1, m3 = leaf(0), leaf(1), leaf(3)
    h13 = HadamardLayer(2, arity=2)
    s13 = SumLayer(2, 2, weight=const_param(rng.uniform(0.1, 1.0, (2, 2))))
    hq = HadamardLayer(2, arity=2)
    rq = SumLayer(2, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, 2))))
    q = Circuit(
        [m0, m1, m3, h13, s13, hq, rq],
        {h13: [m1, m3], s13: [h13], hq: [m0, s13], rq: [hq]},
        [rq],
    )
    psc = SF.multiply(p, q)
    worlds = enumerate_worlds(4, 3)
    want = eval_circuit(p, worlds)[:, 0, 0] * eval_circuit(q, worlds)[:, 0, 0]
    np.testing.assert_allclose(eval_circuit(psc, worlds)[:, 0, 0], want, rtol=1e-10)


def test_multiply_partial_overlap_interleaved_raises():
    """Genuinely interleaved shared-scope partitions are intractable: p
    splits the shared vars as {0} / {1,2} while q splits {0,1} / {2} —
    neither refines the other."""
    rng = np.random.default_rng(18)

    def leaf(v, k=2):
        raw = rng.uniform(0.1, 1.0, size=(k, 3))
        return CategoricalLayer(
            Scope([v]), k, num_categories=3,
            probs=const_param(raw / raw.sum(axis=1, keepdims=True)),
        )

    # p over {0,1,2}: ({0}, {1,2})
    l0, l1v, l2v = leaf(0), leaf(1), leaf(2)
    h12 = HadamardLayer(2, arity=2)
    s12 = SumLayer(2, 2, weight=const_param(rng.uniform(0.1, 1.0, (2, 2))))
    hp = HadamardLayer(2, arity=2)
    rp = SumLayer(2, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, 2))))
    p = Circuit(
        [l0, l1v, l2v, h12, s12, hp, rp],
        {h12: [l1v, l2v], s12: [h12], hp: [l0, s12], rp: [hp]},
        [rp],
    )
    # q over {0,1,2,3}: ({0,1}, {2,3})
    m0, m1, m2, m3 = leaf(0), leaf(1), leaf(2), leaf(3)
    h01 = HadamardLayer(2, arity=2)
    s01 = SumLayer(2, 2, weight=const_param(rng.uniform(0.1, 1.0, (2, 2))))
    h23 = HadamardLayer(2, arity=2)
    s23 = SumLayer(2, 2, weight=const_param(rng.uniform(0.1, 1.0, (2, 2))))
    hq = HadamardLayer(2, arity=2)
    rq = SumLayer(2, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, 2))))
    q = Circuit(
        [m0, m1, m2, m3, h01, s01, h23, s23, hq, rq],
        {h01: [m0, m1], s01: [h01], h23: [m2, m3], s23: [h23],
         hq: [s01, s23], rq: [hq]},
        [rq],
    )
    with pytest.raises(StructuralPropertyError, match="interleaved"):
        SF.multiply(p, q)


def test_multiply_partial_overlap_chains_compose():
    """(A * B) * C over windows {0,1} x {1,2} x {2,3}: the second multiply
    recurses over the FIRST product's broadcast selection sums and
    Hadamard combines — fusion pipelines compose."""
    a = _chain_pc((0, 1), "had", seed=21)
    b = _chain_pc((1, 2), "kron", seed=22, num_units=3)
    c = _chain_pc((2, 3), "had", seed=23)
    ab = SF.multiply(a, b)
    abc = SF.multiply(ab, c)
    assert abc.scope == Scope([0, 1, 2, 3])
    assert abc.is_smooth and abc.is_decomposable
    worlds = enumerate_worlds(4, 3)
    want = (
        eval_circuit(a, worlds)[:, 0, 0]
        * eval_circuit(b, worlds)[:, 0, 0]
        * eval_circuit(c, worlds)[:, 0, 0]
    )
    np.testing.assert_allclose(eval_circuit(abc, worlds)[:, 0, 0], want, rtol=1e-10)
    z = eval_circuit(SF.integrate(abc), np.zeros((1, 0)))[0, 0, 0]
    np.testing.assert_allclose(z, want.sum(), rtol=1e-10)


def _mixing_pc_over(v1, v2, num_units, seed, mix_out=2):
    """p(v1, v2) whose root feeds from a MIXING (arity-2) sum over two
    parallel Hadamard decompositions of the same partition."""
    rng = np.random.default_rng(seed)
    layers, leaves, hads = [], [], []
    for _ in range(2):
        pair = []
        for v in (v1, v2):
            raw = rng.uniform(0.1, 1.0, size=(num_units, 3))
            pair.append(
                CategoricalLayer(
                    Scope([v]), num_units, num_categories=3,
                    probs=const_param(raw / raw.sum(axis=1, keepdims=True)),
                )
            )
        leaves.extend(pair)
        hads.append(HadamardLayer(num_units, arity=2))
    mix = SumLayer(
        num_units, mix_out, arity=2,
        weight=const_param(rng.uniform(0.1, 1.0, (mix_out, 2 * num_units))),
    )
    root = SumLayer(
        mix_out, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, mix_out)))
    )
    in_layers = {h: leaves[2 * i : 2 * i + 2] for i, h in enumerate(hads)}
    in_layers[mix] = hads
    in_layers[root] = [mix]
    return Circuit(leaves + hads + [mix, root], in_layers, [root])


def _wide_product_pc(seed, num_units=2):
    """p(x0, x1, x2) whose root feeds from a WIDE Hadamard whose second
    child covers {1, 2} as one (coarser) unit — paired against a circuit
    over {1, 2} this Hadamard meets that circuit's sum directly."""
    rng = np.random.default_rng(seed)

    def leaf(v):
        raw = rng.uniform(0.1, 1.0, size=(num_units, 3))
        return CategoricalLayer(
            Scope([v]), num_units, num_categories=3,
            probs=const_param(raw / raw.sum(axis=1, keepdims=True)),
        )

    l0, l1, l2 = leaf(0), leaf(1), leaf(2)
    g12 = HadamardLayer(num_units, arity=2)
    hp = HadamardLayer(num_units, arity=2)
    root = SumLayer(
        num_units, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, num_units)))
    )
    return Circuit(
        [l0, l1, l2, g12, hp, root],
        {g12: [l1, l2], hp: [l0, g12], root: [hp]},
        [root],
    )


def test_multiply_partial_overlap_right_mixing_sum_permutation():
    """A multi-unit product (w1 = 2) meeting a MIXING sum (arity 2) on the
    q side fires the right-distribution builder's kron(I, W2) column
    permutation (``w1 > 1 and a2 > 1`` in ``multiply``): kron columns run
    (i1, a, i2) while the children concatenate (a, i1, i2). No other
    committed test draws that branch — a wrong permutation here would be a
    silently wrong product."""
    p = _wide_product_pc(seed=31)
    q = _mixing_pc_over(1, 2, num_units=3, seed=32)
    psc = SF.multiply(p, q)
    assert psc.scope == Scope([0, 1, 2])
    assert psc.is_smooth and psc.is_decomposable
    worlds = enumerate_worlds(3, 3)
    want = eval_circuit(p, worlds)[:, 0, 0] * eval_circuit(q, worlds)[:, 0, 0]
    np.testing.assert_allclose(eval_circuit(psc, worlds)[:, 0, 0], want, rtol=1e-10)
    z = eval_circuit(SF.integrate(psc), np.zeros((1, 0)))[0, 0, 0]
    np.testing.assert_allclose(z, want.sum(), rtol=1e-10)


def test_multiply_partial_overlap_left_mixing_sum_distribution():
    """The mirror pairing — a MIXING sum (arity 2) on the p side meeting a
    multi-unit product — runs the left-distribution builder's
    kron(W1, I) weight (columns already (a, i1, i2), no permutation); the
    recursion then pairs p's parallel Hadamards against q's coarser {1,2}
    child through the virtual-group matcher."""
    p = _mixing_pc_over(1, 2, num_units=2, seed=33, mix_out=3)
    q = _wide_product_pc(seed=34, num_units=3)
    psc = SF.multiply(p, q)
    assert psc.scope == Scope([0, 1, 2])
    assert psc.is_smooth and psc.is_decomposable
    worlds = enumerate_worlds(3, 3)
    want = eval_circuit(p, worlds)[:, 0, 0] * eval_circuit(q, worlds)[:, 0, 0]
    np.testing.assert_allclose(eval_circuit(psc, worlds)[:, 0, 0], want, rtol=1e-10)
    z = eval_circuit(SF.integrate(psc), np.zeros((1, 0)))[0, 0, 0]
    np.testing.assert_allclose(z, want.sum(), rtol=1e-10)
