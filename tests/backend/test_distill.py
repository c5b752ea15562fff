"""Tree-distillation tests, all against exhaustive enumeration: the
distilled tree reproduces the source's single-variable and tree-edge
pairwise marginals EXACTLY, satisfies the Chow-Liu identity
KL(p || q_tree) = -H(p) + sum_v H(x_v) - sum_edges I(u; v) (so the
max-MI structure is the KL-optimal tree), recovers tree-structured
sources losslessly (an HMM distills to itself, KL = 0), is deterministic
(exact EntropyQuery), and stays fit_em-eligible with frozen indicator
leaves. No reference counterpart: cirkit's Chow-Liu is a data-side
structure initializer only (``templates/region_graph/algorithms/
chow_liu.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax import (
    EntropyQuery,
    distill_tree,
    is_deterministic,
)
from cirkit_tpu.parallel import fit_em
from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import build_multivariate_categorical_pc
from tests.reference_eval import enumerate_worlds, eval_circuit


def _dist(ctx, cc, worlds):
    vals = np.exp(np.asarray(cc.evaluate(ctx.parameters, jnp.asarray(worlds)))[:, 0, 0])
    return vals


@pytest.fixture(scope="module")
def source():
    sc = build_multivariate_categorical_pc(
        num_variables=5, num_units=4, num_categories=3, rng=np.random.default_rng(31)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(5, 3)
    vals = eval_circuit(sc, worlds)[:, 0, 0]
    return ctx, cc, worlds, vals / vals.sum()


@pytest.fixture(scope="module")
def distilled(source):
    ctx, cc, worlds, p = source
    tree, report = distill_tree(cc, store=ctx.parameters, root=2)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(tree)
    q = _dist(ctx2, cc2, worlds)
    return tree, report, ctx2, cc2, q


def test_distilled_is_normalized_and_preserves_marginals(source, distilled):
    ctx, cc, worlds, p = source
    tree, report, ctx2, cc2, q = distilled
    np.testing.assert_allclose(q.sum(), 1.0, rtol=1e-9)
    # single-variable marginals preserved exactly
    for v in range(5):
        for s in range(3):
            keep = worlds[:, v] == s
            np.testing.assert_allclose(
                q[keep].sum(), p[keep].sum(), rtol=1e-7, atol=1e-12
            )
    # pairwise marginals preserved exactly on the tree edges
    for u, v in report["edges"]:
        for s in range(3):
            for t in range(3):
                keep = (worlds[:, u] == s) & (worlds[:, v] == t)
                np.testing.assert_allclose(
                    q[keep].sum(), p[keep].sum(), rtol=1e-6, atol=1e-12
                )


def test_chow_liu_identity_and_optimality(source, distilled):
    """KL(p || q) must equal -H(p) + sum_v H(x_v) - sum_edges I — and the
    max-MI tree must beat a deliberately bad tree (a star on the weakest
    hub) in KL."""
    ctx, cc, worlds, p = source
    tree, report, ctx2, cc2, q = distilled
    kl = (p * (np.log(p) - np.log(q))).sum()
    h_p = -(p * np.log(p)).sum()
    want = -h_p + report["entropies"].sum() - report["mi_objective"]
    np.testing.assert_allclose(kl, want, rtol=1e-6, atol=1e-9)
    assert kl >= -1e-12

    # exhaustive optimality over all rooted trees is expensive; instead
    # check the distilled KL is <= the KL of every star tree (computed
    # through the same identity with exact enumeration MIs)
    def pair_mi(u, v):
        joint = np.zeros((3, 3))
        for w, pw in zip(worlds, p):
            joint[w[u], w[v]] += pw
        pu, pv = joint.sum(1), joint.sum(0)
        nz = joint > 0
        return (joint[nz] * np.log(joint[nz] / np.outer(pu, pv)[nz])).sum()

    for hub in range(5):
        star = sum(pair_mi(hub, v) for v in range(5) if v != hub)
        assert report["mi_objective"] >= star - 1e-9


@pytest.mark.slow
def test_distill_recovers_tree_source_exactly():
    """An HMM is already a tree: distilling it must be lossless."""
    from cirkit_tpu.models import hmm

    sc = hmm(
        ordering=[0, 1, 2, 3],
        input_layer="categorical",
        num_latent_states=1,
        input_layer_kwargs={"num_categories": 3},
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=11)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(4, 3)
    vals = np.exp(
        np.asarray(cc.evaluate(ctx.parameters, jnp.asarray(worlds)))[:, 0, 0]
    )
    p = vals / vals.sum()
    tree, _ = distill_tree(cc, store=ctx.parameters)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(tree)
    q = _dist(ctx2, cc2, worlds)
    np.testing.assert_allclose(q / q.sum(), p, rtol=1e-6, atol=1e-12)


def test_distilled_is_deterministic_with_exact_entropy(source, distilled):
    ctx, cc, worlds, p = source
    tree, report, ctx2, cc2, q = distilled
    assert is_deterministic(tree, ctx=ctx2)
    h = EntropyQuery(cc2)(store=ctx2.parameters)
    want = -(q * np.log(q)).sum()
    np.testing.assert_allclose(float(h[0, 0]), want, rtol=1e-6)


def test_distilled_is_em_finetunable(source, distilled):
    """EM on the distilled tree trains the conditionals while the
    indicator leaves stay constant (they are not slots at all)."""
    ctx, cc, worlds, p = source
    tree, report, ctx2, cc2, q = distilled
    rng = np.random.default_rng(5)
    data = worlds[rng.choice(len(worlds), p=p, size=600)].astype(np.int32)
    store, losses = fit_em(
        cc2, jnp.asarray(data), store=dict(ctx2.parameters),
        num_epochs=4, batch_size=200,
    )
    assert losses[-1] <= losses[0] + 1e-9
    # indicator leaves never became trainable slots
    from cirkit_tpu.parallel import em_slots

    kinds = set(em_slots(cc2).values())
    assert kinds == {"sum"}


def test_distill_rejects_continuous_and_bad_root(source):
    ctx, cc, *_ = source
    with pytest.raises(ValueError, match="outside the circuit scope"):
        distill_tree(cc, store=ctx.parameters, root=99)
    from tests.fixtures import build_bivariate_gaussian_pc

    scg = build_bivariate_gaussian_pc()
    ctxg = PipelineContext(semiring="lse-sum", fold=True)
    ccg = ctxg.compile(scg)
    with pytest.raises(NotImplementedError, match="finite-support"):
        distill_tree(ccg, store=ctxg.parameters)


@pytest.mark.slow
def test_distill_non_contiguous_scope():
    """Scope gaps (no leaf for some index) distill fine over the covered
    variables — they are not 'continuous leaves'."""
    from cirkit_tpu.symbolic import CategoricalLayer, SumLayer
    from cirkit_tpu.symbolic import Circuit as SymCircuit
    from cirkit_tpu.symbolic import HadamardLayer
    from cirkit_tpu.utils.scope import Scope
    from tests.fixtures import const_param

    rng = np.random.default_rng(41)
    k = 3
    leaves = []
    for v in (0, 2, 5):
        raw = rng.uniform(0.1, 1.0, size=(k, 2))
        leaves.append(
            CategoricalLayer(Scope([v]), k, num_categories=2,
                             probs=const_param(raw / raw.sum(1, keepdims=True)))
        )
    prod = HadamardLayer(k, arity=3)
    root = SumLayer(k, 1, weight=const_param(rng.dirichlet(np.ones(k))[None]))
    sc = SymCircuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    tree, rep = distill_tree(cc, store=ctx.parameters, root=2)
    assert {u for e in rep["edges"] for u in e} <= {0, 2, 5}
    assert len(rep["edges"]) == 2
    # distilled distribution matches the source's pairwise marginals on
    # its edges (evaluate over the padded world table)
    worlds = np.zeros((8, 6), np.int64)
    combos = enumerate_worlds(3, 2)
    worlds[:, [0, 2, 5]] = combos
    vals = np.exp(np.asarray(cc.evaluate(ctx.parameters, jnp.asarray(worlds)))[:, 0, 0])
    p = vals / vals.sum()
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(tree)
    q = np.exp(np.asarray(cc2.evaluate(ctx2.parameters, jnp.asarray(worlds)))[:, 0, 0])
    for u, v in rep["edges"]:
        for s in range(2):
            for t in range(2):
                keep = (worlds[:, u] == s) & (worlds[:, v] == t)
                np.testing.assert_allclose(q[keep].sum(), p[keep].sum(),
                                           rtol=1e-6, atol=1e-12)


@pytest.mark.slow
def test_distill_binomial_source():
    """Distillation from binomial leaves: the tree's indicator
    construction covers any finite-support source — pinned against the
    enumerated count-world distribution."""
    from cirkit_tpu.symbolic import BinomialLayer
    from cirkit_tpu.symbolic import Circuit as SymCircuit
    from cirkit_tpu.symbolic import HadamardLayer, SumLayer
    from cirkit_tpu.utils.scope import Scope
    from tests.fixtures import const_param

    rng = np.random.default_rng(43)
    k, n = 3, 3
    leaves = [
        BinomialLayer(Scope([v]), k, total_count=n,
                      probs=const_param(rng.uniform(0.2, 0.8, size=k)))
        for v in range(2)
    ]
    prod = HadamardLayer(k, arity=2)
    root = SumLayer(k, 1, weight=const_param(rng.dirichlet(np.ones(k))[None]))
    sc = SymCircuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, n + 1)
    vals = np.exp(np.asarray(cc.evaluate(ctx.parameters, jnp.asarray(worlds)))[:, 0, 0])
    p = vals / vals.sum()
    tree, rep = distill_tree(cc, store=ctx.parameters)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(tree)
    q = np.exp(np.asarray(cc2.evaluate(ctx2.parameters, jnp.asarray(worlds)))[:, 0, 0])
    # a 2-variable distribution IS a tree: distillation is lossless
    np.testing.assert_allclose(q / q.sum(), p, rtol=1e-6, atol=1e-12)


def test_kl_between_two_distilled_parameterizations(distilled):
    """The cross.py division of labor, pinned: two parameterizations of ONE
    distilled skeleton compare through KLDivergenceQuery (a single device
    pass, exact because distill_tree outputs are deterministic) — the
    pairwise cross-circuit walk is NOT needed for this case and would blow
    up quadratically in the indicator-sum arity."""
    from cirkit_tpu.backend.jax.entropy import KLDivergenceQuery

    tree, report, ctx2, cc2, q = distilled
    from tests.backend.test_entropy import (
        _enum_kl,
        _normalized_leaf_slots,
        _perturb_store,
    )

    rng = np.random.default_rng(77)
    sp = cc2.restrict_store(ctx2.parameters)
    sq = _perturb_store(sp, rng, renorm_slots=_normalized_leaf_slots(cc2))
    kl = float(KLDivergenceQuery(cc2)(sp, sq)[0, 0])

    worlds = enumerate_worlds(5, 3)
    pw = np.exp(np.asarray(cc2.evaluate(sp, jnp.asarray(worlds)))[:, 0, 0])
    qw = np.exp(np.asarray(cc2.evaluate(sq, jnp.asarray(worlds)))[:, 0, 0])
    np.testing.assert_allclose(kl, _enum_kl(pw, qw), rtol=1e-6)
    np.testing.assert_allclose(
        float(KLDivergenceQuery(cc2)(sp, sp)[0, 0]), 0.0, atol=1e-12
    )
