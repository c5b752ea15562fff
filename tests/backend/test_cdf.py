"""Posterior CDF / quantile query tests: p(x_v <= t | x_obs) pinned against
the closed-form Gaussian-mixture posterior CDF (scipy) and exhaustive
enumeration on categorical circuits; quantiles pinned as the generalized
inverse (cdf(quantile(q)) >= q with equality in the continuous case, exact
jump states in the discrete case). The reference has no distribution-level
queries at all (``cirkit/backend/torch/queries.py:19-275``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax.queries import ExpectationQuery
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic import (
    Circuit,
    GaussianLayer,
    HadamardLayer,
    SumLayer,
)
from cirkit_tpu.utils.scope import Scope

from tests.fixtures import build_multivariate_categorical_pc, const_param
from tests.reference_eval import enumerate_worlds, eval_circuit


@pytest.fixture(scope="module")
def gmm():
    rng = np.random.default_rng(70)
    k = 3
    mus = rng.normal(scale=2.0, size=(2, k))
    sds = rng.uniform(0.5, 1.2, size=(2, k))
    leaves = [
        GaussianLayer(Scope([v]), k, mean=const_param(mus[v]), stddev=const_param(sds[v]))
        for v in range(2)
    ]
    prod = HadamardLayer(k, arity=2)
    w = rng.dirichlet(np.ones(k))
    root = SumLayer(k, 1, weight=const_param(w[None]))
    sc = Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    return ctx, cc, mus, sds, w


def test_cdf_gaussian_posterior_closed_form(gmm):
    from scipy.stats import norm

    ctx, cc, mus, sds, w = gmm
    q = ExpectationQuery(cc)
    x = np.array([[0.7, 0.0], [-1.5, 0.0]], dtype=np.float64)
    mask = np.array([[True, False]] * 2)
    ts = np.array([[0.0, -0.8], [0.0, 1.3]])
    got = np.asarray(q.cdf(x, t=ts, evidence_mask=mask, store=ctx.parameters))
    for b in range(2):
        like = np.array([norm.pdf(x[b, 0], mus[0, c], sds[0, c]) for c in range(3)])
        r = w * like / (w * like).sum()
        want = (r * norm.cdf(ts[b, 1], mus[1], sds[1])).sum()
        np.testing.assert_allclose(got[b, 1], want, rtol=1e-6)
        # observed entry: the indicator x <= t
        assert got[b, 0] == float(x[b, 0] <= ts[b, 0])


def test_quantile_gaussian_roundtrip_and_interval(gmm):
    ctx, cc, mus, sds, w = gmm
    q = ExpectationQuery(cc)
    x = np.array([[0.7, 0.0]], dtype=np.float64)
    mask = np.array([[True, False]])
    for target in (0.05, 0.5, 0.95):
        t = q.quantile(x, q=target, evidence_mask=mask, store=ctx.parameters)
        back = np.asarray(
            q.cdf(x, t=t, evidence_mask=mask, store=ctx.parameters)
        )
        np.testing.assert_allclose(back[0, 1], target, rtol=1e-5, atol=1e-7)
        # observed entries return the observed value
        assert float(t[0, 0]) == 0.7
    lo = q.quantile(x, q=0.05, evidence_mask=mask, store=ctx.parameters)
    hi = q.quantile(x, q=0.95, evidence_mask=mask, store=ctx.parameters)
    mean = q(x, evidence_mask=mask, store=ctx.parameters)
    assert float(lo[0, 1]) < float(mean[0, 1]) < float(hi[0, 1])


@pytest.fixture(scope="module")
def deep_cat():
    sc = build_multivariate_categorical_pc(
        num_variables=4, num_units=3, num_categories=3, rng=np.random.default_rng(71)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(4, 3)
    vals = eval_circuit(sc, worlds)[:, 0, 0]
    return ctx, cc, worlds, vals / vals.sum()


def test_cdf_categorical_matches_enumeration(deep_cat):
    ctx, cc, worlds, p_world = deep_cat
    q = ExpectationQuery(cc)
    x = np.array([[2, 0, 1, 0]], dtype=np.int32)
    mask = np.array([[True, False, True, False]])
    keep = (worlds[:, 0] == 2) & (worlds[:, 2] == 1)
    p_cond = p_world[keep] / p_world[keep].sum()
    wk = worlds[keep]
    for t in (-1.0, 0.0, 0.5, 1.0, 2.0, 5.0):
        got = np.asarray(
            q.cdf(x, t=t, evidence_mask=mask, store=ctx.parameters)
        )
        for v in (1, 3):
            want = p_cond[wk[:, v] <= t].sum()
            np.testing.assert_allclose(got[0, v], want, rtol=1e-7, atol=1e-12)


def test_quantile_categorical_lands_on_states(deep_cat):
    ctx, cc, worlds, p_world = deep_cat
    q = ExpectationQuery(cc)
    x = np.zeros((1, 4), np.int32)
    mask = np.zeros((1, 4), bool)
    for target in (0.1, 0.5, 0.9):
        t = np.asarray(
            q.quantile(x, q=target, evidence_mask=mask, store=ctx.parameters)
        )
        for v in range(4):
            marg = np.array([p_world[worlds[:, v] == s].sum() for s in range(3)])
            want = int(np.searchsorted(np.cumsum(marg), target))
            # the bisection converges onto the jump: rounding recovers
            # the exact generalized-inverse state
            assert abs(t[0, v] - want) < 1e-6, (v, target, t[0, v], want)


def test_quantile_rejects_bad_targets(gmm):
    ctx, cc, *_ = gmm
    q = ExpectationQuery(cc)
    x = np.zeros((1, 2))
    mask = np.zeros((1, 2), bool)
    with pytest.raises(ValueError, match="strictly in"):
        q.quantile(x, q=0.0, evidence_mask=mask, store=ctx.parameters)
    with pytest.raises(ValueError, match="strictly in"):
        q.quantile(x, q=1.5, evidence_mask=mask, store=ctx.parameters)


def test_cdf_monotone_in_t(gmm):
    ctx, cc, *_ = gmm
    q = ExpectationQuery(cc)
    x = np.zeros((1, 2))
    mask = np.zeros((1, 2), bool)
    ts = np.linspace(-15, 15, 25)
    vals = np.stack(
        [
            np.asarray(q.cdf(x, t=float(t), evidence_mask=mask, store=ctx.parameters))[0]
            for t in ts
        ]
    )
    assert (np.diff(vals, axis=0) >= -1e-12).all()
    np.testing.assert_allclose(vals[0], 0.0, atol=1e-8)
    np.testing.assert_allclose(vals[-1], 1.0, atol=1e-8)


def test_cdf_binomial_and_embedding_leaves():
    """The step-CDF hook on binomial (scipy oracle) and embedding
    (normalized-weight cumsum oracle) leaves, via a 2-var mixture."""
    from scipy.stats import binom

    from cirkit_tpu.symbolic import BinomialLayer, EmbeddingLayer

    rng = np.random.default_rng(73)
    k, n, s_emb = 3, 5, 4
    probs = rng.uniform(0.2, 0.8, size=k)
    wemb = rng.uniform(0.1, 1.0, size=(k, s_emb))
    leaves = [
        BinomialLayer(Scope([0]), k, total_count=n, probs=const_param(probs)),
        EmbeddingLayer(Scope([1]), k, num_states=s_emb, weight=const_param(wemb)),
    ]
    prod = HadamardLayer(k, arity=2)
    w = rng.dirichlet(np.ones(k))
    root = SumLayer(k, 1, weight=const_param(w[None]))
    sc = Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    q = ExpectationQuery(cc)

    x = np.array([[2, 0]], dtype=np.int32)
    mask = np.array([[True, False]])
    # posterior over mixture components given x_0 = 2 (embedding leaf has
    # unnormalized weights: its normalizer rides the responsibility)
    like = binom.pmf(2, n, probs) * wemb.sum(axis=1)  # leaf normalizers ride along
    r = w * like / (w * like).sum()
    pe = wemb / wemb.sum(axis=1, keepdims=True)
    for t in (-0.5, 0.0, 1.0, 2.5, 4.0):
        got = np.asarray(q.cdf(x, t=t, evidence_mask=mask, store=ctx.parameters))
        want = (r[:, None] * pe).sum(axis=0)[: max(0, int(np.floor(t)) + 1)].sum()
        np.testing.assert_allclose(got[0, 1], want, rtol=1e-7, atol=1e-12)
    # binomial side unconditional: CDF at t of the mixture of binomials
    # (the unnormalized embedding's per-unit integral reweights components)
    mask0 = np.zeros((1, 2), bool)
    r0 = w * wemb.sum(axis=1)
    r0 = r0 / r0.sum()
    for t in (0.0, 2.0, 5.0):
        got = np.asarray(q.cdf(x, t=t, evidence_mask=mask0, store=ctx.parameters))
        want = (r0 * binom.cdf(t, n, probs)).sum()
        np.testing.assert_allclose(got[0, 0], want, rtol=1e-7, atol=1e-12)
