"""Top-k MPE (k-best parses) tests: the production k-best-semiring program
checked against explicit parse enumeration (every parse materialized — an
independent brute-force oracle), plus MAPQuery-consistency, evidence,
padding, multi-head and Gaussian-leaf behavior. An extension — the
reference has neither MAP nor k-best queries."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax.queries import MAPQuery
from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import (
    build_bivariate_categorical_pc,
    build_bivariate_gaussian_pc,
    build_multivariate_categorical_pc,
)
from tests.reference_eval import topk_parses_by_enumeration


def _asg_tuples(asg_row: np.ndarray) -> tuple:
    return tuple(sorted((v, int(s)) for v, s in enumerate(asg_row)))


def _check_against_oracle(got_asg, got_scores, want_scores, want_asgs, tol=1e-9):
    """Scores must match elementwise; assignments must match as multisets
    within equal-score tie groups (lax.top_k tie order is index-based,
    the oracle's is sort-based)."""
    got_scores = np.asarray(got_scores, dtype=np.float64)
    np.testing.assert_allclose(got_scores, want_scores, rtol=tol, atol=tol)
    got = [
        _asg_tuples(np.asarray(got_asg)[s].astype(int))
        for s in range(len(want_scores))
        if np.isfinite(want_scores[s])
    ]
    want = list(want_asgs)
    for s, g in enumerate(got):
        grp = [
            j
            for j in range(len(want))
            if want[j] is not None
            and np.isclose(want_scores[j], got_scores[s], rtol=tol, atol=tol)
        ]
        match = [j for j in grp if want[j] == g]
        assert match, f"slot {s}: assignment {g} not among tied oracle parses"
        want[match[0]] = None


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("product", ["hadamard", "kronecker"])
def test_topk_matches_parse_enumeration(fold, product):
    sc = build_bivariate_categorical_pc(product=product, rng=np.random.default_rng(70))
    ctx = PipelineContext(semiring="lse-sum", fold=fold)
    cc = ctx.compile(sc)
    t = 6
    asg, scores = MAPQuery(cc)(store=ctx.parameters, top_k=t)
    assert asg.shape == (1, t, 2) and scores.shape == (1, t)
    want_scores, want_asgs = topk_parses_by_enumeration(sc, 3, t)
    _check_against_oracle(asg[0], scores[0], want_scores, want_asgs)
    # descending
    s = np.asarray(scores[0])
    assert (np.diff(s[np.isfinite(s)]) <= 1e-12).all()


@pytest.mark.parametrize("optimize", [False, True])
def test_topk_deep_matches_parse_enumeration(optimize):
    sc = build_multivariate_categorical_pc(
        num_variables=4, rng=np.random.default_rng(71)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=optimize)
    cc = ctx.compile(sc)
    t = 8
    asg, scores = MAPQuery(cc)(store=ctx.parameters, top_k=t)
    want_scores, want_asgs = topk_parses_by_enumeration(sc, 2, t)
    _check_against_oracle(asg[0], scores[0], want_scores, want_asgs)


def test_top1_equals_map():
    sc = build_multivariate_categorical_pc(
        num_variables=4, rng=np.random.default_rng(72)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    q = MAPQuery(cc)
    asg1, val1 = q(store=ctx.parameters)
    asgk, valk = q(store=ctx.parameters, top_k=1)
    np.testing.assert_array_equal(np.asarray(asgk[0, 0]), np.asarray(asg1[0]))
    np.testing.assert_allclose(float(valk[0, 0]), float(val1[0]), rtol=1e-12)


@pytest.mark.slow
def test_topk_with_evidence_matches_restricted_enumeration():
    sc = build_multivariate_categorical_pc(
        num_variables=4, rng=np.random.default_rng(73)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    t = 5
    x = np.zeros((2, 4), dtype=np.int64)
    x[:, 0] = [0, 1]
    mask = np.zeros((2, 4), dtype=bool)
    mask[:, 0] = True
    asg, scores = MAPQuery(cc)(x, evidence_mask=mask, store=ctx.parameters, top_k=t)
    for b in range(2):
        observed = np.array([x[b, 0], -1, -1, -1])
        want_scores, want_asgs = topk_parses_by_enumeration(
            sc, 2, t, observed=observed
        )
        _check_against_oracle(asg[b], scores[b], want_scores, want_asgs)
        # observed entries round-trip
        assert int(np.asarray(asg)[b, 0, 0]) == x[b, 0]


def test_topk_padding_beyond_parse_count():
    """T beyond the total number of parses: tail slots carry -inf."""
    sc = build_bivariate_categorical_pc(
        num_units=2, num_categories=2, rng=np.random.default_rng(74)
    )
    # total parses of the root unit: 2 units x 2 states x 2 states = 8
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    t = 12
    asg, scores = MAPQuery(cc)(store=ctx.parameters, top_k=t)
    s = np.asarray(scores[0])
    assert np.isfinite(s[:8]).all() and (s[8:] == -np.inf).all()
    want_scores, want_asgs = topk_parses_by_enumeration(sc, 2, t)
    _check_against_oracle(asg[0], scores[0], want_scores, want_asgs)


@pytest.mark.slow
def test_topk_per_head_selection():
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, HadamardLayer, SumLayer
    from cirkit_tpu.utils import Scope

    from tests.fixtures import const_param

    rng = np.random.default_rng(75)
    k, heads = 3, 2
    leaves = [
        CategoricalLayer(
            Scope([v]), k, num_categories=3,
            probs=const_param(rng.dirichlet(np.ones(3), size=k)),
        )
        for v in range(3)
    ]
    prod = HadamardLayer(k, arity=3)
    root = SumLayer(k, heads, weight=const_param(rng.dirichlet(np.ones(k), size=heads)))
    sc = Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    q = MAPQuery(cc)
    for h in range(heads):
        asg, scores = q(store=ctx.parameters, top_k=4, unit=h)
        want_scores, want_asgs = topk_parses_by_enumeration(sc, 3, 4, root_unit=h)
        _check_against_oracle(asg[0], scores[0], want_scores, want_asgs)


def test_topk_gaussian_leaves_route_through_latents():
    """Continuous leaves contribute only their mode; the 2nd-best parse of
    a 2-component bivariate Gaussian mixture is the other component's
    mode pair — checked against the hand-computed parse scores."""
    sc = build_bivariate_gaussian_pc(num_units=2, rng=np.random.default_rng(76))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    asg, scores = MAPQuery(cc)(store=ctx.parameters, top_k=2)

    from tests.reference_eval import eval_parameter

    leaves = [sl for sl in sc.topological_ordering() if not sc.layer_inputs(sl)]
    root = sc.outputs[0]
    w = eval_parameter(root.weight)[0]  # (2,)
    means = [eval_parameter(sl.mean) for sl in leaves]
    stds = [eval_parameter(sl.stddev) for sl in leaves]
    parse_scores = np.sort(
        [
            np.log(w[j])
            + sum(-np.log(stds[i][j]) - 0.5 * np.log(2 * np.pi) for i in range(2))
            for j in range(2)
        ]
    )[::-1]
    np.testing.assert_allclose(np.asarray(scores[0]), parse_scores, rtol=1e-9)
    # the t-th assignment is the t-th component's mode pair
    order = np.argsort(
        [
            np.log(w[j])
            + sum(-np.log(stds[i][j]) - 0.5 * np.log(2 * np.pi) for i in range(2))
            for j in range(2)
        ]
    )[::-1]
    for t, j in enumerate(order):
        np.testing.assert_allclose(
            np.asarray(asg[0, t]), [means[0][j], means[1][j]], rtol=1e-6
        )


@pytest.mark.slow
def test_topk_through_tensordot_shattered_sums():
    """Product circuits compile (optimize=True) to Kronecker-shattered
    tensor-dot pairs; the sequential Monarch-half choices must compose to
    the same parse set as the symbolic product's dense sums."""
    import cirkit_tpu.symbolic.functional as SF
    from cirkit_tpu.backend.jax.optimized import JaxTensorDotLayer

    sc1 = build_multivariate_categorical_pc(rng=np.random.default_rng(78))
    sc2 = build_multivariate_categorical_pc(rng=np.random.default_rng(79))
    psc = SF.multiply(sc1, sc2)
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(psc)
    assert any(isinstance(l, JaxTensorDotLayer) for l in cc.layers)
    t = 6
    asg, scores = MAPQuery(cc)(store=ctx.parameters, top_k=t)
    want_scores, want_asgs = topk_parses_by_enumeration(psc, 2, t)
    _check_against_oracle(asg[0], scores[0], want_scores, want_asgs)


def test_topk_rejects_marginalize_and_bad_k():
    sc = build_multivariate_categorical_pc(
        num_variables=4, rng=np.random.default_rng(77)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    q = MAPQuery(cc)
    x = np.zeros((1, 4), dtype=np.int64)
    mask = np.zeros((1, 4), dtype=bool)
    mask[:, 0] = True
    mg = np.zeros((1, 4), dtype=bool)
    mg[:, 1] = True
    with pytest.raises(NotImplementedError, match="marginalize_vars"):
        q(x, evidence_mask=mask, marginalize_vars=mg, store=ctx.parameters, top_k=2)
    with pytest.raises(ValueError, match="top_k"):
        q(store=ctx.parameters, top_k=0)
