"""Virtual (soft) evidence: IntegrateQuery's ``soft_vars``/``soft_weights``
contract leaves against per-state observation weights (Pearl 1988). Ground
truth by exhaustive enumeration; the uniform-weights == marginalization and
one-hot == hard-evidence identities pin the semantics at the boundaries.
An extension — the reference's queries are integrate + sample only
(ref ``backend/torch/queries.py:19``)."""

import numpy as np
import pytest

from cirkit_tpu.backend.jax.queries import IntegrateQuery
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.utils import Scope

from tests.fixtures import (
    build_bivariate_gaussian_pc,
    build_multivariate_categorical_pc,
)
from tests.reference_eval import enumerate_worlds, eval_circuit


def _compiled(semiring="lse-sum", fold=True, seed=30):
    sc = build_multivariate_categorical_pc(
        num_variables=4, rng=np.random.default_rng(seed)
    )
    ctx = PipelineContext(semiring=semiring, fold=fold)
    return sc, ctx.compile(sc)


@pytest.mark.parametrize("fold", [False, True])
def test_soft_evidence_matches_enumeration(fold):
    sc, cc = _compiled(fold=fold)
    query = IntegrateQuery(cc)
    worlds = enumerate_worlds(4, 2)
    full = eval_circuit(sc, worlds)[:, 0, 0].reshape(2, 2, 2, 2)

    w1 = np.array([0.2, 0.7])  # weights need not normalize
    w3 = np.array([1.5, 0.4])
    W = np.zeros((4, 2), np.float64)
    W[1], W[3] = w1, w3
    got = np.asarray(query(worlds, soft_vars=Scope([1, 3]), soft_weights=W))[:, 0, 0]
    want = np.log(
        np.einsum("abcd,b,d->ac", full, w1, w3)[worlds[:, 0], worlds[:, 2]]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_soft_evidence_uniform_weights_equal_marginalization():
    sc, cc = _compiled(seed=31)
    query = IntegrateQuery(cc)
    worlds = enumerate_worlds(4, 2)
    W = np.ones((4, 2), np.float64)
    soft = np.asarray(query(worlds, soft_vars=Scope([0, 2]), soft_weights=W))
    marg = np.asarray(query(worlds, integrate_vars=Scope([0, 2])))
    np.testing.assert_allclose(soft, marg, rtol=1e-6)


def test_soft_evidence_one_hot_equals_hard_evidence():
    sc, cc = _compiled(seed=32)
    query = IntegrateQuery(cc)
    worlds = enumerate_worlds(4, 2)
    # one-hot weights at each sample's own state for var 1: per-sample (B, D, S)
    W = np.zeros((len(worlds), 4, 2), np.float64)
    W[np.arange(len(worlds)), 1, worlds[:, 1]] = 1.0
    soft = np.asarray(
        query(worlds, soft_vars=Scope([1]), soft_weights=W)
    )[:, 0, 0]
    hard = eval_circuit(sc, worlds)[:, 0, 0]
    np.testing.assert_allclose(soft, np.log(hard), rtol=1e-6)


def test_soft_evidence_composes_with_marginalization():
    sc, cc = _compiled(seed=33)
    query = IntegrateQuery(cc)
    worlds = enumerate_worlds(4, 2)
    full = eval_circuit(sc, worlds)[:, 0, 0].reshape(2, 2, 2, 2)
    w2 = np.array([0.3, 2.0])
    W = np.zeros((4, 2), np.float64)
    W[2] = w2
    got = np.asarray(
        query(
            worlds,
            integrate_vars=Scope([0]),
            soft_vars=Scope([2]),
            soft_weights=W,
        )
    )[:, 0, 0]
    want = np.log(
        np.einsum("abcd,c->bd", full, w2)[worlds[:, 1], worlds[:, 3]]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_soft_evidence_sum_product_semiring():
    sc, cc = _compiled(semiring="sum-product", seed=34)
    query = IntegrateQuery(cc)
    worlds = enumerate_worlds(4, 2)
    full = eval_circuit(sc, worlds)[:, 0, 0].reshape(2, 2, 2, 2)
    w0 = np.array([0.6, 0.4])
    W = np.zeros((4, 2), np.float64)
    W[0] = w0
    got = np.asarray(query(worlds, soft_vars=Scope([0]), soft_weights=W))[:, 0, 0]
    want = np.einsum("abcd,a->bcd", full, w0)[
        worlds[:, 1], worlds[:, 2], worlds[:, 3]
    ]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_soft_evidence_pad_batch_to():
    sc, cc = _compiled(seed=35)
    query = IntegrateQuery(cc)
    worlds = enumerate_worlds(4, 2)
    x = worlds[:5]
    W = np.zeros((5, 4, 2), np.float64)
    W[:, 1] = np.array([0.8, 0.5])
    unpadded = np.asarray(query(x, soft_vars=Scope([1]), soft_weights=W))
    padded = np.asarray(
        query(x, soft_vars=Scope([1]), soft_weights=W, pad_batch_to=8)
    )
    assert padded.shape == unpadded.shape
    np.testing.assert_allclose(padded, unpadded, rtol=1e-12)


def test_soft_evidence_errors():
    sc, cc = _compiled(seed=36)
    query = IntegrateQuery(cc)
    worlds = enumerate_worlds(4, 2)
    W = np.ones((4, 2), np.float64)
    with pytest.raises(ValueError, match="together"):
        query(worlds, soft_vars=Scope([1]))
    with pytest.raises(ValueError, match="integrate_vars"):
        query(worlds)
    with pytest.raises(ValueError, match="both marginalized and soft"):
        query(
            worlds,
            integrate_vars=Scope([1]),
            soft_vars=Scope([1]),
            soft_weights=W,
        )
    with pytest.raises(ValueError, match="nonnegative"):
        query(worlds, soft_vars=Scope([1]), soft_weights=-W)
    with pytest.raises(ValueError, match=r"\(B, D, S\)"):
        query(worlds, soft_vars=Scope([1]), soft_weights=np.ones((4, 2, 2, 2)))

    # continuous leaves cannot take per-state weights
    gsc = build_bivariate_gaussian_pc(rng=np.random.default_rng(1))
    gcc = PipelineContext(semiring="lse-sum", fold=True).compile(gsc)
    gq = IntegrateQuery(gcc)
    with pytest.raises(ValueError, match="finite-support"):
        gq(
            np.zeros((2, 2), np.float32),
            soft_vars=Scope([0]),
            soft_weights=np.ones((2, 3), np.float64),
        )


def test_soft_evidence_shorter_weight_rows_pad_with_zero_weight():
    """An S smaller than a leaf's support acts as zero weight on the
    missing states: weights over state 0 only == one-hot at state 0."""
    sc, cc = _compiled(seed=37)
    query = IntegrateQuery(cc)
    worlds = enumerate_worlds(4, 2)
    Wshort = np.full((4, 1), 1.0)
    got = np.asarray(query(worlds, soft_vars=Scope([1]), soft_weights=Wshort))[:, 0, 0]
    Wfull = np.zeros((4, 2))
    Wfull[:, 0] = 1.0
    want = np.asarray(query(worlds, soft_vars=Scope([1]), soft_weights=Wfull))[:, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-12)
