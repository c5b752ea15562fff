"""Mutual-information query tests: exact (k, k) MI matrices pinned against
exhaustive enumeration (joint table -> numpy MI), symmetric, entropies on
the diagonal, zero off-diagonals on fully-factorized circuits, and the
conditional variant I(u; v | x_obs) pinned against the renormalized slice
of the enumerated joint. The reference has no information-theoretic
queries at all (its only queries are integration and sampling,
``cirkit/backend/torch/queries.py:19-275``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax import mutual_information
from cirkit_tpu.models import fully_factorized
from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import build_multivariate_categorical_pc
from tests.reference_eval import enumerate_worlds, eval_circuit


def _enumeration_mi(p_world: np.ndarray, worlds: np.ndarray, s: int) -> np.ndarray:
    """MI matrix (and entropy diagonal) from an exact world distribution."""
    d = worlds.shape[1]
    out = np.zeros((d, d))
    for u in range(d):
        for v in range(d):
            joint = np.zeros((s, s))
            for w, p in zip(worlds, p_world):
                joint[w[u], w[v]] += p
            pu, pv = joint.sum(axis=1), joint.sum(axis=0)
            nz = joint > 0
            if u == v:
                out[u, v] = -(pu[pu > 0] * np.log(pu[pu > 0])).sum()
            else:
                out[u, v] = (
                    joint[nz] * (np.log(joint[nz]) - np.log(np.outer(pu, pv)[nz]))
                ).sum()
    return out


@pytest.fixture(scope="module")
def deep_pc():
    sc = build_multivariate_categorical_pc(
        num_variables=4, num_units=3, num_categories=3, rng=np.random.default_rng(90)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(4, 3)
    vals = eval_circuit(sc, worlds)[:, 0, 0]
    return ctx, cc, worlds, vals / vals.sum()


def test_mi_matrix_matches_enumeration(deep_pc):
    ctx, cc, worlds, p_world = deep_pc
    want = _enumeration_mi(p_world, worlds, 3)
    got = np.asarray(mutual_information(cc, store=ctx.parameters))
    assert got.shape == (4, 4)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(got, got.T, rtol=1e-7, atol=1e-10)
    assert (got >= -1e-12).all()


def test_mi_variable_subset(deep_pc):
    ctx, cc, worlds, p_world = deep_pc
    want = _enumeration_mi(p_world, worlds, 3)[np.ix_([2, 0], [2, 0])]
    got = np.asarray(
        mutual_information(cc, store=ctx.parameters, variables=[2, 0])
    )
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)


def test_conditional_mi_matches_enumeration(deep_pc):
    ctx, cc, worlds, p_world = deep_pc
    x = np.array([1, 0, 0, 0], dtype=np.int32)
    mask = np.array([True, False, False, False])
    keep = worlds[:, 0] == 1
    p_cond = p_world[keep] / p_world[keep].sum()
    want = _enumeration_mi(p_cond, worlds[keep], 3)
    got = np.asarray(
        mutual_information(cc, store=ctx.parameters, x=x, evidence_mask=mask)
    )
    # conditioned rows/columns are exactly zero
    assert (got[0] == 0).all() and (got[:, 0] == 0).all()
    np.testing.assert_allclose(got[1:, 1:], want[1:, 1:], rtol=1e-7, atol=1e-10)


def test_mi_fully_factorized_is_zero_off_diagonal():
    sc = fully_factorized(3, input_layer="categorical",
                          input_layer_kwargs={"num_categories": 4})
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    got = np.asarray(mutual_information(cc, store=ctx.parameters))
    off = got - np.diag(np.diag(got))
    np.testing.assert_allclose(off, 0.0, atol=1e-9)
    # diagonal = exact leaf entropies (from the model's own marginals)
    from cirkit_tpu.backend.jax import ExpectationQuery

    marg = np.asarray(
        ExpectationQuery(cc).marginals(
            jnp.zeros((1, 3), jnp.int32),
            evidence_mask=jnp.zeros((1, 3), bool),
            store=ctx.parameters,
        )
    )[0]
    want_h = [-(p[p > 0] * np.log(p[p > 0])).sum() for p in marg]
    np.testing.assert_allclose(np.diag(got), want_h, rtol=1e-7)


def test_mi_rejects_continuous_and_out_of_scope(deep_pc):
    ctx, cc, _, _ = deep_pc
    with pytest.raises(ValueError, match="outside the circuit scope"):
        mutual_information(cc, store=ctx.parameters, variables=[9])
    from tests.fixtures import build_bivariate_gaussian_pc

    scg = build_bivariate_gaussian_pc()
    ctxg = PipelineContext(semiring="lse-sum", fold=True)
    ccg = ctxg.compile(scg)
    with pytest.raises(NotImplementedError, match="finite-support"):
        mutual_information(ccg, store=ctxg.parameters)


def test_mi_non_contiguous_scope():
    """Scope gaps are not 'continuous leaves': default variables skip
    them, explicit requests get the out-of-scope error."""
    from cirkit_tpu.symbolic import (
        CategoricalLayer,
        Circuit,
        HadamardLayer,
        SumLayer,
    )
    from cirkit_tpu.utils.scope import Scope
    from tests.fixtures import const_param

    rng = np.random.default_rng(21)
    k = 2
    leaves = []
    for v in (0, 2):  # variable 1 has no leaf
        raw = rng.uniform(0.1, 1.0, size=(k, 3))
        leaves.append(
            CategoricalLayer(
                Scope([v]), k, num_categories=3,
                probs=const_param(raw / raw.sum(axis=1, keepdims=True)),
            )
        )
    prod = HadamardLayer(k, arity=2)
    root = SumLayer(k, 1, weight=const_param(rng.dirichlet(np.ones(k))[None]))
    sc = Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)

    got = np.asarray(mutual_information(cc, store=ctx.parameters))
    assert got.shape == (2, 2)  # covered variables only
    np.testing.assert_allclose(got, got.T, rtol=1e-7)
    with pytest.raises(ValueError, match="outside the circuit scope"):
        mutual_information(cc, store=ctx.parameters, variables=[1])
