"""Structural-pruning tests: the threshold-0 rebuild is lossless (pinned
against the original compiled distribution by enumeration), dead units are
dropped without changing the distribution, fraction pruning shrinks
templates (including through an optimize=True training context, exercising
the shared-state readback), and pruned circuits remain trainable. The
capability is an extension — the reference has no compression."""

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax.pruning import prune_circuit
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.utils import Scope

from tests.fixtures import (
    build_bivariate_categorical_pc,
    build_bivariate_gaussian_pc,
    build_multivariate_categorical_pc,
    const_param,
)
from tests.reference_eval import enumerate_worlds


def _dist(ctx, cc, x):
    return np.asarray(cc.evaluate(ctx if isinstance(ctx, dict) else ctx.parameters,
                                  jnp.asarray(x)))[:, 0, :]


@pytest.mark.parametrize("product", ["hadamard", "kronecker"])
def test_prune_threshold_zero_is_lossless(product):
    sc = build_bivariate_categorical_pc(product=product, rng=np.random.default_rng(70))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, 3)
    want = _dist(ctx, cc, worlds)

    pruned, report = prune_circuit(sc, ctx=ctx, threshold=0.0)
    assert report["units_after"] == report["units_before"]
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(pruned)
    got = _dist(ctx2, cc2, worlds)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_prune_threshold_zero_lossless_deep_and_gaussian():
    sc = build_multivariate_categorical_pc(num_variables=4, rng=np.random.default_rng(71))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(4, 2)
    want = _dist(ctx, cc, worlds)
    pruned, _ = prune_circuit(sc, ctx=ctx, threshold=0.0)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    got = _dist(ctx2, ctx2.compile(pruned), worlds)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)

    scg = build_bivariate_gaussian_pc(num_units=3, rng=np.random.default_rng(72))
    ctxg = PipelineContext(semiring="lse-sum", fold=True)
    ccg = ctxg.compile(scg)
    x = np.random.default_rng(0).normal(size=(7, 2))
    want = _dist(ctxg, ccg, x)
    prunedg, _ = prune_circuit(scg, ctx=ctxg, threshold=0.0)
    ctxg2 = PipelineContext(semiring="lse-sum", fold=True)
    got = _dist(ctxg2, ctxg2.compile(prunedg), x)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_prune_drops_dead_units_distribution_unchanged():
    """A mixture unit with ~zero incoming weight everywhere is pruned and
    the distribution is (numerically) unchanged."""
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, HadamardLayer, SumLayer

    rng = np.random.default_rng(73)
    k = 3
    leaves = [
        CategoricalLayer(
            Scope([v]), k, num_categories=3,
            probs=const_param(rng.dirichlet(np.ones(3), size=k)),
        )
        for v in range(2)
    ]
    prod = HadamardLayer(k, arity=2)
    w = np.array([[0.6, 1e-12, 0.4]])
    root = SumLayer(k, 1, weight=const_param(w))
    sc = Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, 3)
    want = _dist(ctx, cc, worlds)

    pruned, report = prune_circuit(sc, ctx=ctx, threshold=1e-6)
    assert report["units_after"] < report["units_before"]
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(pruned)
    got = _dist(ctx2, cc2, worlds)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # explicit: the product (and its leaves) shrank from 3 to 2 units
    from cirkit_tpu.symbolic import HadamardLayer as H

    assert [b for name, b, a in report["per_layer"] if name == "HadamardLayer"] == [3]
    assert [a for name, b, a in report["per_layer"] if name == "HadamardLayer"] == [2]


@pytest.mark.slow
def test_prune_fraction_through_optimized_context():
    """Readback + pruning from a context that compiled the circuit with
    optimize=True (fused plans): the sibling unoptimized compile shares
    the trained slots. Kronecker+Sum (tucker) structure exercised."""
    from cirkit_tpu.models import image_data

    sc = image_data(
        (1, 4, 4), "quad-tree-2", input_layer="categorical",
        num_input_units=8, sum_product_layer="tucker", num_sum_units=8,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=21)
    cc = ctx.compile(sc)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 256, size=(5, 16)), jnp.int32)
    base_ll = np.asarray(cc.evaluate(ctx.parameters, x))[:, 0, 0]

    pruned, report = prune_circuit(sc, ctx=ctx, fraction=0.5)
    assert report["units_after"] < report["units_before"]
    ctx2 = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc2 = ctx2.compile(pruned)
    ll = np.asarray(cc2.evaluate(ctx2.parameters, x))[:, 0, 0]
    assert np.isfinite(ll).all()
    # the pruned circuit computes a sub-sum of the original mixture, so
    # its (unnormalized) likelihood can only drop — and with importance
    # selection it stays within tens of nats on this random-init circuit
    # rather than collapsing
    assert np.all(ll <= base_ll + 1e-6)
    assert np.all(base_ll - ll < 40.0)


def test_pruned_circuit_is_em_trainable():
    """Pruned circuits carry plain constant (learnable) parameters, so
    they are fit_em-eligible end to end — and a threshold-0 prune trains
    IDENTICALLY to the original circuit (same losses per epoch)."""
    from cirkit_tpu.parallel import fit_em

    sc = build_multivariate_categorical_pc(num_variables=4, rng=np.random.default_rng(74))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    rng = np.random.default_rng(2)
    data = rng.integers(0, 2, size=(64, 4))
    _, control = fit_em(cc, data, store=ctx.parameters, num_epochs=3, batch_size=32)

    pruned, _ = prune_circuit(sc, ctx=ctx, threshold=0.0)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(pruned)
    _, losses = fit_em(cc2, data, store=ctx2.parameters, num_epochs=3, batch_size=32)
    np.testing.assert_allclose(losses, control, rtol=1e-9)
    # post-normalization epochs are monotone (the fixture starts with
    # unnormalized weights, so the first epoch is on a different scale)
    assert losses[2] <= losses[1] + 1e-9


def test_prune_requires_exactly_one_mode():
    sc = build_bivariate_categorical_pc(rng=np.random.default_rng(75))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    with pytest.raises(ValueError, match="Exactly one"):
        prune_circuit(sc, ctx=ctx)
    with pytest.raises(ValueError, match="Exactly one"):
        prune_circuit(sc, ctx=ctx, threshold=0.1, fraction=0.5)


def test_prune_requires_compiled_context():
    """An uncompiled circuit has no trained slots in the context's store:
    the error must say so instead of a KeyError deep in readback."""
    sc = build_bivariate_categorical_pc(rng=np.random.default_rng(76))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    with pytest.raises(ValueError, match="Compile the circuit"):
        prune_circuit(sc, ctx=ctx, threshold=0.0)


@pytest.mark.slow
def test_flow_importance_prunes_data_unused_branch():
    """Data-aware pruning (expected posterior usage flows, Dang et al.):
    a mixture branch the data NEVER routes through is pruned even though
    its mixture weight is the largest — the weight-magnitude score would
    keep it (and drop a used one)."""
    import jax.numpy as jnp

    from cirkit_tpu.backend.jax.pruning import _flow_importance
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, HadamardLayer, SumLayer
    from tests.fixtures import const_param

    rng = np.random.default_rng(61)
    k = 3
    # component 0: peaked on state 0; component 1: peaked on state 1;
    # component 2 (the HIGHEST-weighted): peaked on state 2 — but the data
    # only ever contains states {0, 1}
    leaves = []
    for v in range(2):
        p = np.full((k, 3), 0.01)
        for c in range(k):
            p[c, c] = 0.98
        leaves.append(
            CategoricalLayer(Scope([v]), k, num_categories=3,
                             probs=const_param(p / p.sum(1, keepdims=True)))
        )
    prod = HadamardLayer(k, arity=2)
    w = np.array([[0.2, 0.2, 0.6]])  # unused component has the top weight
    root = SumLayer(k, 1, weight=const_param(w))
    sc = Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)

    data = np.concatenate([np.zeros((40, 2)), np.ones((40, 2))]).astype(np.int32)
    score = _flow_importance(sc, ctx, ctx.parameters, data, batch_size=64)
    s_prod = score[prod]
    assert s_prod[2] < 0.01 < min(s_prod[0], s_prod[1])
    # usage flows are responsibilities: they sum to ~1 at a smooth mixture
    np.testing.assert_allclose(s_prod.sum(), 1.0, rtol=1e-5)

    pruned, rep = prune_circuit(sc, ctx=ctx, fraction=1 / 3, data=data)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(pruned)
    # the data-used components survive: LL on the data barely moves
    ll_full = np.asarray(cc.evaluate(ctx.parameters, jnp.asarray(data)))[:, 0, 0].mean()
    ll_pruned = np.asarray(cc2.evaluate(ctx2.parameters, jnp.asarray(data)))[:, 0, 0].mean()
    assert abs(ll_full - ll_pruned) < 0.05, (ll_full, ll_pruned)
    # the WEIGHT-based score would have kept the unused branch instead
    pruned_w, _ = prune_circuit(sc, ctx=ctx, fraction=1 / 3)
    ctxw = PipelineContext(semiring="lse-sum", fold=True)
    ccw = ctxw.compile(pruned_w)
    ll_w = np.asarray(ccw.evaluate(ctxw.parameters, jnp.asarray(data)))[:, 0, 0].mean()
    assert ll_pruned > ll_w + 0.1, (ll_pruned, ll_w)
