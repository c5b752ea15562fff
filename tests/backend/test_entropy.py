"""EntropyQuery tests: exact entropies of deterministic circuits against
exhaustive enumeration, the latent upper bound on non-deterministic ones,
closed-form Gaussian differential entropies, posterior (conditional)
entropies under evidence, and the log-partition cross-check against
IntegrateQuery through the optimized fused plan. The query is an extension
— the reference has no entropy machinery."""

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax.entropy import EntropyQuery
from cirkit_tpu.backend.jax.queries import IntegrateQuery
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.utils import Scope

from tests.fixtures import build_multivariate_categorical_pc, const_param
from tests.reference_eval import enumerate_worlds, eval_circuit


def _build_deterministic_pc(rng, num_states=4):
    """2 vars, K=2 units per leaf with DISJOINT supports (unit 0 on states
    {0, 1}, unit 1 on {2, 3}), Hadamard pairing, sum root: a deterministic
    smooth decomposable PC."""
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, HadamardLayer, SumLayer

    def leaf(v):
        a, b = rng.uniform(0.2, 0.8, size=2)
        probs = np.array([[a, 1 - a, 0.0, 0.0], [0.0, 0.0, b, 1 - b]])
        return CategoricalLayer(
            Scope([v]), 2, num_categories=num_states, probs=const_param(probs)
        )

    leaves = [leaf(0), leaf(1)]
    prod = HadamardLayer(2, arity=2)
    w = rng.dirichlet(np.ones(2))
    root = SumLayer(2, 1, weight=const_param(w[None]))
    return Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])


def _enum_entropy(p):
    p = p / p.sum()
    nz = p > 0
    return float(-(p[nz] * np.log(p[nz])).sum())


@pytest.mark.parametrize("fold", [False, True])
def test_entropy_deterministic_matches_enumeration(fold):
    rng = np.random.default_rng(40)
    sc = _build_deterministic_pc(rng)
    ctx = PipelineContext(semiring="lse-sum", fold=fold)
    cc = ctx.compile(sc)
    h = EntropyQuery(cc)(store=ctx.parameters)
    worlds = enumerate_worlds(2, 4)
    p = eval_circuit(sc, worlds)[:, 0, 0]
    np.testing.assert_allclose(float(h[0, 0]), _enum_entropy(p), rtol=1e-6)


def test_entropy_upper_bounds_nondeterministic():
    """On a non-deterministic circuit the recursion returns the latent
    joint entropy H(x) + H(parse | x) >= H(x)."""
    rng = np.random.default_rng(41)
    sc = build_multivariate_categorical_pc(num_variables=4, rng=rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    h = float(EntropyQuery(cc)(store=ctx.parameters)[0, 0])
    worlds = enumerate_worlds(4, 2)
    p = eval_circuit(sc, worlds)[:, 0, 0]
    true_h = _enum_entropy(p)
    assert h >= true_h - 1e-9
    assert np.isfinite(h)


def test_entropy_gaussian_closed_form():
    """Factorized Gaussians: differential entropy adds across variables,
    0.5 log(2 pi e sigma^2) each."""
    from cirkit_tpu.symbolic import Circuit, GaussianLayer, HadamardLayer, SumLayer

    rng = np.random.default_rng(42)
    sds = rng.uniform(0.5, 2.0, size=2)
    leaves = [
        GaussianLayer(
            Scope([v]), 1, mean=const_param(np.array([0.3 * v])),
            stddev=const_param(np.array([sds[v]])),
        )
        for v in range(2)
    ]
    prod = HadamardLayer(1, arity=2)
    root = SumLayer(1, 1, weight=const_param(np.array([[1.0]])))
    sc = Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    h = float(EntropyQuery(cc)(store=ctx.parameters)[0, 0])
    want = sum(0.5 * np.log(2 * np.pi * np.e * s**2) for s in sds)
    np.testing.assert_allclose(h, want, rtol=1e-6)


def test_entropy_conditional_matches_enumeration():
    """Posterior entropy H(X_1 | x_0) on a deterministic circuit vs the
    enumerated conditional; full evidence gives exactly 0; the returned
    log-partition is the evidence log-likelihood."""
    rng = np.random.default_rng(43)
    sc = _build_deterministic_pc(rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    q = EntropyQuery(cc)
    worlds = enumerate_worlds(2, 4)
    p = eval_circuit(sc, worlds)[:, 0, 0]

    x = np.array([[0, 0], [2, 0]], dtype=np.int64)
    mask = np.array([[True, False]] * 2)
    h, lz = q(x, evidence_mask=mask, store=ctx.parameters, return_log_partition=True)
    assert h.shape == (2, 1, 1)
    for b in range(2):
        keep = worlds[:, 0] == x[b, 0]
        np.testing.assert_allclose(float(h[b, 0, 0]), _enum_entropy(p[keep]), rtol=1e-6)
        np.testing.assert_allclose(float(lz[b, 0, 0]), np.log(p[keep].sum()), rtol=1e-6)

    h_full = q(worlds, evidence_mask=np.ones((len(worlds), 2), bool), store=ctx.parameters)
    np.testing.assert_allclose(np.asarray(h_full), 0.0, atol=1e-12)


@pytest.mark.parametrize("sum_product", ["tucker", "cp", "cp-t"])
@pytest.mark.slow
def test_entropy_runs_through_optimized_plan(sum_product):
    """Through fused Tucker/CPT/TensorDot plans: the recursion's root
    log-partition must equal IntegrateQuery's all-marginalized evaluation
    (a full plan-walk cross-check), and entropies are finite, >= 0, and
    upper-bound nothing weird (<= D log S)."""
    from cirkit_tpu.models import image_data

    sc = image_data(
        (1, 4, 4), "quad-tree-2", input_layer="categorical",
        num_input_units=8, sum_product_layer=sum_product, num_sum_units=8,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=17)
    cc = ctx.compile(sc)
    h, lz = EntropyQuery(cc)(store=ctx.parameters, return_log_partition=True)
    # the latent joint entropy H(x) + H(parse | x): finite, nonnegative,
    # and at least the per-leaf floor is not asserted — the load-bearing
    # exactness check is the log-partition equality below
    assert np.isfinite(float(h[0, 0])) and float(h[0, 0]) >= 0
    x = np.zeros((1, 16), dtype=np.int64)
    want = IntegrateQuery(cc)(x, integrate_vars=Scope(range(16)), store=ctx.parameters)
    np.testing.assert_allclose(float(lz[0, 0]), float(want[0, 0, 0]), rtol=1e-5, atol=1e-9)


def test_entropy_logic_circuit_exact():
    """Compiled logic circuits are deterministic (decision disjunctions,
    deterministic smoothing gadgets): the entropy of the model
    distribution matches enumeration — log(model count) with indicator
    literals."""
    from cirkit_tpu.models.logic import (
        ConjunctionNode,
        DisjunctionNode,
        LiteralNode,
        LogicalCircuit,
        NegatedLiteralNode,
    )

    # (x0 and x1) or (not x0 and x2): disjuncts split on x0 -> deterministic
    x0, x1, x2 = LiteralNode(0), LiteralNode(1), LiteralNode(2)
    nx0 = NegatedLiteralNode(0)
    c1, c2 = ConjunctionNode(), ConjunctionNode()
    root = DisjunctionNode()
    lc = LogicalCircuit(
        [x0, x1, x2, nx0, c1, c2, root],
        {c1: [x0, x1], c2: [nx0, x2], root: [c1, c2]},
        [root],
    )
    sc = lc.build_circuit(enforce_smoothness=True)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    h = float(EntropyQuery(cc)(store=ctx.parameters)[0, 0])
    worlds = enumerate_worlds(3, 2)
    p = eval_circuit(sc, worlds)[:, 0, 0]
    np.testing.assert_allclose(h, _enum_entropy(p), rtol=1e-6)
    np.testing.assert_allclose(h, np.log(4.0), rtol=1e-6)  # 4 models, uniform


def _perturb_store(store, rng, scale=0.4, renorm_slots=()):
    """Multiplicative positive noise on every float slot: keeps zeros zero
    (support structure, hence determinism, preserved), probabilities
    nonnegative, and stddevs positive. Slots named in ``renorm_slots`` are
    row-renormalized afterwards — probs-parameterized categorical leaves
    hard-code log Z = 0, so their slots must STAY normalized."""
    out = {}
    for k, v in store.items():
        arr = np.asarray(v)
        if np.issubdtype(arr.dtype, np.floating):
            arr = arr * np.exp(rng.uniform(-scale, scale, arr.shape))
            if k in renorm_slots:
                arr = arr / arr.sum(axis=-1, keepdims=True)
            out[k] = jnp.asarray(arr)
        else:
            out[k] = v
    return out


def _normalized_leaf_slots(cc):
    """Slot names whose values the compiled layers assume normalized
    (probs-parameterized categorical leaves)."""
    from cirkit_tpu.backend.jax.circuit import _iter_param_nodes
    from cirkit_tpu.backend.jax.layers import JaxCategoricalLayer
    from cirkit_tpu.backend.jax.parameters import JaxTensorSlot

    slots = set()
    for e in cc._entries:
        layer = e.layer
        if isinstance(layer, JaxCategoricalLayer) and layer.logits is None:
            for node in _iter_param_nodes(layer):
                if isinstance(node, JaxTensorSlot):
                    slots.add(node.slot)
    return slots


def _enum_kl(p, q):
    p, q = p / p.sum(), q / q.sum()
    nz = p > 0
    return float((p[nz] * (np.log(p[nz]) - np.log(q[nz]))).sum())


def test_kl_deterministic_matches_enumeration():
    """KL(p || q) between two parameterizations of the same deterministic
    circuit vs the exhaustive KL of the two compiled distributions."""
    from cirkit_tpu.backend.jax.entropy import KLDivergenceQuery

    rng = np.random.default_rng(45)
    sc = _build_deterministic_pc(rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    sp = cc.restrict_store(ctx.parameters)
    sq = _perturb_store(sp, rng, renorm_slots=_normalized_leaf_slots(cc))
    kl = float(KLDivergenceQuery(cc)(sp, sq)[0, 0])

    worlds = enumerate_worlds(2, 4)
    pw = np.exp(np.asarray(cc.evaluate(sp, jnp.asarray(worlds)))[:, 0, 0])
    qw = np.exp(np.asarray(cc.evaluate(sq, jnp.asarray(worlds)))[:, 0, 0])
    np.testing.assert_allclose(kl, _enum_kl(pw, qw), rtol=1e-6)

    # identical parameterizations: exactly zero
    np.testing.assert_allclose(
        float(KLDivergenceQuery(cc)(sp, sp)[0, 0]), 0.0, atol=1e-12
    )


def test_kl_upper_bounds_nondeterministic():
    from cirkit_tpu.backend.jax.entropy import KLDivergenceQuery

    rng = np.random.default_rng(46)
    sc = build_multivariate_categorical_pc(num_variables=4, rng=rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    sp = cc.restrict_store(ctx.parameters)
    sq = _perturb_store(sp, rng, renorm_slots=_normalized_leaf_slots(cc))
    kl = float(KLDivergenceQuery(cc)(sp, sq)[0, 0])
    worlds = enumerate_worlds(4, 2)
    pw = np.exp(np.asarray(cc.evaluate(sp, jnp.asarray(worlds)))[:, 0, 0])
    qw = np.exp(np.asarray(cc.evaluate(sq, jnp.asarray(worlds)))[:, 0, 0])
    assert kl >= _enum_kl(pw, qw) - 1e-9
    assert np.isfinite(kl)


def test_kl_conditional_matches_enumeration():
    """Posterior KL(p(X_1 | x_0) || q(X_1 | x_0)) per sample vs the
    enumerated conditional distributions."""
    from cirkit_tpu.backend.jax.entropy import KLDivergenceQuery

    rng = np.random.default_rng(47)
    sc = _build_deterministic_pc(rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    sp = cc.restrict_store(ctx.parameters)
    sq = _perturb_store(sp, rng, renorm_slots=_normalized_leaf_slots(cc))
    x = np.array([[0, 0], [2, 0]], dtype=np.int64)
    mask = np.array([[True, False]] * 2)
    kl = KLDivergenceQuery(cc)(sp, sq, x, evidence_mask=mask)
    worlds = enumerate_worlds(2, 4)
    pw = np.exp(np.asarray(cc.evaluate(sp, jnp.asarray(worlds)))[:, 0, 0])
    qw = np.exp(np.asarray(cc.evaluate(sq, jnp.asarray(worlds)))[:, 0, 0])
    for b in range(2):
        keep = worlds[:, 0] == x[b, 0]
        np.testing.assert_allclose(
            float(kl[b, 0, 0]), _enum_kl(pw[keep], qw[keep]), rtol=1e-6
        )


def test_kl_gaussian_leaf_closed_form():
    """The Gaussian unit_kl hook matches the closed form, read back
    through the compiled layer's own parameter accessors."""
    from cirkit_tpu.backend.jax.layers import JaxGaussianLayer

    from tests.fixtures import build_bivariate_gaussian_pc

    rng = np.random.default_rng(48)
    sc = build_bivariate_gaussian_pc(num_units=3, rng=rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    sp = cc.restrict_store(ctx.parameters)
    sq = _perturb_store(sp, rng)
    layers = [e.layer for e in cc._entries if isinstance(e.layer, JaxGaussianLayer)]
    assert layers
    for layer in layers:
        got = np.asarray(layer.unit_kl(sp, sq))
        mp, s1 = np.asarray(layer.mean(sp)), np.asarray(layer.stddev(sp))
        mq, s2 = np.asarray(layer.mean(sq)), np.asarray(layer.stddev(sq))
        want = np.log(s2 / s1) + (s1**2 + (mp - mq) ** 2) / (2 * s2**2) - 0.5
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_renyi2_entropy_exact_on_nondeterministic():
    """H2 via multiply+integrate is exact even where the Shannon recursion
    is only an upper bound; the Renyi ordering H2 <= H <= latent bound
    holds throughout."""
    from cirkit_tpu.backend.jax.entropy import renyi2_entropy

    rng = np.random.default_rng(49)
    sc = build_multivariate_categorical_pc(num_variables=4, rng=rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    h2 = float(renyi2_entropy(cc, ctx=ctx)[0, 0])
    worlds = enumerate_worlds(4, 2)
    p = eval_circuit(sc, worlds)[:, 0, 0]
    ph = p / p.sum()
    np.testing.assert_allclose(h2, -np.log((ph**2).sum()), rtol=1e-6)
    h_shannon = _enum_entropy(p)
    h_bound = float(EntropyQuery(cc)(store=ctx.parameters)[0, 0])
    assert h2 <= h_shannon + 1e-9 <= h_bound + 2e-9


def test_renyi2_entropy_of_mixture():
    """H2 of an ensemble: SF.mixture creates an arity-n mixing sum, so
    squaring it exercises the kron-weight column permutation in
    ``multiply_sum_layers`` (wrong in the reference; regression for the
    round-5 fix)."""
    import cirkit_tpu.symbolic.functional as SF
    from cirkit_tpu.backend.jax.entropy import renyi2_entropy

    comps = [
        build_multivariate_categorical_pc(num_variables=4, rng=np.random.default_rng(s))
        for s in (61, 62, 63)
    ]
    mix = SF.mixture(comps, weights=[0.5, 0.3, 0.2])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(mix)
    h2 = float(renyi2_entropy(cc, ctx=ctx)[0, 0])
    worlds = enumerate_worlds(4, 2)
    p = eval_circuit(mix, worlds)[:, 0, 0]
    ph = p / p.sum()
    np.testing.assert_allclose(h2, -np.log((ph**2).sum()), rtol=1e-6)


def test_renyi2_entropy_conditional_and_gaussian():
    from cirkit_tpu.backend.jax.entropy import renyi2_entropy

    rng = np.random.default_rng(50)
    sc = _build_deterministic_pc(rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, 4)
    p = eval_circuit(sc, worlds)[:, 0, 0]
    x = np.array([[0, 0], [2, 0]], dtype=np.int64)
    mask = np.array([[True, False]] * 2)
    h2 = renyi2_entropy(cc, ctx=ctx, x=x, evidence_mask=mask)
    for b in range(2):
        keep = worlds[:, 0] == x[b, 0]
        ph = p[keep] / p[keep].sum()
        np.testing.assert_allclose(
            float(h2[b, 0, 0]), -np.log((ph**2).sum()), rtol=1e-6
        )

    # Gaussian closed form: int N(mu, s)^2 dx = 1 / (2 s sqrt(pi)) per var
    from cirkit_tpu.symbolic import Circuit, GaussianLayer, HadamardLayer, SumLayer

    sds = rng.uniform(0.5, 2.0, size=2)
    leaves = [
        GaussianLayer(Scope([v]), 1, mean=const_param(np.array([0.1])),
                      stddev=const_param(np.array([sds[v]])))
        for v in range(2)
    ]
    prod = HadamardLayer(1, arity=2)
    root = SumLayer(1, 1, weight=const_param(np.array([[1.0]])))
    scg = Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
    ctxg = PipelineContext(semiring="lse-sum", fold=True)
    ccg = ctxg.compile(scg)
    h2g = float(renyi2_entropy(ccg, ctx=ctxg)[0, 0])
    want = sum(np.log(2 * s * np.sqrt(np.pi)) for s in sds)
    np.testing.assert_allclose(h2g, want, rtol=1e-6)


def test_entropy_requires_lse_sum():
    rng = np.random.default_rng(44)
    sc = _build_deterministic_pc(rng)
    ctx = PipelineContext(semiring="sum-product", fold=True)
    cc = ctx.compile(sc)
    with pytest.raises(ValueError, match="lse-sum"):
        EntropyQuery(cc)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(sc)
    with pytest.raises(ValueError, match="requires x|evidence_mask"):
        EntropyQuery(cc2)(np.zeros((1, 2)), store=ctx2.parameters)
