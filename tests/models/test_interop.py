"""Interop formats: Juice ``.jpc`` and SPFlow text equations, both
directions, pinned by exhaustive enumeration through the round trip
(an extension — the reference loads only ``.sdd`` logic files)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.models import load_jpc, load_spflow, save_jpc, save_spflow
from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import (
    build_bivariate_categorical_pc,
    build_multivariate_categorical_pc,
)
from tests.reference_eval import enumerate_worlds


def _dist(sc, x):
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    return np.exp(np.asarray(cc.evaluate(ctx.parameters, jnp.asarray(x)))[:, 0, 0])


JPC_TEXT = """c a tiny hand-written jpc: 0.3*(x1 & x2) + 0.7*(!x1 & Bern(x2; 0.2))
jpc 8
L 0 0 1
L 1 0 2
P 2 0 2 0 1
L 3 0 -1
L 4 0 -2
S 5 0 2 1 -1.6094379124341003 4 -0.2231435513142097
P 6 0 2 3 5
S 7 0 2 2 -1.2039728043259361 6 -0.35667494393873245
"""


def test_load_jpc_matches_hand_computation(tmp_path):
    path = tmp_path / "tiny.jpc"
    path.write_text(JPC_TEXT)
    sc = load_jpc(str(path))
    worlds = enumerate_worlds(2, 2)
    got = _dist(sc, worlds)
    # worlds order: (0,0), (0,1), (1,0), (1,1)
    want = np.array([0.7 * 0.8, 0.7 * 0.2, 0.0, 0.3])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-6)


@pytest.mark.parametrize("product", ["hadamard", "kronecker"])
def test_jpc_round_trip_binary_pc(tmp_path, product):
    """save_jpc -> load_jpc preserves the distribution exactly, including
    the Kronecker digit unfolding and trained-value readback."""
    sc = build_bivariate_categorical_pc(
        num_categories=2, product=product, rng=np.random.default_rng(7)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    path = tmp_path / "rt.jpc"
    save_jpc(str(path), sc, ctx)
    back = load_jpc(str(path))
    worlds = enumerate_worlds(2, 2)
    np.testing.assert_allclose(_dist(back, worlds), _dist(sc, worlds), rtol=1e-9)


def test_jpc_round_trip_deep_pc(tmp_path):
    sc = build_multivariate_categorical_pc(
        num_variables=4, num_units=3, num_categories=2,
        rng=np.random.default_rng(11),
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    path = tmp_path / "deep.jpc"
    save_jpc(str(path), sc, ctx)
    back = load_jpc(str(path))
    worlds = enumerate_worlds(4, 2)
    np.testing.assert_allclose(_dist(back, worlds), _dist(sc, worlds), rtol=1e-9)


def test_jpc_save_rejects_nonbinary_and_gaussian(tmp_path):
    sc = build_bivariate_categorical_pc(num_categories=3)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    with pytest.raises(ValueError, match="binary"):
        save_jpc(str(tmp_path / "x.jpc"), sc, ctx)

    from tests.fixtures import build_bivariate_gaussian_pc

    sc = build_bivariate_gaussian_pc()
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    with pytest.raises(ValueError, match="Gaussian"):
        save_jpc(str(tmp_path / "y.jpc"), sc, ctx)


def test_jpc_save_requires_compiled_context(tmp_path):
    sc = build_bivariate_categorical_pc(num_categories=2)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    with pytest.raises(ValueError, match="[Cc]ompile"):
        save_jpc(str(tmp_path / "x.jpc"), sc, ctx)


def test_jpc_load_learnable_is_em_trainable(tmp_path):
    from cirkit_tpu.parallel import evaluate_ll, fit_em

    path = tmp_path / "tiny.jpc"
    path.write_text(JPC_TEXT)
    sc = load_jpc(str(path), learnable=True)
    assert sc.num_parameters > 0
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    rng = np.random.default_rng(3)
    worlds = enumerate_worlds(2, 2)
    # stay inside the circuit's support: world (1,0) has structural prob 0
    data = worlds[rng.choice(4, p=[0.5, 0.2, 0.0, 0.3], size=256)].astype(np.int32)
    before = evaluate_ll(cc, data, store=dict(ctx.parameters))
    store, _ = fit_em(cc, data, store=dict(ctx.parameters), num_epochs=5,
                      batch_size=128)
    after = evaluate_ll(cc, data, store=store)
    assert after > before + 1e-3


SPFLOW_EQ = (
    "(0.6*(Categorical(V0|p=[0.2, 0.5, 0.3]) * Bernoulli(V1|p=0.25))"
    " + 0.4*(Categorical(V0|p=[0.7, 0.1, 0.2]) * Bernoulli(V1|p=0.9)))"
)


def test_load_spflow_matches_hand_computation():
    sc = load_spflow(SPFLOW_EQ)
    p0 = np.array([[0.2, 0.5, 0.3], [0.7, 0.1, 0.2]])
    p1 = np.array([[0.75, 0.25], [0.1, 0.9]])
    w = np.array([0.6, 0.4])
    for x0 in range(3):
        for x1 in range(2):
            want = float((w * p0[:, x0] * p1[:, x1]).sum())
            got = _dist(sc, np.array([[x0, x1]]))[0]
            np.testing.assert_allclose(got, want, rtol=1e-6)


def test_spflow_round_trip_categorical(tmp_path):
    sc = build_multivariate_categorical_pc(
        num_variables=3, num_units=2, num_categories=4,
        rng=np.random.default_rng(23),
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    eq = save_spflow(sc, ctx, filename=str(tmp_path / "m.spn"))
    assert (tmp_path / "m.spn").read_text().strip() == eq
    back = load_spflow(eq)
    worlds = enumerate_worlds(3, 4)
    np.testing.assert_allclose(_dist(back, worlds), _dist(sc, worlds), rtol=1e-9)


def test_spflow_round_trip_gaussian():
    from tests.fixtures import build_bivariate_gaussian_pc

    sc = build_bivariate_gaussian_pc()
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    eq = save_spflow(sc, ctx)
    assert "Gaussian(V0|mean=" in eq
    back = load_spflow(eq)
    x = np.array([[-0.7, 0.3], [0.1, -1.2], [2.0, 0.5]])
    ctx_a = PipelineContext(semiring="lse-sum", fold=True)
    ya = np.asarray(ctx_a.compile(sc).evaluate(ctx_a.parameters, jnp.asarray(x)))
    ctx_b = PipelineContext(semiring="lse-sum", fold=True)
    yb = np.asarray(ctx_b.compile(back).evaluate(ctx_b.parameters, jnp.asarray(x)))
    np.testing.assert_allclose(yb, ya, rtol=1e-9)


def test_spflow_negative_mean_and_whitespace():
    eq = "(0.5*Gaussian(V0|mean=-1.5;stdev=0.5) + 0.5*Gaussian(V0|mean=+2.0;stdev=1.0))"
    sc = load_spflow(eq)
    # density at the first mode's mean: 0.5*N(-1.5|-1.5,.5) + 0.5*N(-1.5|2,1)
    got = _dist(sc, np.array([[-1.5]]))[0]
    from scipy.stats import norm

    want = 0.5 * norm.pdf(-1.5, -1.5, 0.5) + 0.5 * norm.pdf(-1.5, 2.0, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_spflow_parse_errors():
    with pytest.raises(ValueError, match="not supported"):
        load_spflow("Poisson(V0|mean=2.0)")
    with pytest.raises(ValueError, match="trailing"):
        load_spflow("(Categorical(V0|p=[0.5, 0.5]) * Categorical(V1|p=[0.5, 0.5])) junk")
    with pytest.raises(ValueError, match="expected"):
        load_spflow("(0.5*Categorical(V0|p=[0.5, 0.5]) + )")


def test_spflow_deep_nesting_reloads():
    """Chain-shaped (HMM-like) circuits nest the equation ~linearly in
    sequence length; the iterative parser must not hit Python's recursion
    limit (regression: the recursive-descent version crashed ~600 deep)."""
    eq = "Bernoulli(V0|p=0.5)"
    for _ in range(1500):
        eq = f"(0.5*{eq} + 0.5*Bernoulli(V0|p=0.4))"
    sc = load_spflow(eq)
    got = _dist(sc, np.array([[1]]))[0]
    # the fixpoint of p -> 0.5 p + 0.2 is 0.4 + 0.1 * 0.5^1500
    np.testing.assert_allclose(got, 0.4, rtol=1e-9)


def test_save_store_override_exports_trained_values(tmp_path):
    """save_jpc/save_spflow(store=...) export the given trained store even
    when ctx.parameters was never updated (the prune_circuit convention)."""
    from cirkit_tpu.parallel import evaluate_ll, fit_em

    sc = build_multivariate_categorical_pc(
        num_variables=3, num_units=2, num_categories=2,
        rng=np.random.default_rng(31),
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 2, (200, 3)).astype(np.int32)
    store, _ = fit_em(cc, data, store=dict(ctx.parameters), num_epochs=4,
                      batch_size=100)
    ll_trained = float(evaluate_ll(cc, data, store=store))
    ll_init = float(evaluate_ll(cc, data, store=dict(ctx.parameters)))
    assert abs(ll_trained - ll_init) > 1e-3  # training moved the params

    path = tmp_path / "trained.jpc"
    save_jpc(str(path), sc, ctx, store=store)  # ctx.parameters NOT updated
    back = load_jpc(str(path))
    bctx = PipelineContext(semiring="lse-sum", fold=True)
    bll = float(evaluate_ll(bctx.compile(back), data, store=bctx.parameters))
    np.testing.assert_allclose(bll, ll_trained, rtol=1e-9)

    eq = save_spflow(sc, ctx, store=store)
    back = load_spflow(eq)
    bctx = PipelineContext(semiring="lse-sum", fold=True)
    bll = float(evaluate_ll(bctx.compile(back), data, store=bctx.parameters))
    np.testing.assert_allclose(bll, ll_trained, rtol=1e-9)


def test_jpc_corrupt_product_child_count_raises(tmp_path):
    path = tmp_path / "bad.jpc"
    path.write_text("jpc 3\nL 0 0 1\nL 1 0 2\nP 2 0 1 0 1\n")
    with pytest.raises(ValueError, match="children"):
        load_jpc(str(path))


def test_load_negative_sum_weights_raise():
    with pytest.raises(ValueError, match="monotone"):
        load_spflow("(1.5*Bernoulli(V0|p=0.5) + -0.5*Bernoulli(V0|p=0.4))")


def test_spflow_onehot_leaf_stays_learnable_but_jpc_literal_frozen(tmp_path):
    from cirkit_tpu.symbolic.parameters import TensorParameter

    def leaf_flags(sc):
        from cirkit_tpu.symbolic.layers import CategoricalLayer

        out = []
        for sl in sc.layers:
            if isinstance(sl, CategoricalLayer):
                (node,) = [n for n in sl.params["probs"].nodes
                           if isinstance(n, TensorParameter)]
                out.append(node.learnable)
        return out

    # SPFlow: a vertex-valued p is a genuine parameter -> learnable
    sc = load_spflow("(0.5*Categorical(V0|p=[0.0, 1.0]) + "
                     "0.5*Categorical(V0|p=[0.3, 0.7]))", learnable=True)
    assert all(leaf_flags(sc))
    # JPC: literal indicators are structure -> frozen
    path = tmp_path / "lit.jpc"
    path.write_text("jpc 3\nL 0 0 1\nL 1 0 -1\nS 2 0 2 0 -0.5 1 -0.9\n")
    sc = load_jpc(str(path), learnable=True)
    assert not any(leaf_flags(sc))


def test_num_parameters_through_operator_references():
    """Operator-derived circuits hold ReferenceParameters; num_parameters
    must count the dereferenced targets (once) instead of reporting 0."""
    from cirkit_tpu.symbolic import functional

    sc = build_bivariate_categorical_pc(num_categories=2)
    prod = functional.multiply(sc, sc)
    assert sc.num_parameters > 0
    # both operands reference the SAME tensors -> deduped to sc's count
    assert prod.num_parameters == sc.num_parameters


def test_spflow_path_with_parenthesis(tmp_path):
    path = tmp_path / "model (copy).spn"
    path.write_text(SPFLOW_EQ)
    sc = load_spflow(str(path))
    got = _dist(sc, np.array([[0, 0]]))[0]
    np.testing.assert_allclose(got, 0.6 * 0.2 * 0.75 + 0.4 * 0.7 * 0.1, rtol=1e-6)


def test_jpc_zero_weight_round_trips_exact(tmp_path):
    """Structural zeros survive the log round trip exactly (the -800
    sentinel underflows to 0.0; -745 would reload as a 5e-324 subnormal)."""
    from tests.fixtures import const_param
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, HadamardLayer, SumLayer
    from cirkit_tpu.utils import Scope

    leaves = [
        CategoricalLayer(Scope([v]), 2, num_categories=2,
                         probs=const_param(np.array([[0.3, 0.7], [0.8, 0.2]])))
        for v in range(2)
    ]
    prod = HadamardLayer(2, arity=2)
    out = SumLayer(2, 1, weight=const_param(np.array([[0.0, 1.0]])))
    sc = Circuit(leaves + [prod, out], {prod: leaves, out: [prod]}, [out])
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    path = tmp_path / "zero.jpc"
    save_jpc(str(path), sc, ctx)
    back = load_jpc(str(path))
    from cirkit_tpu.symbolic.parameters import TensorParameter

    weights = [
        n.initializer.value
        for sl in back.layers if isinstance(sl, SumLayer)
        for n in sl.params["weight"].nodes if isinstance(n, TensorParameter)
    ]
    assert any(np.any(w == 0.0) for w in weights)
    worlds = enumerate_worlds(2, 2)
    np.testing.assert_allclose(_dist(back, worlds), _dist(sc, worlds), rtol=1e-12)


# ---------------------------------------------------------------------------
# UAI networks
# ---------------------------------------------------------------------------


def _uai_text(net_type, cards, scopes, tables):
    parts = [net_type, str(len(cards)), " ".join(map(str, cards)), str(len(scopes))]
    parts += [f"{len(s)} " + " ".join(map(str, s)) for s in scopes]
    for t in tables:
        flat = np.asarray(t).reshape(-1)
        parts.append(str(flat.size))
        parts.append(" ".join(repr(float(x)) for x in flat))
    return "\n".join(parts) + "\n"


def _brute_force(cards, scopes, tables):
    """Unnormalized factor product over every world, UAI entry order."""
    worlds = np.array(list(np.ndindex(*cards)), dtype=np.int64)
    vals = np.ones(len(worlds))
    for scope, table in zip(scopes, tables):
        table = np.asarray(table).reshape([cards[v] for v in scope])
        for i, w in enumerate(worlds):
            vals[i] *= table[tuple(w[v] for v in scope)]
    return worlds, vals


def _uai_case(seed, n, max_card=3, m=None):
    rng = np.random.default_rng(seed)
    cards = list(rng.integers(2, max_card + 1, size=n))
    m = m if m is not None else n
    scopes = []
    for _ in range(m):
        k = int(rng.integers(1, min(3, n) + 1))
        scopes.append(tuple(rng.choice(n, size=k, replace=False)))
    tables = [
        rng.uniform(0.05, 2.0, size=[cards[v] for v in scope])
        for scope in scopes
    ]
    return cards, scopes, tables


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_load_uai_matches_brute_force(tmp_path, seed):
    """The VE-compiled circuit IS the network polynomial: pointwise values
    equal the factor product and integration equals Z, on random MARKOV
    networks with mixed cardinalities."""
    from cirkit_tpu.backend.jax.queries import IntegrateQuery
    from cirkit_tpu.models import load_uai

    cards, scopes, tables = _uai_case(seed, n=5)
    path = tmp_path / "net.uai"
    path.write_text(_uai_text("MARKOV", cards, scopes, tables))
    sc = load_uai(str(path))
    assert sc.is_smooth and sc.is_decomposable

    worlds, want = _brute_force(cards, scopes, tables)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    got = np.exp(
        np.asarray(cc.evaluate(ctx.parameters, jnp.asarray(worlds)))[:, 0, 0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    q = IntegrateQuery(cc)
    z = float(np.exp(np.asarray(q(
        jnp.asarray(worlds[:1]), integrate_vars=np.ones(len(cards), bool),
        store=ctx.parameters)))[0, 0, 0])
    np.testing.assert_allclose(z, want.sum(), rtol=1e-6)


def test_load_uai_bayes_normalized(tmp_path):
    """A BAYES network's CPT product has Z == 1; posterior marginals from
    IntegrateQuery match enumeration."""
    from cirkit_tpu.backend.jax.queries import IntegrateQuery
    from cirkit_tpu.models import load_uai
    from cirkit_tpu.utils import Scope

    # v0 -> v1 -> v2 chain, binary
    rng = np.random.default_rng(9)
    p0 = rng.dirichlet([1, 1])
    p10 = np.stack([rng.dirichlet([1, 1]) for _ in range(2)])  # (v0, v1)
    p21 = np.stack([rng.dirichlet([1, 1]) for _ in range(2)])  # (v1, v2)
    path = tmp_path / "net.uai"
    path.write_text(_uai_text(
        "BAYES", [2, 2, 2], [(0,), (0, 1), (1, 2)], [p0, p10, p21]
    ))
    sc = load_uai(str(path))
    worlds, want = _brute_force([2, 2, 2], [(0,), (0, 1), (1, 2)], [p0, p10, p21])
    np.testing.assert_allclose(want.sum(), 1.0, rtol=1e-12)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    np.testing.assert_allclose(
        _dist(sc, worlds), want, rtol=1e-6
    )
    # p(v2=1 | v0=0): integrate out v1 at evidence (v0=0, v2=1)
    q = IntegrateQuery(cc)
    ev = jnp.asarray(np.array([[0, 0, 1]], dtype=np.int64))
    num = float(np.exp(np.asarray(q(
        ev, integrate_vars=Scope([1]), store=ctx.parameters))[0, 0, 0]))
    den = float(np.exp(np.asarray(q(
        ev, integrate_vars=Scope([1, 2]), store=ctx.parameters))[0, 0, 0]))
    mask = (worlds[:, 0] == 0)
    np.testing.assert_allclose(
        num / den,
        want[mask & (worlds[:, 2] == 1)].sum() / want[mask].sum(),
        rtol=1e-6,
    )


def test_load_uai_custom_order_and_free_variable(tmp_path):
    """A variable in no factor contributes card(v) to Z; a user-supplied
    elimination order gives the same distribution."""
    from cirkit_tpu.models import load_uai

    cards, scopes, tables = [2, 3, 2], [(0, 2)], [np.full((2, 2), 0.5)]
    path = tmp_path / "net.uai"
    path.write_text(_uai_text("MARKOV", cards, scopes, tables))
    worlds = np.array(list(np.ndindex(2, 3, 2)), dtype=np.int64)
    for order in (None, [2, 0, 1], [1, 2, 0]):
        sc = load_uai(str(path), elimination_order=order)
        got = _dist(sc, worlds)
        np.testing.assert_allclose(got, 0.5, rtol=1e-9)


def test_load_uai_errors(tmp_path):
    from cirkit_tpu.models import load_uai

    path = tmp_path / "bad.uai"
    path.write_text("FACTORGRAPH\n1\n2\n0\n")
    with pytest.raises(ValueError, match="network type"):
        load_uai(str(path))
    path.write_text(_uai_text("MARKOV", [2, 2], [(0, 1)], [np.ones((2, 2))])
                    .replace("4", "3", 1))
    with pytest.raises(ValueError, match="entries"):
        load_uai(str(path))
    path.write_text(_uai_text("MARKOV", [2, 2], [(0, 1)], [np.ones((2, 2))]))
    with pytest.raises(ValueError, match="max_table_entries"):
        load_uai(str(path), max_table_entries=2)
    with pytest.raises(ValueError, match="permutation"):
        load_uai(str(path), elimination_order=[0])


def test_load_uai_evidence(tmp_path):
    """.evid files (with and without the leading sample-count line) drive
    IntegrateQuery to the exact evidence marginal."""
    from cirkit_tpu.backend.jax.queries import IntegrateQuery
    from cirkit_tpu.models import load_uai, load_uai_evidence

    cards, scopes, tables = _uai_case(4, n=4)
    net = tmp_path / "net.uai"
    net.write_text(_uai_text("MARKOV", cards, scopes, tables))
    sc = load_uai(str(net))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)

    for text in ("2 0 1 3 0\n", "1\n2 0 1 3 0\n"):
        ev = tmp_path / "e.evid"
        ev.write_text(text)
        x, observed = load_uai_evidence(str(ev), 4)
        assert list(observed) == [True, False, False, True]
        assert x[0, 0] == 1 and x[0, 3] == 0
        got = float(np.exp(np.asarray(IntegrateQuery(cc)(
            jnp.asarray(x), integrate_vars=~observed,
            store=ctx.parameters))[0, 0, 0]))
        worlds, vals = _brute_force(cards, scopes, tables)
        want = vals[(worlds[:, 0] == 1) & (worlds[:, 3] == 0)].sum()
        np.testing.assert_allclose(got, want, rtol=1e-6)

    ev = tmp_path / "bad.evid"
    ev.write_text("3 0 1\n")
    with pytest.raises(ValueError, match="pairs"):
        load_uai_evidence(str(ev), 4)
    ev.write_text("1 9 1\n")
    with pytest.raises(ValueError, match="out of range"):
        load_uai_evidence(str(ev), 4)


def test_load_uai_input_validation(tmp_path):
    from cirkit_tpu.models import load_uai, load_uai_evidence

    path = tmp_path / "bad.uai"
    # trailing tokens: factor count understated
    path.write_text("MARKOV\n2\n2 2\n1\n2 0 1\n4\n1 1 1 1\n4\n1 1 1 1\n")
    with pytest.raises(ValueError, match="trailing"):
        load_uai(str(path))
    # zero cardinality
    path.write_text("MARKOV\n1\n0\n0\n")
    with pytest.raises(ValueError, match="cardinalities"):
        load_uai(str(path))
    # duplicated scope variable
    path.write_text("MARKOV\n2\n2 2\n1\n2 0 0\n4\n1 1 1 1\n")
    with pytest.raises(ValueError, match="repeats"):
        load_uai(str(path))
    # evidence state validation
    ev = tmp_path / "e.evid"
    ev.write_text("1 0 5\n")
    with pytest.raises(ValueError, match="state"):
        load_uai_evidence(str(ev), 2, cards=[2, 2])
    ev.write_text("1 0 -1\n")
    with pytest.raises(ValueError, match="state"):
        load_uai_evidence(str(ev), 2)
