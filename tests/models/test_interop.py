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
