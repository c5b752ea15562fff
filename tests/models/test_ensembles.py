"""Boosted density estimation (Rosset & Segal 2002) on the `mixture`
operator. Pinned: stage LLs non-decreasing, the served ensemble circuit's
density EXACTLY equals the stagewise blend (weights / Z construction),
boosting beats a single underfit component on multi-modal data, and early
stop discards useless stages. No reference counterpart (ensembles/
boosting absent; ref combines circuits only by concatenation)."""

import numpy as np
import pytest

from cirkit_tpu.backend.jax.queries import IntegrateQuery
from cirkit_tpu.models import bag_mixture, boost_mixture, tabular_data
from cirkit_tpu.models.ensembles import _per_sample_ll
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.utils import Scope


def _factory(units=2, cats=4, d=3, em_ready=False):
    def make(t):
        return tabular_data(
            "random-binary-tree",
            num_features=d,
            input_layers={"name": "categorical", "args": {"num_categories": cats}},
            num_input_units=units,
            sum_product_layer="cp",
            num_sum_units=units,
            em_ready=em_ready,
        )

    return make


def _bimodal_data(n=512, d=3, cats=4, seed=0):
    """Two far-apart discrete modes with a little noise: one tiny
    component underfits, a boosted blend should not."""
    rng = np.random.default_rng(seed)
    lo = rng.integers(0, 2, size=(n // 2, d))
    hi = rng.integers(cats - 2, cats, size=(n - n // 2, d))
    return np.concatenate([lo, hi])


@pytest.mark.slow  # trains 3-4 full components per case
@pytest.mark.parametrize("method", ["adam", "em"])
def test_boosting_monotone_and_serves_exact_blend(method):
    data = _bimodal_data()
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=11)
    res = boost_mixture(
        _factory(em_ready=(method == "em")),
        data,
        ctx=ctx,
        num_stages=3,
        method=method,
        num_epochs=12 if method == "adam" else 6,
        batch_size=256,
    )
    # accepted stages never decrease the eval LL
    assert all(
        b >= a - 1e-9 for a, b in zip(res.stage_lls, res.stage_lls[1:])
    ), res.stage_lls
    assert res.weights.sum() == pytest.approx(1.0)

    # the served circuit's normalized density == the stagewise blend of the
    # components' normalized densities (weights/Z construction, exact)
    per_comp = np.stack(
        [_per_sample_ll(c, res.store, data[:64], 64) for c in res.components]
    )
    want = np.log(np.exp(per_comp).T @ res.weights)
    got = np.asarray(res.circuit(res.store, data[:64])).reshape(64, -1)[:, 0]
    if len(res.components) > 1:
        # the mixture circuit is normalized by construction: Z == 1
        z = np.asarray(
            IntegrateQuery(res.circuit)(
                data[:1], integrate_vars=Scope(res.circuit.scope), store=res.store
            )
        ).reshape(-1)[0]
        np.testing.assert_allclose(np.exp(z), 1.0, rtol=1e-6)
    else:
        got = _per_sample_ll(res.circuit, res.store, data[:64], 64)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow
def test_boosting_beats_single_component():
    data = _bimodal_data(n=768)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=3)
    res = boost_mixture(
        _factory(units=2),
        data,
        ctx=ctx,
        num_stages=4,
        num_epochs=15,
        batch_size=256,
    )
    assert len(res.components) >= 2, "boosting accepted no extra stage"
    assert res.stage_lls[-1] > res.stage_lls[0] + 1e-3


def test_boosting_early_stops_on_huge_tol():
    data = _bimodal_data(n=256)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=5)
    res = boost_mixture(
        _factory(),
        data,
        ctx=ctx,
        num_stages=4,
        num_epochs=4,
        batch_size=128,
        tol=1e6,  # nothing can clear this bar: stop after stage 1
    )
    assert len(res.components) == 1
    assert len(res.stage_lls) == 1
    # single-stage result is the bare component, still servable
    ll = _per_sample_ll(res.circuit, res.store, data[:16], 16)
    assert np.all(np.isfinite(ll))


def test_bagging_serves_exact_uniform_blend():
    data = _bimodal_data(n=256)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=7)
    res = bag_mixture(
        _factory(),
        data,
        ctx=ctx,
        num_components=3,
        num_epochs=4,
        batch_size=128,
    )
    assert len(res.components) == 3
    np.testing.assert_allclose(res.weights, 1.0 / 3)
    assert all(np.isfinite(ll) for ll in res.stage_lls)

    # the served circuit is the exact uniform blend of the components'
    # NORMALIZED densities, and is itself normalized (Z == 1)
    per_comp = np.stack(
        [_per_sample_ll(c, res.store, data[:64], 64) for c in res.components]
    )
    want = np.log(np.exp(per_comp).T @ res.weights)
    got = np.asarray(res.circuit(res.store, data[:64])).reshape(64, -1)[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    z = np.asarray(
        IntegrateQuery(res.circuit)(
            data[:1], integrate_vars=Scope(res.circuit.scope), store=res.store
        )
    ).reshape(-1)[0]
    np.testing.assert_allclose(np.exp(z), 1.0, rtol=1e-6)


def test_bagging_single_component_and_errors():
    data = _bimodal_data(n=128)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=9)
    res = bag_mixture(
        _factory(), data, ctx=ctx, num_components=1, num_epochs=2, batch_size=64
    )
    assert len(res.components) == 1
    ll = _per_sample_ll(res.circuit, res.store, data[:16], 16)
    assert np.all(np.isfinite(ll))
    with pytest.raises(ValueError, match="num_components"):
        bag_mixture(_factory(), data, num_components=0)
    with pytest.raises(ValueError, match="method"):
        bag_mixture(_factory(), data, method="sgd")


def test_bagging_resamples_differ():
    """Different members see different bootstrap weights: with identical
    structure but a seeded rng, trained components should not coincide."""
    data = _bimodal_data(n=256)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=13)
    res = bag_mixture(
        _factory(),
        data,
        ctx=ctx,
        num_components=2,
        num_epochs=6,
        batch_size=128,
    )
    a = _per_sample_ll(res.components[0], res.store, data[:64], 64)
    b = _per_sample_ll(res.components[1], res.store, data[:64], 64)
    assert not np.allclose(a, b), "bootstrap members trained identically"


def test_boosting_validation_errors():
    data = _bimodal_data(n=64)
    with pytest.raises(ValueError, match="num_stages"):
        boost_mixture(_factory(), data, num_stages=0)
    with pytest.raises(ValueError, match="method"):
        boost_mixture(_factory(), data, method="sgd")
    with pytest.raises(ValueError, match="alpha_grid"):
        boost_mixture(_factory(), data, alpha_grid=np.array([0.0, 0.5]))
