"""The mixture operator: ensembles of independently built circuits served
as one circuit. Pinned against per-operand evaluation (p_mix = sum w_i p_i)
and exhaustive enumeration; queries run on the ensemble directly. An
extension — the reference combines circuits only by concatenation
(ref ``symbolic/functional.py:31``)."""

import numpy as np
import pytest

import cirkit_tpu
from cirkit_tpu.backend.jax.queries import IntegrateQuery, MAPQuery
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic import functional as SF
from cirkit_tpu.utils import Scope

from tests.fixtures import build_multivariate_categorical_pc
from tests.reference_eval import enumerate_worlds, eval_circuit


def _components(n=2, seed=50):
    return [
        build_multivariate_categorical_pc(
            num_variables=3, rng=np.random.default_rng(seed + i)
        )
        for i in range(n)
    ]


# fold x semiring x optimize grid (CLAUDE.md test convention; optimize
# exercises SumCollapse fusion over the blend's MixingWeight + pointer reads)
GRID = [(f, s) for f in (False, True) for s in ("sum-product", "lse-sum")]
GRID_OPT = [(f, s, o) for f, s in GRID for o in ((False, True) if f else (False,))]


@pytest.mark.parametrize("fold,semiring,optimize", GRID_OPT)
def test_fixed_weight_mixture_matches_per_operand_eval(fold, semiring, optimize):
    scs = _components(3)
    w = np.array([0.5, 0.2, 0.3])
    mix = SF.mixture(scs, weights=w)
    worlds = enumerate_worlds(3, 2)
    want = sum(wi * eval_circuit(sc, worlds)[:, 0, 0] for wi, sc in zip(w, scs))

    ctx = PipelineContext(semiring=semiring, fold=fold, optimize=optimize)
    cc = ctx.compile(mix)
    got = np.asarray(cc(ctx.parameters, worlds))[:, 0, 0]
    if semiring == "lse-sum":
        got = np.exp(got)
    np.testing.assert_allclose(got, want, rtol=1e-9)

    # partition function: Z_mix = sum_i w_i Z_i (operands are unnormalized)
    z = np.asarray(
        IntegrateQuery(cc)(
            worlds[:1], integrate_vars=Scope(range(3)), store=ctx.parameters
        )
    )[0, 0, 0]
    z_want = sum(
        wi * eval_circuit(sc, worlds)[:, 0, 0].sum() for wi, sc in zip(w, scs)
    )
    np.testing.assert_allclose(
        np.exp(z) if semiring == "lse-sum" else z, z_want, rtol=1e-9
    )


def test_default_softmax_mixture_is_normalized_and_trainable():
    import optax

    from cirkit_tpu.parallel import fit

    scs = _components(2, seed=60)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=3)
    cc = ctx.compile(SF.mixture(scs))
    worlds = enumerate_worlds(3, 2)
    # Z of the compiled mixture == brute-force sum of its own outputs
    # (the softmax coefficients are convex but the operands unnormalized)
    z = np.asarray(
        IntegrateQuery(cc)(
            worlds[:1], integrate_vars=Scope(range(3)), store=ctx.parameters
        )
    )[0, 0, 0]
    z_want = np.exp(np.asarray(cc(ctx.parameters, worlds))[:, 0, 0]).sum()
    np.testing.assert_allclose(np.exp(z), z_want, rtol=1e-6)

    data = np.concatenate([worlds] * 8)
    store, losses = fit(
        cc, data, store=dict(ctx.parameters), num_epochs=20, batch_size=64,
        optimizer=optax.adam(5e-2), shuffle=False,
    )
    assert losses[-1] < losses[0]


def test_mixture_queries_run_on_the_ensemble():
    scs = _components(2, seed=70)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    w = np.array([0.6, 0.4])
    cc = ctx.compile(SF.mixture(scs, weights=w))
    worlds = enumerate_worlds(3, 2)

    # per-sample marginals distribute over the mixture:
    # integrate(p_mix) = sum_i w_i integrate(p_i)
    got = np.exp(
        np.asarray(
            IntegrateQuery(cc)(
                worlds, integrate_vars=Scope([1]), store=ctx.parameters
            )
        )[:, 0, 0]
    )
    full = [eval_circuit(sc, worlds)[:, 0, 0].reshape(2, 2, 2) for sc in scs]
    want = sum(wi * f.sum(axis=1) for wi, f in zip(w, full))[
        worlds[:, 0], worlds[:, 2]
    ]
    np.testing.assert_allclose(got, want, rtol=1e-9)

    # MAP runs on the ensemble (max-product parse; exact on this small case
    # means its score upper-bounds every world's mixture density)
    import jax

    mask = np.zeros((1, 3), dtype=bool)  # nothing observed
    val, states = MAPQuery(cc)(
        np.zeros((1, 3), np.int32), evidence_mask=mask, store=ctx.parameters
    )
    probs = sum(wi * f.reshape(-1) for wi, f in zip(w, full))
    assert float(np.asarray(val).reshape(-1)[0]) >= np.log(probs.max()) - 1e-9

    # sampling draws valid ensemble states
    from cirkit_tpu.backend.jax.queries import SamplingQuery

    samples, _ = SamplingQuery(cc)(16, key=jax.random.PRNGKey(0), store=ctx.parameters)
    arr = np.asarray(samples)
    assert arr.shape[-1] == 3 and arr.min() >= 0 and arr.max() <= 1


def test_pipeline_mixture_wrapper_accepts_compiled_operands():
    scs = _components(2, seed=80)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc1, cc2 = ctx.compile(scs[0]), ctx.compile(scs[1])
    mixed = ctx.mixture(cc1, cc2, weights=np.array([0.25, 0.75]))
    worlds = enumerate_worlds(3, 2)
    want = 0.25 * eval_circuit(scs[0], worlds)[:, 0, 0] + 0.75 * eval_circuit(
        scs[1], worlds
    )[:, 0, 0]
    got = np.exp(np.asarray(mixed(ctx.parameters, worlds))[:, 0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # module-level wrapper too
    with ctx:
        mixed2 = cirkit_tpu.mixture(cc1, cc2, weights=np.array([0.25, 0.75]))
    got2 = np.exp(np.asarray(mixed2(ctx.parameters, worlds))[:, 0, 0])
    np.testing.assert_allclose(got2, want, rtol=1e-9)


def test_mixture_persists_and_counts_parameters(tmp_path):
    """Symbolic persistence + BIC accounting interact with the operator:
    save_circuit/load_circuit round-trips a mixture (recompile matches the
    oracle) and num_parameters sums the components' distinct tensors
    (copyref shares, never re-allocates)."""
    from cirkit_tpu.utils.checkpoint import load_circuit, save_circuit

    scs = _components(2, seed=50)
    mix = SF.mixture(scs, weights=np.array([0.4, 0.6]))
    assert mix.num_parameters == sum(sc.num_parameters for sc in scs)

    p = tmp_path / "mix.ckt"
    save_circuit(p, mix)
    mix2 = load_circuit(p)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(mix2)
    worlds = enumerate_worlds(3, 2)
    got = np.exp(np.asarray(cc(ctx.parameters, worlds))[:, 0, 0])
    want = 0.4 * eval_circuit(scs[0], worlds)[:, 0, 0] + 0.6 * eval_circuit(
        scs[1], worlds
    )[:, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_mixture_validation_errors():
    scs = _components(2)
    with pytest.raises(ValueError, match="at least two"):
        SF.mixture(scs[:1])
    other = build_multivariate_categorical_pc(
        num_variables=4, rng=np.random.default_rng(90)
    )
    with pytest.raises(ValueError, match="share one scope"):
        SF.mixture([scs[0], other])
    with pytest.raises(ValueError, match=r"shape \(2,\)"):
        SF.mixture(scs, weights=np.array([0.5, 0.3, 0.2]))
    with pytest.raises(ValueError, match="nonnegative"):
        SF.mixture(scs, weights=np.array([-0.5, 1.5]))


def test_em_ready_mixture_matches_textbook_weight_update():
    """EM on the ensemble blend: with frozen components, one full-batch EM
    step from weights w must land on the textbook mixture-weight update
    w_i' = mean_b [ w_i p_i(x_b) / p_mix(x_b) ] (responsibility averages),
    computed here by exhaustive enumeration."""
    from cirkit_tpu.parallel.em import fit_em

    scs = _components(3, seed=100)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=7)
    cc = ctx.compile(SF.mixture(scs, em_ready=True))
    blend_slot = [s for s in cc.learnable_slots if s in cc._slots]
    assert len(blend_slot) == 1, "expected exactly one learnable blend slot"
    (blend_slot,) = blend_slot

    worlds = enumerate_worlds(3, 2)
    data = np.concatenate([worlds, worlds[:3]])  # non-uniform empirical dist
    w0 = np.asarray(ctx.parameters[blend_slot]).reshape(-1).astype(np.float64)
    comp = np.stack([eval_circuit(sc, data)[:, 0, 0] for sc in scs])  # (n, B)
    resp = (w0[:, None] * comp) / (w0[:, None] * comp).sum(0, keepdims=True)
    want = resp.mean(axis=1)

    store, losses = fit_em(
        cc, data, store=dict(ctx.parameters), num_epochs=1,
        batch_size=len(data), pseudocount=0.0,
    )
    got = np.asarray(store[blend_slot]).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert len(losses) == 1


def test_em_ready_mixture_joint_em_is_monotone():
    """Joint EM through the ensemble: em_ready components (plain dirichlet
    leaves + sums) AND the blend train together; full-batch NLL is
    non-increasing every epoch."""
    from cirkit_tpu.models import tabular_data
    from cirkit_tpu.parallel.em import fit_em

    rng = np.random.default_rng(4)
    data = rng.integers(0, 2, size=(256, 3))
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=9)
    comps = [
        ctx.compile(
            tabular_data(
                "random-binary-tree",
                num_features=3,
                input_layers={"name": "categorical", "args": {"num_categories": 2}},
                num_input_units=2 + i,
                sum_product_layer="cp",
                num_sum_units=2 + i,
                em_ready=True,
            )
        )
        for i in range(2)
    ]
    mixed = ctx.mixture(*comps, em_ready=True)
    store, losses = fit_em(
        mixed, data, store=dict(ctx.parameters), num_epochs=5, batch_size=256
    )
    assert all(b <= a + 1e-7 for a, b in zip(losses, losses[1:])), losses
    # the components' own slots moved (joint EM, not blend-only)
    moved = [
        k for k in set(comps[0].learnable_slots)
        if not np.allclose(np.asarray(store[k]), np.asarray(ctx.parameters[k]))
    ]
    assert moved


def test_em_on_softmax_components_trains_blend_only_with_warning():
    """fit_em on an em_ready mixture of DEFAULT (softmax-weight, i.e.
    fit()-trained) components must not raise: the shared reparameterized
    layers stay fixed (with a warning) and the plain blend trains."""
    from cirkit_tpu.models import tabular_data
    from cirkit_tpu.parallel.em import fit_em

    rng = np.random.default_rng(3)
    data = rng.integers(0, 2, size=(128, 3))
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=8)
    comps = [
        ctx.compile(
            tabular_data(
                "random-binary-tree",
                num_features=3,
                input_layers={"name": "categorical", "args": {"num_categories": 2}},
                num_input_units=2,
                sum_product_layer="cp",
                num_sum_units=2,
            )
        )
        for _ in range(2)
    ]
    mixed = ctx.mixture(*comps, em_ready=True)
    with pytest.warns(UserWarning, match="REPARAMETERIZED"):
        store, losses = fit_em(
            mixed, data, store=dict(ctx.parameters), num_epochs=3, batch_size=128
        )
    assert all(b <= a + 1e-7 for a, b in zip(losses, losses[1:])), losses
    # components untouched, blend moved
    comp_slots = set(comps[0].used_slots) | set(comps[1].used_slots)
    for k in comp_slots:
        np.testing.assert_array_equal(
            np.asarray(store[k]), np.asarray(ctx.parameters[k])
        )
    (blend,) = [s for s in mixed.learnable_slots if s in mixed._slots]
    assert not np.allclose(np.asarray(store[blend]), np.asarray(ctx.parameters[blend]))


def test_fit_freeze_shared_trains_blend_only():
    """fit(..., freeze='shared') = stacking: the blend trains, the
    components' shared slots stay bitwise identical."""
    import optax

    from cirkit_tpu.parallel import fit

    scs = _components(2, seed=85)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=6)
    cc1, cc2 = ctx.compile(scs[0]), ctx.compile(scs[1])
    mixed = ctx.mixture(cc1, cc2)
    assert mixed.shared_learnable_slots
    worlds = enumerate_worlds(3, 2)
    store, losses = fit(
        mixed, np.concatenate([worlds] * 8), store=dict(ctx.parameters),
        num_epochs=5, batch_size=32, optimizer=optax.adam(5e-2),
        shuffle=False, freeze="shared",
    )
    assert losses[-1] < losses[0]
    for k in mixed.shared_learnable_slots:
        np.testing.assert_array_equal(
            np.asarray(store[k]), np.asarray(ctx.parameters[k])
        )
    with pytest.raises(ValueError, match="freeze"):
        fit(
            mixed, worlds, store=dict(ctx.parameters), num_epochs=1,
            batch_size=8, optimizer=optax.adam(1e-2), freeze="everything",
        )


def test_em_ready_gaussian_mixture_trains_leaves():
    """The Gaussian closed-form M-step reaches leaves behind identity-fold
    pointer slots (ensemble components): monotone NLL, leaf params move."""
    from cirkit_tpu.models import tabular_data
    from cirkit_tpu.parallel.em import fit_em, gaussian_em_layers

    rng = np.random.default_rng(0)
    data = np.concatenate(
        [rng.normal(-2, 0.5, (200, 2)), rng.normal(3, 1.0, (200, 2))]
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=2)
    comps = [
        ctx.compile(
            tabular_data(
                "random-binary-tree",
                num_features=2,
                input_layers={"name": "gaussian", "args": {}},
                num_input_units=2,
                sum_product_layer="cp",
                num_sum_units=2,
                em_ready=True,
            )
        )
        for _ in range(2)
    ]
    mixed = ctx.mixture(*comps, em_ready=True)
    assert len(gaussian_em_layers(mixed)) == 2
    store, losses = fit_em(
        mixed, data, store=dict(ctx.parameters), num_epochs=6, batch_size=400
    )
    assert all(b <= a + 1e-7 for a, b in zip(losses, losses[1:])), losses
    moved = [
        k for k in comps[0].learnable_slots
        if not np.allclose(np.asarray(store[k]), np.asarray(ctx.parameters[k]))
    ]
    assert moved


def test_mixture_trains_shared_component_parameters():
    """Learnability flows through pointer slots: fit() on the ensemble
    fine-tunes the components' shared store entries, not just the blend
    (parameter-sharing parity with the reference's operator outputs)."""
    import optax

    from cirkit_tpu.parallel import fit
    from cirkit_tpu.parallel.training import split_trainable

    scs = _components(2, seed=95)
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=5)
    cc1, cc2 = ctx.compile(scs[0]), ctx.compile(scs[1])
    mixed = ctx.mixture(cc1, cc2)
    trainable, _ = split_trainable(mixed, ctx.parameters)
    shared = set(trainable) & set(cc1.used_slots)
    assert shared, "expected the ensemble to train the components' slots"

    worlds = enumerate_worlds(3, 2)
    store, _ = fit(
        mixed, np.concatenate([worlds] * 4), store=dict(ctx.parameters),
        num_epochs=2, batch_size=16, optimizer=optax.adam(5e-2),
        shuffle=False,
    )
    moved = [
        k for k in shared
        if not np.allclose(np.asarray(store[k]), np.asarray(ctx.parameters[k]))
    ]
    assert moved, "shared component parameters did not move under fit()"
