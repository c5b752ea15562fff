"""Structure-growing tests: noise=0 duplication is exactly lossless
(pinned by enumeration through Hadamard and Kronecker templates and on
Gaussian leaves), noise>0 stays a small perturbation while breaking the
copy symmetry, and the grow -> EM fine-tune loop recovers likelihood a
too-small model cannot reach (Dang et al.'s grow/prune recipe — the
reference has no structure-editing machinery at all)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax.pruning import grow_circuit, prune_circuit
from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import (
    build_bivariate_categorical_pc,
    build_bivariate_gaussian_pc,
    build_multivariate_categorical_pc,
)
from tests.reference_eval import enumerate_worlds


def _dist(ctx, cc, x):
    return np.asarray(cc.evaluate(ctx.parameters, jnp.asarray(x)))[:, 0, :]


@pytest.mark.parametrize("product", ["hadamard", "kronecker"])
def test_grow_noise_zero_is_lossless(product):
    sc = build_bivariate_categorical_pc(product=product, rng=np.random.default_rng(80))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, 3)
    want = _dist(ctx, cc, worlds)

    grown, report = grow_circuit(sc, ctx=ctx, fraction=0.5, noise=0.0)
    assert report["units_after"] > report["units_before"]
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    got = _dist(ctx2, ctx2.compile(grown), worlds)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_grow_noise_zero_lossless_deep_and_gaussian():
    sc = build_multivariate_categorical_pc(num_variables=4, rng=np.random.default_rng(81))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    worlds = enumerate_worlds(4, 2)
    want = _dist(ctx, ctx.compile(sc), worlds)
    grown, _ = grow_circuit(sc, ctx=ctx, fraction=1.0, noise=0.0)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    got = _dist(ctx2, ctx2.compile(grown), worlds)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)

    scg = build_bivariate_gaussian_pc(num_units=3, rng=np.random.default_rng(82))
    ctxg = PipelineContext(semiring="lse-sum", fold=True)
    ctxg.compile(scg)
    x = np.random.default_rng(0).normal(size=(7, 2))
    want = _dist(ctxg, ctxg.compile(scg), x)
    growng, _ = grow_circuit(scg, ctx=ctxg, fraction=0.5, noise=0.0)
    ctxg2 = PipelineContext(semiring="lse-sum", fold=True)
    got = _dist(ctxg2, ctxg2.compile(growng), x)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_grow_noise_perturbs_but_stays_close():
    sc = build_bivariate_categorical_pc(product="hadamard", rng=np.random.default_rng(83))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    worlds = enumerate_worlds(2, 3)
    want = _dist(ctx, ctx.compile(sc), worlds)
    grown, _ = grow_circuit(sc, ctx=ctx, fraction=1.0, noise=0.02, seed=7)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    got = _dist(ctx2, ctx2.compile(grown), worlds)
    # close in distribution ...
    np.testing.assert_allclose(got, want, atol=0.15)
    # ... but the copies are genuinely differentiated (symmetry broken)
    assert not np.allclose(got, want, atol=1e-9)


def test_grow_then_em_recovers_capacity():
    """A K=1 (fully factorized) model cannot fit correlated data; growing
    to K=2 and EM fine-tuning must beat the converged K=1 likelihood."""
    from cirkit_tpu.parallel.em import fit_em

    rng = np.random.default_rng(84)
    # two anti-correlated clusters over 2 ternary variables
    n = 400
    comp = rng.integers(0, 2, size=n)
    x = np.where(comp[:, None] == 0, 0, 2) + rng.integers(0, 1 + 1, size=(n, 2))
    x = np.clip(x, 0, 2).astype(np.int64)

    sc = build_bivariate_categorical_pc(
        num_units=1, product="hadamard", rng=np.random.default_rng(85)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    store1, losses1 = fit_em(cc, x, store=ctx.parameters, num_epochs=15)

    grown, report = grow_circuit(sc, ctx=ctx, store=store1, fraction=1.0, noise=0.1, seed=3)
    assert report["units_after"] > report["units_before"]
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    cc2 = ctx2.compile(grown)
    store2, losses2 = fit_em(cc2, x, store=ctx2.parameters, num_epochs=25)
    # final NLL must improve by a clear margin over the converged K=1 fit
    assert losses2[-1] < losses1[-1] - 0.05


def test_grow_prune_roundtrip_lossless():
    """Growing with copies then pruning the grown circuit at threshold 0
    keeps the distribution intact end to end."""
    sc = build_bivariate_categorical_pc(product="hadamard", rng=np.random.default_rng(86))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    worlds = enumerate_worlds(2, 3)
    want = _dist(ctx, ctx.compile(sc), worlds)
    grown, _ = grow_circuit(sc, ctx=ctx, fraction=0.5, noise=0.0)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    ctx2.compile(grown)
    pruned, _ = prune_circuit(grown, ctx=ctx2, threshold=0.0)
    ctx3 = PipelineContext(semiring="lse-sum", fold=True)
    got = _dist(ctx3, ctx3.compile(pruned), worlds)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_grow_validation():
    sc = build_bivariate_categorical_pc(product="hadamard", rng=np.random.default_rng(87))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    with pytest.raises(ValueError, match="Compile the circuit"):
        grow_circuit(sc, ctx=ctx)
    ctx.compile(sc)
    with pytest.raises(ValueError, match="fraction"):
        grow_circuit(sc, ctx=ctx, fraction=0.0)
    with pytest.raises(ValueError, match="noise"):
        grow_circuit(sc, ctx=ctx, noise=-1.0)


def test_grow_with_data_scores_lossless_at_noise_zero():
    """Growth ranked by expected usage flows (data=) stays exactly
    lossless at noise=0 and duplicates the data-used units."""
    sc = build_multivariate_categorical_pc(num_variables=3, rng=np.random.default_rng(85))
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(3, 2)
    want = _dist(ctx, cc, worlds)
    rng = np.random.default_rng(3)
    data = worlds[rng.integers(0, len(worlds), size=64)].astype(np.int32)
    grown, rep = grow_circuit(sc, ctx=ctx, fraction=0.34, noise=0.0, data=data)
    assert rep["units_after"] > rep["units_before"]
    ctx2 = PipelineContext(semiring="lse-sum", fold=True)
    got = _dist(ctx2, ctx2.compile(grown), worlds)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_grow_prune_loop_improves_over_em_only():
    """The orchestrated grow/prune loop: a deliberately too-small em_ready
    template gains held-out LL over plain EM at comparable size, history
    tracks stages, and the returned best store matches the best circuit."""
    from cirkit_tpu.backend.jax.pruning import grow_prune_loop
    from cirkit_tpu.models import tabular_data
    from cirkit_tpu.parallel import evaluate_ll

    rng = np.random.default_rng(87)
    # 3 latent modes over 6 vars; a 2-unit model underfits
    protos = rng.integers(0, 4, size=(3, 6))
    lab = rng.integers(0, 3, size=700)
    data = protos[lab]
    data = np.where(rng.random(data.shape) < 0.15,
                    rng.integers(0, 4, data.shape), data).astype(np.int32)
    train, val = data[:500], data[500:]

    sc = tabular_data(
        "random-binary-tree", num_features=6,
        input_layers={"name": "categorical", "args": {"num_categories": 4}},
        num_input_units=2, sum_product_layer="cp", num_sum_units=2,
        em_ready=True,
    )
    best_sc, best_store, history = grow_prune_loop(
        sc, train, val_data=val, rounds=2, grow_fraction=1.0,
        prune_fraction=0.25, noise=0.6, em_epochs=8, batch_size=128, seed=1,
    )
    assert history[0][0] == "init"
    lls = [h[2] for h in history]
    assert max(lls[1:]) > lls[0] + 1e-3  # structure search beat plain EM
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(best_sc)
    got = evaluate_ll(cc, val, store=best_store)
    assert abs(got - max(lls)) < 1e-6

def test_num_parameters_counts_learnable_tensors():
    """Circuit.num_parameters: exact counts on hand-wired fixtures, shared
    tensors counted once (ref()), constants excluded — the k of BIC/AIC."""
    # hadamard: two (2,3) categorical prob tables + one (1,2) sum weight
    sc = build_bivariate_categorical_pc(product="hadamard")
    assert sc.num_parameters == 2 * (2 * 3) + 2
    # kronecker widens only the sum weight: (1, 4)
    sc = build_bivariate_categorical_pc(product="kronecker")
    assert sc.num_parameters == 2 * (2 * 3) + 4
    # softmax parameterization: same raw tensor count (dof convention)
    sc = build_bivariate_categorical_pc(use_softmax=True)
    assert sc.num_parameters == 2 * (2 * 3) + 2


def test_num_parameters_dedupes_shared_and_skips_frozen():
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, HadamardLayer, SumLayer
    from cirkit_tpu.utils import Scope
    from tests.fixtures import const_param

    probs = np.full((2, 3), 1.0 / 3)
    p0 = const_param(probs)
    leaf0 = CategoricalLayer(Scope([0]), 2, num_categories=3, probs=p0)
    # second leaf SHARES the same TensorParameter node via ref()
    leaf1 = CategoricalLayer(Scope([1]), 2, num_categories=3, probs=p0.ref())
    prod = HadamardLayer(2, arity=2)
    out = SumLayer(2, 1, weight=const_param(np.full((1, 2), 0.5), learnable=False))
    sc = Circuit([leaf0, leaf1, prod, out], {prod: [leaf0, leaf1], out: [prod]}, [out])
    # shared table counts once; the frozen sum weight not at all
    assert sc.num_parameters == 2 * 3

def test_selection_score_math():
    """BIC/AIC scores: exact formulas (maximize-is-better rescaling) and
    the capacity-penalty ordering BIC > AIC for n > e^2."""
    import math

    from cirkit_tpu.backend.jax.pruning import selection_score

    assert selection_score(-1.5, 1000, 200, "ll") == -1.5
    np.testing.assert_allclose(
        selection_score(-1.5, 1000, 200, "aic"), -1.5 * 200 - 1000
    )
    np.testing.assert_allclose(
        selection_score(-1.5, 1000, 200, "bic"),
        -1.5 * 200 - 0.5 * 1000 * math.log(200),
    )
    # for n=200 > e^2 the BIC penalty per parameter exceeds AIC's
    assert selection_score(-1.5, 1000, 200, "bic") < selection_score(
        -1.5, 1000, 200, "aic"
    )
    with pytest.raises(ValueError, match="criterion"):
        selection_score(0.0, 1, 10, "mdl")


@pytest.mark.slow
def test_grow_prune_loop_bic_rejects_marginal_growth(monkeypatch):
    """With an LL sequence that improves only epsilon per stage, plain 'll'
    selection chases the growth while 'bic' keeps the smaller init model —
    the capacity penalty is live in the loop's best-tracking."""
    import cirkit_tpu.parallel as parallel
    from cirkit_tpu.backend.jax import pruning
    from cirkit_tpu.models import image_data

    def compile_small(seed):
        ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=seed)
        sc = image_data(
            (1, 4, 4), "quad-tree-4", input_layer="categorical",
            num_input_units=4, sum_product_layer="cp", num_sum_units=4,
            em_ready=True,
        )
        return sc, ctx

    data = np.random.default_rng(5).integers(0, 256, (48, 16), dtype=np.int64)
    kwargs = dict(
        rounds=1, grow_fraction=0.5, prune_fraction=0.0, noise=0.0,
        em_epochs=1, batch_size=48, seed=0,
    )

    def run(criterion):
        lls = iter(-10.0 + 1e-4 * np.arange(10.0))  # epsilon-improving
        monkeypatch.setattr(parallel, "evaluate_ll", lambda *a, **k: next(lls))
        sc, ctx = compile_small(seed=21)
        best_sc, _, history = pruning.grow_prune_loop(
            sc, data, ctx=ctx, criterion=criterion, **kwargs
        )
        return best_sc, history

    best_ll, hist_ll = run("ll")
    best_bic, hist_bic = run("bic")
    units = lambda s: sum(sl.num_output_units for sl in s.topological_ordering())
    assert [u for _, u, _ in hist_ll] == [u for _, u, _ in hist_bic]
    assert units(best_ll) == hist_ll[-1][1]   # ll chased the grown model
    assert units(best_bic) == hist_bic[0][1]  # bic kept the smaller init
    assert units(best_bic) < units(best_ll)


@pytest.mark.slow
def test_grow_prune_loop_resume_criterion_mismatch_raises(tmp_path, monkeypatch):
    import cirkit_tpu.parallel as parallel
    from cirkit_tpu.backend.jax import pruning
    from cirkit_tpu.models import image_data

    monkeypatch.setattr(parallel, "evaluate_ll", lambda *a, **k: -1.0)
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=3)
    sc = image_data(
        (1, 4, 4), "quad-tree-4", input_layer="categorical",
        num_input_units=4, sum_product_layer="cp", num_sum_units=4,
        em_ready=True,
    )
    data = np.random.default_rng(4).integers(0, 256, (32, 16), dtype=np.int64)
    kwargs = dict(rounds=1, grow_fraction=0.25, prune_fraction=0.0, noise=0.0,
                  em_epochs=1, batch_size=32, seed=0,
                  checkpoint_dir=str(tmp_path / "loop"))
    pruning.grow_prune_loop(sc, data, ctx=ctx, criterion="bic", **kwargs)
    with pytest.raises(ValueError, match="criterion mismatch"):
        pruning.grow_prune_loop(
            sc, data, ctx=PipelineContext(semiring="lse-sum", fold=True,
                                          optimize=True, seed=3),
            criterion="aic", resume=True, **kwargs,
        )
