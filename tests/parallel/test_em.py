"""EM training: monotone likelihood on full-batch EM, closed-form posterior
check on a mixture, damped/mini-batch behavior, and requirement errors."""

import numpy as np
import pytest

from cirkit_tpu.models import image_data
from cirkit_tpu.models.utils import Parameterization
from cirkit_tpu.parallel.em import em_slots, fit_em
from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import build_bivariate_categorical_pc
from tests.reference_eval import eval_circuit, eval_parameter


def _em_ready_image_circuit(ctx, optimize=False):
    sc = image_data(
        (1, 4, 4),
        "quad-tree-2",
        input_layer="categorical",
        num_input_units=3,
        sum_product_layer="cp",
        num_sum_units=3,
        input_params={"probs": Parameterization(activation="none", initialization="dirichlet")},
        sum_weight_param=Parameterization(activation="none", initialization="dirichlet"),
    )
    return ctx.compile(sc)


@pytest.mark.slow
def test_em_full_batch_monotonically_increases_likelihood():
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=3)
    cc = _em_ready_image_circuit(ctx)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(4, 16))
    data = np.clip(base[rng.integers(0, 4, 512)] + rng.integers(-8, 9, (512, 16)), 0, 255)
    store, losses = fit_em(
        cc, data, store=ctx.parameters, num_epochs=8, batch_size=256
    )
    # full-batch EM: NLL non-increasing every epoch, strictly better overall
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 1.0, losses
    # weights stay normalized distributions
    for slot, kind in em_slots(cc).items():
        w = np.asarray(store[slot])
        assert (w >= 0).all()
        np.testing.assert_allclose(w.sum(axis=-1), 1.0, rtol=1e-6)


def test_em_one_step_matches_posterior_closed_form():
    """Mixture of product-of-categoricals with frozen (softmax) leaves: the
    exact EM update is w_k' = (1/N) sum_b posterior(k | x_b)."""
    sc = build_bivariate_categorical_pc(
        num_units=3, use_softmax=True, rng=np.random.default_rng(40)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    slots = em_slots(cc)
    assert list(slots.values()) == ["sum"]  # softmax leaves are not EM slots
    (wslot,) = slots

    rng = np.random.default_rng(41)
    data = rng.integers(0, 3, size=(64, 2))
    store, losses = fit_em(
        cc, data, store=ctx.parameters, num_epochs=1, batch_size=64, pseudocount=0.0
    )

    # numpy posterior: component likelihoods from the symbolic fixture
    layers = list(sc.topological_ordering())
    cat0, cat1 = layers[0], layers[1]
    p0 = eval_parameter(cat0.probs)  # (K, C)
    p1 = eval_parameter(cat1.probs)
    w = eval_parameter(sc.outputs[0].weight)[0]  # (K,)
    comp = p0[:, data[:, 0]] * p1[:, data[:, 1]]  # (K, B)
    post = (w[:, None] * comp) / (w[:, None] * comp).sum(axis=0, keepdims=True)
    want = post.sum(axis=1) / len(data)
    np.testing.assert_allclose(np.asarray(store[wslot])[0, 0], want, rtol=1e-5)


def test_em_damped_step_interpolates():
    sc = build_bivariate_categorical_pc(
        num_units=2, use_softmax=True, rng=np.random.default_rng(42)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    (wslot,) = em_slots(cc)
    data = np.random.default_rng(43).integers(0, 3, size=(32, 2))
    full, _ = fit_em(cc, data, store=ctx.parameters, num_epochs=1, pseudocount=0.0)
    half, _ = fit_em(
        cc, data, store=ctx.parameters, num_epochs=1, step_size=0.5, pseudocount=0.0
    )
    w0 = np.asarray(ctx.parameters[wslot])
    np.testing.assert_allclose(
        np.asarray(half[wslot]), 0.5 * w0 + 0.5 * np.asarray(full[wslot]), rtol=1e-6
    )


@pytest.mark.slow
def test_em_mesh_matches_single_device():
    """Data-parallel EM over the 8-device mesh: same losses and same final
    weights as the single-device recursion (flows all-reduce like grads)."""
    from cirkit_tpu.parallel import default_mesh

    data = np.random.default_rng(47).integers(0, 256, size=(128, 16))

    def run(mesh):
        ctx = PipelineContext(semiring="lse-sum", fold=True, seed=11)
        cc = _em_ready_image_circuit(ctx)
        return fit_em(
            cc, data, store=ctx.parameters, num_epochs=2, batch_size=32, mesh=mesh
        )

    store_1, losses_1 = run(None)
    store_8, losses_8 = run(default_mesh(8))
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-9)
    for k in store_1:
        np.testing.assert_allclose(
            np.asarray(store_8[k]), np.asarray(store_1[k]), rtol=1e-9, err_msg=k
        )


def test_em_rejects_reparameterized_weights():
    sc = build_bivariate_categorical_pc(use_softmax=False, rng=np.random.default_rng(44))
    # default image circuit: softmax sum weights -> not EM-trainable
    softmax_sc = image_data(
        (1, 2, 2), "quad-tree-2", input_layer="categorical",
        num_input_units=2, sum_product_layer="cp", num_sum_units=2,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(softmax_sc)
    with pytest.raises(ValueError, match="plain weight tensors"):
        em_slots(cc)


def test_em_partial_final_batch_counts_every_sample():
    """63 samples with batch 32: flows must match the single-batch run."""
    sc = build_bivariate_categorical_pc(
        num_units=2, use_softmax=True, rng=np.random.default_rng(45)
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    (wslot,) = em_slots(cc)
    data = np.random.default_rng(46).integers(0, 3, size=(63, 2))
    a, la = fit_em(cc, data, store=ctx.parameters, num_epochs=1, batch_size=63)
    b, lb = fit_em(cc, data, store=ctx.parameters, num_epochs=1, batch_size=32)
    np.testing.assert_allclose(np.asarray(a[wslot]), np.asarray(b[wslot]), rtol=1e-6)
    np.testing.assert_allclose(la, lb, rtol=1e-6)


def _gmm_circuit(num_vars, k, rng):
    """K-component mixture of product-of-Gaussians with plain const params."""
    from cirkit_tpu.symbolic import Circuit, GaussianLayer, HadamardLayer, SumLayer
    from cirkit_tpu.utils import Scope

    from tests.fixtures import const_param

    leaves = [
        GaussianLayer(
            Scope([v]), k,
            mean=const_param(rng.normal(size=(k,))),
            stddev=const_param(rng.uniform(0.6, 1.4, size=(k,))),
        )
        for v in range(num_vars)
    ]
    w = rng.uniform(0.1, 1.0, size=(1, k))
    root = SumLayer(k, 1, weight=const_param(w / w.sum()))
    if num_vars == 1:
        return Circuit(leaves + [root], {root: leaves}, [root])
    prod = HadamardLayer(k, arity=num_vars)
    return Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])


def test_gaussian_em_one_step_matches_closed_form_gmm():
    """1-D GMM: one EM step must equal the textbook responsibility-weighted
    updates of weights, means, variances."""
    from scipy.stats import norm

    from cirkit_tpu.parallel.em import gaussian_em_layers
    from tests.reference_eval import eval_parameter

    rng = np.random.default_rng(21)
    sc = _gmm_circuit(1, 2, rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    (i, layer, mean_slot, std_slot) = gaussian_em_layers(cc)[0]
    (wslot,) = em_slots(cc)

    store0 = dict(ctx.parameters)
    mu0 = np.asarray(store0[mean_slot]).reshape(-1)
    sd0 = np.asarray(store0[std_slot]).reshape(-1)
    w0 = np.asarray(store0[wslot]).reshape(-1)

    x = np.random.default_rng(22).normal(size=(64, 1)) * 1.5
    store, losses = fit_em(
        cc, x, store=store0, num_epochs=1, batch_size=64, pseudocount=0.0
    )

    # numpy closed form
    like = np.stack([norm.pdf(x[:, 0], mu0[k], sd0[k]) for k in range(2)])  # (K, B)
    post = (w0[:, None] * like) / (w0[:, None] * like).sum(0, keepdims=True)
    s0 = post.sum(1)
    w_want = s0 / s0.sum()
    mu_want = (post * x[:, 0]).sum(1) / s0
    var_want = (post * (x[:, 0] - mu_want[:, None]) ** 2).sum(1) / s0

    np.testing.assert_allclose(np.asarray(store[wslot]).reshape(-1), w_want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(store[mean_slot]).reshape(-1), mu_want, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(store[std_slot]).reshape(-1), np.sqrt(var_want), rtol=1e-6
    )
    # and full-batch EM keeps improving monotonically
    store2, losses2 = fit_em(cc, x, store=store0, num_epochs=3, batch_size=64)
    assert all(b <= a + 1e-9 for a, b in zip(losses2, losses2[1:])), losses2


def test_gaussian_em_multivariate_monotone():
    """Mixture of product-of-Gaussians over 3 variables: full-batch EM over
    means/stddevs/weights is monotone and fits clustered data."""
    rng = np.random.default_rng(23)
    sc = _gmm_circuit(3, 3, rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    store0 = dict(ctx.parameters)
    data_rng = np.random.default_rng(24)
    centers = data_rng.normal(scale=3.0, size=(3, 3))
    x = centers[data_rng.integers(0, 3, 256)] + data_rng.normal(scale=0.3, size=(256, 3))
    store, losses = fit_em(cc, x, store=store0, num_epochs=6, batch_size=256)
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 0.5, losses


def test_binomial_em_one_step_matches_closed_form():
    """Mixture of Binomial units: one EM step must equal the closed form
    p_k' = sum_b r_bk k_b / (n sum_b r_bk), for both parameterizations."""
    from scipy.stats import binom as sp_binom

    from cirkit_tpu.symbolic import BinomialLayer, Circuit, SumLayer
    from cirkit_tpu.utils import Scope

    from tests.fixtures import const_param

    n = 10
    for kind in ("probs", "logits"):
        rng = np.random.default_rng(25)
        p0 = rng.uniform(0.2, 0.8, size=(2,))
        if kind == "probs":
            leaf = BinomialLayer(Scope([0]), 2, total_count=n, probs=const_param(p0))
        else:
            leaf = BinomialLayer(
                Scope([0]), 2, total_count=n,
                logits=const_param(np.log(p0) - np.log1p(-p0)),
            )
        w0 = np.array([[0.4, 0.6]])
        root = SumLayer(2, 1, weight=const_param(w0))
        sc = Circuit([leaf, root], {root: [leaf]}, [root])
        ctx = PipelineContext(semiring="lse-sum", fold=True)
        cc = ctx.compile(sc)

        x = rng.integers(0, n + 1, size=(48, 1))
        store, _ = fit_em(
            cc, x, store=ctx.parameters, num_epochs=1, batch_size=48, pseudocount=0.0
        )

        like = np.stack([sp_binom.pmf(x[:, 0], n, p0[k]) for k in range(2)])
        post = (w0[0][:, None] * like) / (w0[0][:, None] * like).sum(0, keepdims=True)
        s0 = post.sum(1)
        p_want = (post * x[:, 0]).sum(1) / (n * s0)

        from cirkit_tpu.parallel.em import binomial_em_layers, em_slots as _slots

        (_, _, slot, got_kind) = binomial_em_layers(cc)[0]
        assert got_kind == kind
        got = np.asarray(store[slot]).reshape(-1)
        if kind == "logits":
            got = 1.0 / (1.0 + np.exp(-got))
        np.testing.assert_allclose(got, p_want, rtol=1e-6)
        (wslot,) = _slots(cc)
        np.testing.assert_allclose(
            np.asarray(store[wslot]).reshape(-1), s0 / s0.sum(), rtol=1e-6
        )


@pytest.mark.slow
def test_online_em_improves_and_matches_epoch_on_single_batch():
    """update_every='batch': with one batch per epoch it equals epoch mode;
    with several batches it still drives the NLL down under damping."""
    rng = np.random.default_rng(26)
    sc = _gmm_circuit(2, 3, rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    store0 = dict(ctx.parameters)
    data_rng = np.random.default_rng(27)
    centers = data_rng.normal(scale=2.5, size=(3, 2))
    x = centers[data_rng.integers(0, 3, 192)] + data_rng.normal(scale=0.3, size=(192, 2))

    a, la = fit_em(cc, x, store=store0, num_epochs=2, batch_size=192)
    b, lb = fit_em(cc, x, store=store0, num_epochs=2, batch_size=192, update_every="batch")
    np.testing.assert_allclose(la, lb, rtol=1e-9)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=1e-7)

    _, lo = fit_em(
        cc, x, store=store0, num_epochs=6, batch_size=64,
        update_every="batch", step_size=0.3,
    )
    assert lo[-1] < lo[0] - 0.5, lo

    import pytest as _pytest

    with _pytest.raises(ValueError, match="update_every"):
        fit_em(cc, x, store=store0, update_every="sometimes")


def test_em_through_collapsed_sum_chain_matches_unfused():
    """SumCollapse fuses sum∘sum chains into one layer with a
    MatMul(W1, W2) weight graph; the output stays multilinear in each
    slot's rows, so per-slot flows are exact — fused EM must equal
    unfused EM bit-for-bit given the same store."""
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, HadamardLayer, SumLayer
    from cirkit_tpu.utils import Scope

    from tests.fixtures import const_param, softmax_param

    def build(rng):
        k = 3
        leaves = []
        for v in range(2):
            raw = rng.uniform(0.1, 1.0, size=(k, 4))
            leaves.append(
                CategoricalLayer(
                    Scope([v]), k, num_categories=4, probs=softmax_param(np.log(raw))
                )
            )
        prod = HadamardLayer(k, arity=2)
        mid = SumLayer(k, k, weight=const_param(rng.dirichlet(np.ones(k), size=k)))
        root = SumLayer(k, 1, weight=const_param(rng.dirichlet(np.ones(k), size=1)))
        return Circuit(
            leaves + [prod, mid, root], {prod: leaves, mid: [prod], root: [mid]}, [root]
        )

    data = np.random.default_rng(51).integers(0, 4, size=(64, 2))
    out = {}
    for opt in (False, True):
        sc = build(np.random.default_rng(50))
        ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=opt)
        cc = ctx.compile(sc)
        with pytest.warns(UserWarning, match="none are EM-updatable"):
            store, losses = fit_em(
                cc, data, store=ctx.parameters, num_epochs=3, batch_size=64,
                pseudocount=0.0,
            )
        out[opt] = (store, losses, sorted(em_slots(cc)))
    assert out[True][2] == out[False][2]
    np.testing.assert_allclose(out[True][1], out[False][1], rtol=1e-7)
    for k in out[True][2]:
        np.testing.assert_allclose(
            np.asarray(out[True][0][k]), np.asarray(out[False][0][k]),
            rtol=1e-6, err_msg=k,
        )


@pytest.mark.slow
def test_em_ready_quadgraph_with_collapsed_mixing_chain():
    """A (1, 6, 6) QuadGraph compiles (optimize=True) with a fused
    MatMul(slot, MixingWeight(slot)) sum weight — em_slots must accept it
    and full-batch EM stays monotone (regression: this raised)."""
    sc = image_data(
        (1, 6, 6), "quad-graph", input_layer="categorical",
        num_input_units=4, sum_product_layer="cp", num_sum_units=4,
        em_ready=True,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=9)
    cc = ctx.compile(sc)
    data = np.random.default_rng(52).integers(0, 256, size=(256, 36))
    store, losses = fit_em(cc, data, store=ctx.parameters, num_epochs=4, batch_size=128)
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 1.0, losses


def test_em_ready_image_gaussian_trains_leaves():
    """image_data(..., input_layer='gaussian', em_ready=True): the default
    template becomes fully EM-eligible — plain Dirichlet sum weights AND
    plain mean/stddev leaves — and fit_em moves the leaf parameters."""
    from cirkit_tpu.parallel.em import gaussian_em_layers

    sc = image_data(
        (1, 2, 2), "quad-tree-2", input_layer="gaussian",
        num_input_units=3, sum_product_layer="cp", num_sum_units=3,
        em_ready=True,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=31)
    cc = ctx.compile(sc)
    gauss = gaussian_em_layers(cc)
    assert gauss, "em_ready gaussian leaves must be EM-eligible"
    assert all(v == "sum" for v in em_slots(cc).values())

    rng = np.random.default_rng(32)
    centers = rng.normal(scale=2.0, size=(3, 4))
    x = centers[rng.integers(0, 3, 256)] + rng.normal(scale=0.4, size=(256, 4))
    store0 = dict(ctx.parameters)
    store, losses = fit_em(cc, x, store=store0, num_epochs=5, batch_size=256)
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 0.2, losses
    _, _, mean_slot, std_slot = gauss[0]
    assert not np.allclose(np.asarray(store[mean_slot]), np.asarray(store0[mean_slot]))
    assert not np.allclose(np.asarray(store[std_slot]), np.asarray(store0[std_slot]))
    assert (np.asarray(store[std_slot]) > 0).all()


def test_em_warns_when_leaves_not_updatable():
    """Default (ScaledSigmoid-stddev) Gaussian leaves with plain sum
    weights: fit_em warns that only sum weights train; strict=True raises."""
    sc = image_data(
        (1, 2, 2), "quad-tree-2", input_layer="gaussian",
        num_input_units=2, sum_product_layer="cp", num_sum_units=2,
        sum_weight_param=Parameterization(activation="none", initialization="dirichlet"),
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=33)
    cc = ctx.compile(sc)
    x = np.random.default_rng(34).normal(size=(32, 4))
    with pytest.warns(UserWarning, match="none are EM-updatable"):
        fit_em(cc, x, store=ctx.parameters, num_epochs=1, batch_size=32)
    with pytest.raises(ValueError, match="none are EM-updatable"):
        fit_em(cc, x, store=ctx.parameters, num_epochs=1, batch_size=32, strict=True)


@pytest.mark.slow
def test_em_step_size_schedules():
    """Schedules: a constant callable matches the float; 'robbins-monro'
    parses, decays, and still fits; unknown names raise."""
    rng = np.random.default_rng(35)
    sc = _gmm_circuit(2, 3, rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    store0 = dict(ctx.parameters)
    data_rng = np.random.default_rng(36)
    centers = data_rng.normal(scale=2.5, size=(3, 2))
    x = centers[data_rng.integers(0, 3, 192)] + data_rng.normal(scale=0.3, size=(192, 2))

    a, _ = fit_em(cc, x, store=store0, num_epochs=2, batch_size=64,
                  update_every="batch", step_size=0.4)
    b, _ = fit_em(cc, x, store=store0, num_epochs=2, batch_size=64,
                  update_every="batch", step_size=lambda t: 0.4)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=1e-7)

    _, lo = fit_em(cc, x, store=store0, num_epochs=6, batch_size=64,
                   update_every="batch", step_size="robbins-monro")
    assert lo[-1] < lo[0] - 0.5, lo

    with pytest.raises(ValueError, match="schedule"):
        fit_em(cc, x, store=store0, step_size="linear")


def test_em_ready_tabular_all_leaf_families():
    """tabular_data(..., em_ready=True) injects plain leaf factories into
    every spec that does not fix its parameters."""
    from cirkit_tpu.models import tabular_data
    from cirkit_tpu.parallel.em import binomial_em_layers, gaussian_em_layers

    sc = tabular_data(
        "random-binary-tree",
        num_features=3,
        input_layers=[
            {"name": "categorical", "args": {"num_categories": 5}},
            {"name": "gaussian", "args": {}},
            {"name": "binomial", "args": {"total_count": 6}},
        ],
        num_input_units=3,
        sum_product_layer="cp",
        num_sum_units=3,
        em_ready=True,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=37)
    cc = ctx.compile(sc)
    assert gaussian_em_layers(cc) and binomial_em_layers(cc)
    assert "categorical" in em_slots(cc).values()

    rng = np.random.default_rng(38)
    x = np.stack(
        [
            rng.integers(0, 5, 200).astype(float),
            rng.normal(1.0, 0.5, 200),
            rng.binomial(6, 0.7, 200).astype(float),
        ],
        axis=1,
    )
    _, losses = fit_em(cc, x, store=ctx.parameters, num_epochs=4, batch_size=200)
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:])), losses


def test_heterogeneous_tabular_em_all_leaf_families():
    """One tabular circuit with categorical + Gaussian + binomial leaves:
    fit_em updates all three families (plus the sum weights) in one pass
    and stays monotone."""
    from cirkit_tpu.models import tabular_data
    from cirkit_tpu.models.utils import parameterization_to_factory as ptf
    from cirkit_tpu.parallel.em import binomial_em_layers, gaussian_em_layers

    plain_probs = ptf(Parameterization(activation="none", initialization="dirichlet"))
    plain_mean = ptf(Parameterization(activation="none", initialization="normal"))
    plain_pos = ptf(Parameterization(activation="none", initialization="uniform"))

    sc = tabular_data(
        "random-binary-tree",
        num_features=3,
        input_layers=[
            {"name": "categorical", "args": {"num_categories": 5, "probs_factory": plain_probs}},
            {"name": "gaussian", "args": {"mean_factory": plain_mean, "stddev_factory": plain_pos}},
            {"name": "binomial", "args": {"total_count": 6, "probs_factory": plain_pos}},
        ],
        num_input_units=3,
        sum_product_layer="cp",
        num_sum_units=3,
        sum_weight_param=Parameterization(activation="none", initialization="dirichlet"),
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=29)
    cc = ctx.compile(sc)
    assert gaussian_em_layers(cc) and binomial_em_layers(cc)
    assert "categorical" in em_slots(cc).values()

    rng = np.random.default_rng(30)
    x = np.stack(
        [
            rng.integers(0, 5, 300).astype(float),
            rng.normal(1.0, 0.5, 300),
            rng.binomial(6, 0.7, 300).astype(float),
        ],
        axis=1,
    )
    store, losses = fit_em(cc, x, store=ctx.parameters, num_epochs=5, batch_size=300)
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 0.2, losses


def test_em_missing_one_step_matches_closed_form():
    """EM over incomplete data: missing rows contribute prior-weighted
    expected statistics. One step on a 1-D GMM with NaN rows must equal
    the textbook missing-data EM update."""
    from scipy.stats import norm

    rng = np.random.default_rng(80)
    sc = _gmm_circuit(1, 2, rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    from cirkit_tpu.parallel.em import gaussian_em_layers

    (_, _, mean_slot, std_slot) = gaussian_em_layers(cc)[0]
    (wslot,) = em_slots(cc)
    store0 = dict(ctx.parameters)
    mu0 = np.asarray(store0[mean_slot]).reshape(-1)
    sd0 = np.asarray(store0[std_slot]).reshape(-1)
    w0 = np.asarray(store0[wslot]).reshape(-1)

    x = np.random.default_rng(81).normal(size=(48, 1)) * 1.5
    x[5::7, 0] = np.nan  # MCAR missing rows
    store, _ = fit_em(
        cc, x.astype(np.float32), store=store0, num_epochs=1, batch_size=48,
        pseudocount=0.0, missing="nan",
    )

    obs = ~np.isnan(x[:, 0])
    xo = x[obs, 0].astype(np.float32)
    m_rows = int((~obs).sum())
    like = np.stack([norm.pdf(xo, mu0[k], sd0[k]) for k in range(2)])
    post = (w0[:, None] * like) / (w0[:, None] * like).sum(0, keepdims=True)
    s0 = post.sum(1) + m_rows * w0  # missing rows: prior responsibilities
    w_want = s0 / s0.sum()
    mu_want = ((post * xo).sum(1) + m_rows * w0 * mu0) / s0
    var_want = (
        (post * (xo - mu_want[:, None]) ** 2).sum(1)
        + m_rows * w0 * (sd0**2 + (mu0 - mu_want) ** 2)
    ) / s0

    np.testing.assert_allclose(np.asarray(store[wslot]).reshape(-1), w_want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(store[mean_slot]).reshape(-1), mu_want, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(store[std_slot]).reshape(-1), np.sqrt(var_want), rtol=1e-5
    )


def test_em_missing_monotone_on_entrywise_missing():
    """Entry-wise (not row-wise) missingness across a 3-variable circuit:
    EM on the marginal likelihood stays monotone and fits."""
    rng = np.random.default_rng(82)
    sc = _gmm_circuit(3, 3, rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    data_rng = np.random.default_rng(83)
    centers = data_rng.normal(scale=3.0, size=(3, 3))
    x = centers[data_rng.integers(0, 3, 256)] + data_rng.normal(scale=0.3, size=(256, 3))
    x = x.astype(np.float32)
    x[data_rng.random(x.shape) < 0.3] = np.nan
    store, losses = fit_em(
        cc, x, store=dict(ctx.parameters), num_epochs=6, batch_size=256, missing="nan"
    )
    assert all(b <= a + 1e-6 for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 0.3, losses


def test_fit_missing_first_loss_matches_integrate_query():
    """fit(missing=...): the marginal NLL the step optimizes must equal the
    IntegrateQuery marginal under the same parameters (lr=0 probe)."""
    import jax.numpy as jnp
    import optax

    from cirkit_tpu.backend.jax.queries import IntegrateQuery
    from cirkit_tpu.parallel import fit

    rng = np.random.default_rng(84)
    sc = _gmm_circuit(2, 3, rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    x = np.random.default_rng(85).normal(size=(32, 2)).astype(np.float32)
    miss = np.random.default_rng(86).random(x.shape) < 0.4
    xm = np.where(miss, np.nan, x).astype(np.float32)
    _, losses = fit(
        cc, xm, store=dict(ctx.parameters), num_epochs=1, batch_size=32,
        optimizer=optax.sgd(0.0), missing="nan",
    )
    ll = IntegrateQuery(cc)(
        jnp.asarray(np.nan_to_num(xm)), integrate_vars=jnp.asarray(miss),
        store=ctx.parameters,
    )
    want = -float(jnp.mean(ll))
    np.testing.assert_allclose(losses[0], want, rtol=1e-6)


@pytest.mark.slow
def test_fit_missing_sentinel_categorical_improves():
    """Sentinel-coded missing categorical entries (-1) train on their
    observed margins and improve the marginal NLL."""
    import optax

    from cirkit_tpu.parallel import fit

    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=3)
    cc = _em_ready_image_circuit(ctx)
    rng = np.random.default_rng(87)
    base = rng.integers(0, 256, size=(4, 16))
    data = np.clip(base[rng.integers(0, 4, 512)] + rng.integers(-8, 9, (512, 16)), 0, 255)
    data = np.where(rng.random(data.shape) < 0.25, -1, data).astype(np.int32)
    _, losses = fit(
        cc, data, store=dict(ctx.parameters), num_epochs=4, batch_size=256,
        optimizer=optax.adam(5e-2), missing=-1,
    )
    assert losses[-1] < losses[0] - 1.0, (losses[0], losses[-1])


def test_em_missing_fully_missing_variable_keeps_leaf():
    """A variable missing in EVERY row carries no evidence: its categorical
    leaf must keep its current distribution (regression: zero flows used to
    renormalize to the pseudocount uniform, or NaN at pseudocount=0)."""
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=61)
    cc = _em_ready_image_circuit(ctx)
    rng = np.random.default_rng(62)
    data = rng.integers(0, 256, size=(128, 16)).astype(np.int32)
    data[:, 5] = -1  # variable 5 always missing
    store0 = dict(ctx.parameters)
    store, losses = fit_em(
        cc, data, store=store0, num_epochs=2, batch_size=128,
        missing=-1, pseudocount=0.0,
    )
    assert all(np.isfinite(l) for l in losses), losses
    for k in store:
        assert np.isfinite(np.asarray(store[k])).all(), k
    # the leaf distributions of variable 5 are untouched; find them via the
    # layer whose scope contains 5
    from cirkit_tpu.backend.jax.layers import JaxCategoricalLayer
    from cirkit_tpu.parallel.em import _flow_slot

    hit = 0
    for layer in cc.layers:
        if not isinstance(layer, JaxCategoricalLayer) or layer.probs is None:
            continue
        slot = _flow_slot(layer.probs)
        rows = np.where(layer.scope_idx[:, 0] == 5)[0]
        if slot is None or len(rows) == 0:
            continue
        np.testing.assert_allclose(
            np.asarray(store[slot])[rows], np.asarray(store0[slot])[rows],
            rtol=1e-6,
        )
        hit += 1
    assert hit > 0


def test_missing_accepts_float_nan_sentinel():
    """missing=np.nan (the float spelling) must behave exactly like the
    string form (regression: the equality sentinel path silently produced
    an all-False mask and NaN losses)."""
    rng = np.random.default_rng(63)
    sc = _gmm_circuit(2, 2, rng)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    x = np.random.default_rng(64).normal(size=(32, 2)).astype(np.float32)
    x[::4, 0] = np.nan
    a, la = fit_em(cc, x, store=dict(ctx.parameters), num_epochs=2,
                   batch_size=32, missing="nan")
    b, lb = fit_em(cc, x, store=dict(ctx.parameters), num_epochs=2,
                   batch_size=32, missing=np.nan)
    np.testing.assert_allclose(la, lb, rtol=1e-9)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=1e-9)
    assert all(np.isfinite(l) for l in la), la


def test_fit_em_keeps_frozen_leaf_and_sum_slots_fixed():
    """Frozen (learnable=False ConstantParameter) Gaussian/Binomial leaf
    slots and entirely-frozen sum weights must survive fit_em untouched —
    matching fit()'s learnable_slots contract — and a frozen
    reparameterized sum must be skipped, not raise."""
    import jax.numpy as jnp

    from cirkit_tpu.symbolic import (
        BinomialLayer,
        Circuit,
        GaussianLayer,
        HadamardLayer,
        SumLayer,
    )
    from cirkit_tpu.symbolic.parameters import (
        ConstantParameter,
        Parameter,
        SoftmaxParameter,
        TensorParameter,
    )
    from cirkit_tpu.symbolic.initializers import NormalInitializer
    from cirkit_tpu.utils.scope import Scope
    from tests.fixtures import const_param

    rng = np.random.default_rng(17)
    k = 3

    def frozen(v):
        return Parameter.from_input(ConstantParameter(*np.shape(v), value=np.asarray(v)))

    g = GaussianLayer(
        Scope([0]), k,
        mean=frozen(rng.normal(size=k)),
        stddev=frozen(rng.uniform(0.5, 1.0, size=k)),
    )
    b = BinomialLayer(
        Scope([1]), k, total_count=4, probs=frozen(rng.uniform(0.3, 0.7, size=k))
    )
    prod = HadamardLayer(k, arity=2)
    # frozen softmax-REPARAMETERIZED inner sum: must be skipped, not raise
    theta = Parameter.from_unary(
        SoftmaxParameter((k, k)),
        ConstantParameter(k, k, value=rng.normal(size=(k, k))),
    )
    mid = SumLayer(k, k, weight=theta)
    root = SumLayer(k, 1, weight=const_param(rng.dirichlet(np.ones(k))[None]))
    sc = Circuit(
        [g, b, prod, mid, root],
        {prod: [g, b], mid: [prod], root: [mid]},
        [root],
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    before = {k_: np.asarray(v).copy() for k_, v in ctx.parameters.items()}
    data = np.stack(
        [rng.normal(size=64), rng.integers(0, 5, size=64).astype(float)], axis=1
    )
    store, _ = fit_em(cc, jnp.asarray(data), store=dict(ctx.parameters), num_epochs=2)
    learnable = cc.learnable_slots
    changed = {
        k_ for k_ in before
        if k_ in store and not np.array_equal(before[k_], np.asarray(store[k_]))
    }
    frozen_changed = changed - set(learnable)
    assert not frozen_changed, frozen_changed
    # the learnable root weight DID train
    assert any(k_ in learnable for k_ in changed)


def test_fit_em_sample_weight_matches_replicated_dataset():
    """Weighted EM == EM on the replicated dataset: the E-step flows are
    gradients of sum_i w_i log p(x_i), so integer weights reproduce
    replication exactly (full-batch, step_size=1)."""
    rng = np.random.default_rng(21)
    data = rng.integers(0, 256, size=(6, 16))
    weights = np.array([3, 1, 2, 1, 1, 2], np.float32)
    replicated = np.repeat(data, weights.astype(int), axis=0)  # 10 rows

    def run(d, sw):
        ctx = PipelineContext(semiring="lse-sum", fold=True, seed=9)
        cc = _em_ready_image_circuit(ctx)
        return fit_em(
            cc, d, store=dict(ctx.parameters), num_epochs=3,
            batch_size=len(d), sample_weight=sw,
        )

    store_r, losses_r = run(replicated, None)
    store_w, losses_w = run(data, weights)
    np.testing.assert_allclose(losses_w, losses_r, rtol=1e-9)
    for k in store_r:
        np.testing.assert_allclose(
            np.asarray(store_w[k]), np.asarray(store_r[k]),
            rtol=1e-8, atol=1e-12, err_msg=k,
        )


def test_fit_em_sample_weight_validation():
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = _em_ready_image_circuit(ctx)
    data = np.zeros((8, 16), np.int32)
    with pytest.raises(ValueError, match="entries for"):
        fit_em(cc, data, sample_weight=np.ones(3))
    with pytest.raises(ValueError, match="finite and >= 0"):
        fit_em(cc, data, sample_weight=np.full(8, np.nan))
