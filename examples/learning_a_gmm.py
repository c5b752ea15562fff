"""Learn a Gaussian mixture model as a probabilistic circuit (the
reference's ``learning-a-gaussian-mixture-model`` flow).

A GMM over 2D data is the smallest interesting circuit: one Gaussian input
layer per variable, a Hadamard product, and a softmax-weighted mixing sum.
Trains by MLE on synthetic three-cluster data and reports per-cluster
responsibility via marginal queries.

Run: python examples/learning_a_gmm.py
"""

import os

import numpy as np

from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic.circuit import Circuit
from cirkit_tpu.symbolic.layers import GaussianLayer, HadamardLayer, SumLayer
from cirkit_tpu.models.utils import Parameterization, parameterization_to_factory
from cirkit_tpu.utils.scope import Scope


def gmm_circuit(num_components: int = 8) -> Circuit:
    softmax = parameterization_to_factory(Parameterization(activation="softmax"))
    g0 = GaussianLayer(Scope([0]), num_components)
    g1 = GaussianLayer(Scope([1]), num_components)
    prod = HadamardLayer(num_components, arity=2)
    mix = SumLayer(num_components, 1, weight_factory=softmax)
    return Circuit([g0, g1, prod, mix], {prod: [g0, g1], mix: [prod]}, [mix])


def synthetic_clusters(n: int = 3000, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = np.array([[-2.0, 0.0], [2.0, 1.5], [0.5, -2.5]])
    idx = rng.integers(0, len(centers), size=n)
    return (centers[idx] + 0.4 * rng.normal(size=(n, 2))).astype(np.float32)


def main() -> None:
    import optax

    from cirkit_tpu.parallel import fit

    ctx = PipelineContext(semiring="lse-sum", fold=True)
    circuit = ctx.compile(gmm_circuit())
    data = synthetic_clusters()
    store, losses = fit(
        circuit,
        data,
        store=ctx.parameters,
        batch_size=256,
        num_epochs=int(os.environ.get("EPOCHS", "60")),
        optimizer=optax.adam(5e-2),
    )
    ctx.update_parameters(store)
    print(f"avg NLL: {losses[0]:.3f} -> {losses[-1]:.3f}")

    # held-out log-density at the cluster centers vs far away
    probe = np.array([[-2.0, 0.0], [2.0, 1.5], [0.5, -2.5], [6.0, 6.0]], np.float32)
    ll = np.asarray(circuit(probe))[:, 0, 0]
    print("log p at centers:", ll[:3].round(2), " far away:", round(float(ll[3]), 2))
    assert ll[:3].min() > ll[3] + 3.0, "centers should be far likelier"

    # the same GMM by EM (plain dirichlet weights + plain Gaussian leaves):
    # closed-form responsibility updates, no learning rate, monotone NLL
    from cirkit_tpu.parallel import fit_em
    from cirkit_tpu.symbolic.initializers import DirichletInitializer
    from cirkit_tpu.models.utils import parameterization_to_factory as ptf

    dirichlet = ptf(Parameterization(activation="none", initialization="dirichlet"))
    normal = ptf(Parameterization(activation="none", initialization="normal"))
    spread = ptf(Parameterization(activation="none", initialization="uniform"))
    k = 8
    # plain mean/stddev slots make the Gaussian leaves EM-updatable
    g0 = GaussianLayer(Scope([0]), k, mean_factory=normal, stddev_factory=spread)
    g1 = GaussianLayer(Scope([1]), k, mean_factory=normal, stddev_factory=spread)
    prod = HadamardLayer(k, arity=2)
    mix = SumLayer(k, 1, weight_factory=dirichlet)
    ctx2 = PipelineContext(semiring="lse-sum", fold=True, seed=5)
    em_circuit = ctx2.compile(
        Circuit([g0, g1, prod, mix], {prod: [g0, g1], mix: [prod]}, [mix])
    )
    em_store, em_losses = fit_em(
        em_circuit, data, store=ctx2.parameters,
        num_epochs=max(4, int(os.environ.get("EPOCHS", "60")) // 3), batch_size=512,
    )
    print(f"EM  NLL: {em_losses[0]:.3f} -> {em_losses[-1]:.3f} (monotone)")
    assert all(b <= a + 1e-6 for a, b in zip(em_losses, em_losses[1:]))

    # model criticism via the posterior-CDF query: probability integral
    # transform — if the model is calibrated, u = F(x_1 | x_0) over
    # held-out samples is Uniform(0, 1). The Kolmogorov-Smirnov distance
    # quantifies it (an extension: the reference has no CDF queries)
    import jax.numpy as jnp

    from cirkit_tpu.backend.jax import ExpectationQuery

    em_ctx_params = dict(ctx2.parameters)
    em_ctx_params.update(em_store)
    test = synthetic_clusters(seed=9)[:512]
    eq = ExpectationQuery(em_circuit)
    mask = np.zeros_like(test, bool)
    mask[:, 0] = True  # condition on x_0, check the conditional of x_1
    u = np.asarray(
        eq.cdf(jnp.asarray(test), t=jnp.asarray(test),
               evidence_mask=jnp.asarray(mask), store=em_ctx_params)
    )[:, 1]
    grid = np.sort(u)
    ks = np.abs(grid - (np.arange(1, len(u) + 1) / len(u))).max()
    print(f"PIT calibration: KS(u, Uniform) = {ks:.3f} "
          f"(~{1.36 / np.sqrt(len(u)):.3f} is the 5% band)")


if __name__ == "__main__":
    main()
