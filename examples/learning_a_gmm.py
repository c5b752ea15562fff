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


def synthetic_clusters(n: int = 3000) -> np.ndarray:
    rng = np.random.default_rng(0)
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


if __name__ == "__main__":
    main()
