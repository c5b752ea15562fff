"""Fuse independently-trained overlapping models into one circuit.

Two "sensors" each model a WINDOW of the variables — A sees x0..x2, B sees
x2..x4 — and train independently on their own columns. Because the windows
share x2, the partial-overlap product ``A * B`` (an extension: the torch
reference multiplies same-scope circuits only, ref
``symbolic/functional.py:295-296``) composes them into one unnormalized
joint over ALL five variables, through which evidence on x0 now informs
x4 — a chain-graph fusion no single sensor can answer. Everything after
the product is ordinary circuit machinery: ``integrate`` renormalizes,
``ExpectationQuery.marginals`` reads fused posteriors, ``MAPQuery``
completes evidence.

At the default tiny sizes the fused joint is also pinned against the
brute-force product over all S^5 worlds.

Run: python examples/model_fusion.py
"""

import os

import numpy as np

from cirkit_tpu.models.utils import Parameterization, parameterization_to_factory
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic.circuit import Circuit
from cirkit_tpu.symbolic.layers import CategoricalLayer, HadamardLayer, SumLayer
from cirkit_tpu.utils.scope import Scope

S = 4  # categorical states per variable


def window_pc(vars_, num_units: int) -> Circuit:
    """A left-deep chain circuit over ``vars_`` (absolute variable ids)."""
    softmax = parameterization_to_factory(Parameterization(activation="softmax"))
    layers, in_layers = [], {}

    def add(layer, children=()):
        layers.append(layer)
        if children:
            in_layers[layer] = list(children)
        return layer

    cur = add(CategoricalLayer(Scope([vars_[0]]), num_units, num_categories=S))
    for v in vars_[1:]:
        # default parameterization: learnable softmax-normalized probs
        leaf = add(CategoricalLayer(Scope([v]), num_units, num_categories=S))
        prod = add(HadamardLayer(num_units, arity=2), [cur, leaf])
        cur = add(SumLayer(num_units, num_units, weight_factory=softmax), [prod])
    root = add(SumLayer(num_units, 1, weight_factory=softmax), [cur])
    return Circuit(layers, in_layers, [root])


def synthetic_chain(n: int, seed: int = 0) -> np.ndarray:
    """A 5-variable Markov chain: each variable copies its predecessor with
    probability 0.75, so information genuinely flows x0 -> x4."""
    rng = np.random.default_rng(seed)
    x = np.zeros((n, 5), dtype=np.int64)
    x[:, 0] = rng.integers(0, S, size=n)
    for v in range(1, 5):
        stay = rng.random(n) < 0.75
        x[:, v] = np.where(stay, x[:, v - 1], rng.integers(0, S, size=n))
    return x


def main() -> None:
    import optax

    from cirkit_tpu.backend.jax.queries import ExpectationQuery, MAPQuery
    from cirkit_tpu.parallel import fit

    units = int(os.environ.get("UNITS", "6"))
    epochs = int(os.environ.get("EPOCHS", "20"))
    samples = int(os.environ.get("SAMPLES", "4000"))

    data = synthetic_chain(samples)
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)

    # each sensor trains on the SAME rows but reads only its own window
    # (input layers gather their scope columns; the other columns are
    # invisible to the circuit)
    sensors = {}
    for name, vars_ in (("A", (0, 1, 2)), ("B", (2, 3, 4))):
        cc = ctx.compile(window_pc(vars_, units))
        store, losses = fit(
            cc, data, store=ctx.parameters, batch_size=512,
            num_epochs=epochs, optimizer=optax.adam(5e-2),
        )
        ctx.update_parameters(store)
        sensors[name] = cc
        print(f"sensor {name} over x{vars_[0]}..x{vars_[-1]}: "
              f"NLL {losses[0]:.3f} -> {losses[-1]:.3f}")

    # fuse: an unnormalized product expert over the union scope
    fused = ctx.multiply(sensors["A"], sensors["B"])
    store = ctx.parameters
    log_z = float(np.asarray(
        ctx.integrate(fused)(store, np.zeros((1, 5), np.int64))
    )[0, 0, 0])
    print(f"fused p(x0..x4) = A * B / Z,  log Z = {log_z:.4f}")

    # evidence on x0 reaches x4 only through the fusion
    x = np.zeros((S, 5), dtype=np.int64)
    x[:, 0] = np.arange(S)
    mask = np.zeros((S, 5), dtype=bool)
    mask[:, 0] = True
    marg = np.asarray(
        ExpectationQuery(fused).marginals(x, evidence_mask=mask, store=store)
    )
    solo = np.asarray(
        ExpectationQuery(sensors["B"]).marginals(
            x, evidence_mask=np.zeros_like(mask), store=store
        )
    )
    print("p(x4 = s | x0 = s):  fused",
          np.round(marg[np.arange(S), 4, np.arange(S)], 3),
          " sensor B alone", np.round(solo[np.arange(S), 4, np.arange(S)], 3))

    # MAP completion under evidence on x0: the fused mode tracks the chain
    asg, _ = MAPQuery(fused)(x, evidence_mask=mask, store=store)
    print("fused MAP completions given x0:", np.asarray(asg).astype(int).tolist())

    # pin the fused joint against brute force at small sizes
    if S ** 5 <= 4096:
        import itertools

        worlds = np.array(list(itertools.product(range(S), repeat=5)), np.int64)
        va = np.exp(np.asarray(sensors["A"](worlds))[:, 0, 0])
        vb = np.exp(np.asarray(sensors["B"](worlds))[:, 0, 0])
        vf = np.exp(np.asarray(fused(store, worlds))[:, 0, 0])
        err = float(np.abs(vf - va * vb).max())
        print(f"fused joint vs brute-force product: max abs err {err:.2e}")
        assert err < 1e-6 * float(va.max() * vb.max() + 1)


if __name__ == "__main__":
    main()
