"""Weighted model counting with logic circuits.

Builds the boolean formula (x0 AND x1) OR (NOT x0 AND x2) as a logic
circuit, smooths and compiles it, and computes its model count and a
weighted model count — the compiled analogue of knowledge-compilation WMC
(the reference covers this via ``templates/logic``; an ``.sdd`` file can be
loaded with ``cirkit_tpu.models.logic.SDD.load``).

Run: python examples/logic_wmc.py
"""

import itertools

import numpy as np

from cirkit_tpu.models.logic import (
    ConjunctionNode,
    DisjunctionNode,
    LiteralNode,
    LogicalCircuit,
    NegatedLiteralNode,
)
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic.initializers import ConstantTensorInitializer
from cirkit_tpu.symbolic.layers import CategoricalLayer
from cirkit_tpu.symbolic.parameters import Parameter, TensorParameter
from cirkit_tpu.utils.scope import Scope


def formula() -> LogicalCircuit:
    x0, x1, x2, nx0 = LiteralNode(0), LiteralNode(1), LiteralNode(2), NegatedLiteralNode(0)
    c1, c2, root = ConjunctionNode(), ConjunctionNode(), DisjunctionNode()
    return LogicalCircuit(
        [x0, x1, x2, nx0, c1, c2, root],
        {c1: [x0, x1], c2: [nx0, x2], root: [c1, c2]},
        [root],
    )


def weighted_literal(weights):
    def factory(negated):
        def build(scope: Scope, num_units: int):
            (var,) = tuple(scope)
            w = weights[var, 0 if negated else 1]
            with np.errstate(divide="ignore"):
                logits = np.log([w, 0.0] if negated else [0.0, w])
            return CategoricalLayer(
                scope, num_units, num_categories=2,
                logits=Parameter.from_input(TensorParameter(
                    1, 2, initializer=ConstantTensorInitializer(np.asarray(logits)),
                    learnable=False)),
            )
        return build
    return factory(False), factory(True)


def main() -> None:
    ctx = PipelineContext(semiring="lse-sum", fold=True)

    # unweighted model count
    cc = ctx.compile(formula().build_circuit())
    worlds = np.array(list(itertools.product([0, 1], repeat=3)))
    outs = np.exp(np.asarray(cc(worlds))[:, 0, 0])
    print("truth table:", dict(zip(map(tuple, worlds.tolist()), outs.round(0))))
    mc = np.exp(np.asarray(ctx.integrate(cc)(ctx.parameters, worlds[:1]))[0, 0, 0])
    print(f"model count: {mc:.0f}")

    # weighted model count
    weights = np.random.default_rng(0).uniform(0.1, 1.0, size=(3, 2))
    lit, nlit = weighted_literal(weights)
    wcc = ctx.compile(
        formula().build_circuit(literal_input_factory=lit, negated_literal_input_factory=nlit)
    )
    wmc = np.exp(np.asarray(ctx.integrate(wcc)(ctx.parameters, worlds[:1]))[0, 0, 0])
    print(f"weighted model count: {wmc:.6f}")

    # logic circuits compile deterministic, so MAPQuery is exact: the
    # highest-weight satisfying assignment (weighted MaxSAT by compilation)
    from cirkit_tpu.backend.jax.queries import MAPQuery

    asg, logw = MAPQuery(wcc)(store=ctx.parameters)
    print(
        f"most probable model: {np.asarray(asg[0]).astype(int).tolist()} "
        f"(weight {np.exp(float(logw[0])):.6f})"
    )

    # ... and EntropyQuery is exact too: the entropy of the (weighted)
    # model distribution. Unweighted literals give the uniform distribution
    # over models, so H = log(model count)
    from cirkit_tpu.backend.jax.entropy import EntropyQuery

    h_uniform = float(EntropyQuery(cc)(store=ctx.parameters)[0, 0])
    h_weighted = float(EntropyQuery(wcc)(store=ctx.parameters)[0, 0])
    print(
        f"model-distribution entropy: uniform {h_uniform:.6f} nats "
        f"(= log {np.exp(h_uniform):.0f} models), weighted {h_weighted:.6f} nats"
    )

    # PSDDs — parameterized SDDs (UCLA / Juice.jl interop) — load as
    # normalized distributions; sampling/MAP/entropy on them are exact
    import math
    import tempfile

    from cirkit_tpu.models.logic import PSDD

    psdd_text = (
        "c p(x1) mixture over two Bernoulli branches\n"
        "psdd 7\n"
        "L 0 0 1\nL 1 0 -1\n"
        f"T 2 1 2 {math.log(0.3)}\nT 3 1 2 {math.log(0.9)}\n"
        f"T 4 2 3 {math.log(0.8)}\n"
        f"D 5 3 2 0 2 {math.log(0.6)} 1 3 {math.log(0.4)}\n"
        "D 6 4 1 5 4 0.0\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".psdd", delete=False) as fh:
        fh.write(psdd_text)
    pcc = ctx.compile(PSDD.load(fh.name).build_circuit())
    p = np.exp(np.asarray(pcc(worlds))[:, 0, 0])
    print(f"PSDD distribution sums to {p.sum():.6f}; p(1,0,1) = {p[5]:.4f}")


if __name__ == "__main__":
    main()
