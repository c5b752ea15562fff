"""Distill a trained circuit into its KL-optimal Chow-Liu tree.

An extension beyond the reference (whose Chow-Liu algorithm only
*initializes* structure from data): ``distill_tree`` reads the exact
pairwise mutual-information matrix and the exact conditionals
p(x_v | x_pa) off the trained model and assembles the maximum-MI spanning
tree — by the Chow-Liu theorem, the best tree approximation of the
circuit distribution in KL. The surrogate is tiny, deterministic (exact
entropy and MAP), grows the model's dependence skeleton as readable
edges, and its conditional tables are plain learnable constants, so a few
EM epochs on data close most of the remaining gap. The same grow/prune/
distill trio covers the model-surgery spectrum: grow for capacity, prune
for within-family compression, distill for cross-family compression.

Run: python examples/model_distillation.py
"""

import os

import numpy as np

from cirkit_tpu.backend.jax import (
    EntropyQuery,
    distill_tree,
    is_deterministic,
    mutual_information,
)
from cirkit_tpu.models import tabular_data
from cirkit_tpu.parallel import evaluate_ll, fit_em
from cirkit_tpu.pipeline import PipelineContext


def main() -> None:
    import jax.numpy as jnp

    side = int(os.environ.get("SIDE", "4"))
    units = int(os.environ.get("UNITS", "8"))
    epochs = int(os.environ.get("EPOCHS", "8"))
    num_vars = side * side

    # synthetic rows: a left-to-right Markov scan with 15% noise, so
    # the true dependence skeleton is a chain the distillation should find
    rng = np.random.default_rng(7)
    n = 1024
    data = np.zeros((n, num_vars), dtype=np.int32)
    data[:, 0] = rng.integers(0, 8, size=n)
    for v in range(1, num_vars):
        keep = rng.random(n) >= 0.15
        data[:, v] = np.where(keep, data[:, v - 1], rng.integers(0, 8, size=n))
    train, test = data[: 3 * n // 4], data[3 * n // 4 :]

    # the source structure is itself data-learned (Chow-Liu region graph),
    # with latent mixtures on top — richer than any single tree
    sc = tabular_data(
        "chow-liu-tree",
        data=train,
        input_layers={"name": "categorical", "args": {"num_categories": 8}},
        num_input_units=units, sum_product_layer="tucker", num_sum_units=units,
        em_ready=True,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=29)
    cc = ctx.compile(sc)

    store, losses = fit_em(cc, train, store=ctx.parameters, num_epochs=epochs,
                           batch_size=128)
    ctx.parameters.update(store)
    ll_src = evaluate_ll(cc, test, store=store) / num_vars
    print(f"source circuit: NLL {losses[0]:.1f} -> {losses[-1]:.1f}, "
          f"held-out LL/var {ll_src:.4f}")

    # the model's exact MI matrix: the chain shows up as a strong
    # first off-diagonal (neighboring pixels in scan order)
    mi = np.asarray(mutual_information(cc, store=store))
    band = np.array([mi[v, v + 1] for v in range(num_vars - 1)])
    rest = mi[np.triu_indices(num_vars, k=2)]
    print(f"model MI: scan-neighbor mean {band.mean():.3f} nats vs "
          f"non-neighbor mean {rest.mean():.3f}")

    tree, report = distill_tree(cc, store=store)
    chain_edges = sum(1 for u, v in report["edges"] if abs(u - v) == 1)
    print(f"distilled tree: {len(report['edges'])} edges, "
          f"{chain_edges} on the true chain; MI captured "
          f"{report['mi_objective']:.3f} nats")

    ctx2 = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc2 = ctx2.compile(tree)
    ll_tree = evaluate_ll(cc2, test, store=ctx2.parameters) / num_vars
    n_src = cc.num_parameters(store, learnable_only=True)
    n_tree = cc2.num_parameters(ctx2.parameters, learnable_only=True)
    print(f"tree surrogate: held-out LL/var {ll_tree:.4f} "
          f"({n_src} -> {n_tree} learnable parameters)")

    # deterministic: entropy is exact, not a bound
    assert is_deterministic(tree, ctx=ctx2)
    h = float(EntropyQuery(cc2)(store=ctx2.parameters)[0, 0])
    print(f"exact model entropy of the tree: {h:.3f} nats "
          f"(max {num_vars * np.log(8):.3f})")

    # EM fine-tune the conditionals on data (indicator leaves stay frozen)
    s2, _ = fit_em(cc2, train, store=dict(ctx2.parameters), num_epochs=5,
                   batch_size=128)
    ll_ft = evaluate_ll(cc2, test, store=s2) / num_vars
    print(f"after 5 EM epochs on data: LL/var {ll_ft:.4f} "
          f"(source {ll_src:.4f})")


if __name__ == "__main__":
    main()
