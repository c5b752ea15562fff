"""Compare region graphs and sum-product parametrisations on image data
(the reference's ``region-graphs-and-parametrisation.ipynb`` flow).

Sweeps the region-graph structure (random-binary-tree / quad-tree-2 /
quad-graph) against the sum-product layer family (cp / cp-t / tucker),
trains each circuit by MLE for a fixed number of steps, and reports a
bits-per-dimension table — the reference's own benchmark grid
(SURVEY.md §6). Uses MNIST if ``MNIST_NPZ`` is set, synthetic images
otherwise.

Run: python examples/region_graphs_comparison.py
"""

import math
import os
import time

import numpy as np
import optax

from cirkit_tpu.models import image_data
from cirkit_tpu.parallel import fit
from cirkit_tpu.pipeline import PipelineContext


def load_images(side: int, num_synthetic: int = 2048) -> np.ndarray:
    path = os.environ.get("MNIST_NPZ")
    if path and os.path.exists(path) and side == 28:
        with np.load(path) as data:
            return data["x_train"].reshape(-1, side * side).astype(np.int32)
    print("MNIST_NPZ not set; using synthetic images")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(num_synthetic, side, side))
    return (base // 16 * 16).reshape(-1, side * side).astype(np.int32)


def main() -> None:
    side = int(os.environ.get("SIDE", "28"))
    units = int(os.environ.get("UNITS", "32"))
    num_epochs = int(os.environ.get("EPOCHS", "2"))
    batch_size = int(os.environ.get("BATCH", "256"))
    region_graphs = os.environ.get(
        "REGION_GRAPHS", "random-binary-tree,quad-tree-2,quad-graph"
    ).split(",")
    layers = os.environ.get("LAYERS", "cp,cp-t,tucker").split(",")

    images = load_images(side)
    split = max(1, int(0.9 * len(images)))
    train_x, test_x = images[:split], images[split:]
    num_pixels = side * side

    results: dict[tuple[str, str], tuple[float, float, int]] = {}
    for rg_name in region_graphs:
        for layer in layers:
            symbolic = image_data(
                (1, side, side),
                rg_name,
                input_layer="categorical",
                num_input_units=units,
                sum_product_layer=layer,
                num_sum_units=units,
            )
            ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=1)
            circuit = ctx.compile(symbolic)
            num_params = circuit.num_parameters()
            t0 = time.time()
            store, losses = fit(
                circuit,
                train_x,
                store=ctx.parameters,
                num_epochs=num_epochs,
                batch_size=batch_size,
                optimizer=optax.adam(1e-2),
            )
            from cirkit_tpu.parallel import evaluate_ll

            avg_ll = evaluate_ll(circuit, test_x, store=store)
            bpd = -avg_ll / (num_pixels * math.log(2.0))
            results[(rg_name, layer)] = (avg_ll, bpd, num_params)
            print(
                f"{rg_name:>18} + {layer:<6} {num_params:>12,} params  "
                f"test LL {avg_ll:9.2f}  bpd {bpd:6.3f}  ({time.time() - t0:.1f}s)"
            )

    best = min(results, key=lambda k: results[k][1])
    print(f"\nbest: {best[0]} + {best[1]} at {results[best][1]:.3f} bpd")


if __name__ == "__main__":
    main()
