"""Learn a probabilistic circuit by maximum likelihood (the reference's
``learning-a-circuit.ipynb`` flow).

Builds the north-star configuration — a QuadGraph region graph over 28x28
images with CP sum-product layers and K=64 units — compiles it folded and
optimized under the log semiring, and trains it data-parallel over every
local device. Uses MNIST if ``MNIST_NPZ`` points at an ``.npz`` with an
``x_train`` array, synthetic images otherwise.

Run: python examples/learning_a_circuit.py
"""

import math
import os
import time

import numpy as np

from cirkit_tpu.models import image_data
from cirkit_tpu.parallel import fit
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.utils.checkpoint import save_store


def load_images(side: int, num_synthetic: int = 4096) -> np.ndarray:
    path = os.environ.get("MNIST_NPZ")
    if path and os.path.exists(path) and side == 28:
        with np.load(path) as data:
            return data["x_train"].reshape(-1, 784).astype(np.int64)
    print("MNIST_NPZ not set; using synthetic images")
    rng = np.random.default_rng(0)
    # smooth-ish synthetic images so training has structure to find
    base = rng.integers(0, 256, size=(num_synthetic, side, side))
    return (base // 16 * 16).reshape(-1, side * side).astype(np.int64)


def main() -> None:
    side = int(os.environ.get("SIDE", "28"))
    units = int(os.environ.get("UNITS", "64"))
    num_epochs = int(os.environ.get("EPOCHS", "5"))
    symbolic = image_data(
        (1, side, side),
        "quad-graph",
        input_layer="categorical",
        num_input_units=units,
        sum_product_layer="cp",
        num_sum_units=units,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    circuit = ctx.compile(symbolic)
    print(f"compiled: {circuit.num_parameters():,} parameters")

    images = load_images(side)
    t0 = time.time()
    import optax

    store, losses = fit(
        circuit,
        images,
        store=ctx.parameters,
        batch_size=256,
        num_epochs=num_epochs,
        optimizer=optax.adam(0.01),
    )
    print(f"trained in {time.time() - t0:.1f}s; loss {losses[0]:.2f} -> {losses[-1]:.2f}")
    bpd = losses[-1] / (side * side * math.log(2.0))
    print(f"train bits-per-dimension: {bpd:.3f}")

    ctx.update_parameters(store)
    ckpt = os.environ.get("CKPT", "circuit_ckpt.npz")
    save_store(ckpt, dict(store))
    print(f"checkpoint saved to {ckpt}")

    # optional figures (PLOTS=1): learning curve + unconditional samples
    try:
        from examples._plots import enabled, save_image_grid, save_learning_curve
    except ImportError:  # run as `python examples/<name>.py`
        from _plots import enabled, save_image_grid, save_learning_curve

    if enabled():
        import jax

        from cirkit_tpu.backend.jax.queries import SamplingQuery

        per_epoch = max(1, len(losses) // num_epochs)
        epoch_means = [
            sum(losses[i * per_epoch : (i + 1) * per_epoch]) / per_epoch
            for i in range(num_epochs)
        ]
        save_learning_curve(
            "learning_curve",
            {"Adam (CP, K=%d)" % units: epoch_means},
            title="MLE training on the QuadGraph circuit",
        )
        samples, _ = SamplingQuery(circuit)(
            8, key=jax.random.PRNGKey(0), store=store
        )
        save_image_grid(
            "samples",
            {"samples": np.asarray(samples)},
            side,
            title="Unconditional samples from the trained circuit",
        )


if __name__ == "__main__":
    main()
