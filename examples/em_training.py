"""Train a circuit by expectation-maximization and compare with Adam.

EM is the classic probabilistic-circuit estimator: one backward pass per
batch computes the expected flows of every sum edge, and the M-step sets
the weights to the renormalized flows — no optimizer state, no learning
rate, and full-dataset EM increases the train likelihood monotonically.
The circuit must use *plain* normalized weight tensors
(``Parameterization(activation="none", initialization="dirichlet")``);
Adam instead trains the softmax-parameterized variant. An extension: the
reference has no EM (or any) trainer.

Run: python examples/em_training.py
"""

import math
import os
import time

import numpy as np
import optax

from cirkit_tpu.models import image_data
from cirkit_tpu.models.utils import Parameterization
from cirkit_tpu.parallel import fit, fit_em
from cirkit_tpu.pipeline import PipelineContext


def load_images(side: int, num_synthetic: int = 4096) -> np.ndarray:
    path = os.environ.get("MNIST_NPZ")
    if path and os.path.exists(path) and side == 28:
        with np.load(path) as data:
            return data["x_train"].reshape(-1, side * side).astype(np.int32)
    print("MNIST_NPZ not set; using synthetic images")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(num_synthetic, side, side))
    return (base // 16 * 16).reshape(-1, side * side).astype(np.int32)


def build(side, units, *, plain):
    kwargs = {}
    if plain:
        p = Parameterization(activation="none", initialization="dirichlet")
        kwargs = {"input_params": {"probs": p}, "sum_weight_param": p}
    sc = image_data(
        (1, side, side), "quad-graph", input_layer="categorical",
        num_input_units=units, sum_product_layer="cp", num_sum_units=units,
        **kwargs,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=1)
    return ctx, ctx.compile(sc)


def main() -> None:
    side = int(os.environ.get("SIDE", "28"))
    units = int(os.environ.get("UNITS", "32"))
    num_epochs = int(os.environ.get("EPOCHS", "5"))
    batch_size = int(os.environ.get("BATCH", "256"))
    images = load_images(side)
    split = max(1, int(0.9 * len(images)))
    train_x, test_x = images[:split], images[split:]
    nats2bpd = 1.0 / (side * side * math.log(2.0))

    ctx, cc = build(side, units, plain=True)
    t0 = time.time()
    em_store, em_losses = fit_em(
        cc, train_x, store=ctx.parameters, num_epochs=num_epochs, batch_size=batch_size
    )
    em_s = time.time() - t0
    print("EM    NLL/epoch:", " ".join(f"{l:8.2f}" for l in em_losses))
    assert all(b <= a + 1e-6 for a, b in zip(em_losses, em_losses[1:])), "EM not monotone!"

    # online (per-batch) EM under the Robbins-Monro step-size schedule: one
    # M-step per batch instead of per epoch — on datasets with many batches
    # per epoch it converges in fewer passes than epoch EM
    _, on_losses = fit_em(
        cc, train_x, store=ctx.parameters, num_epochs=num_epochs,
        batch_size=batch_size, update_every="batch", step_size="robbins-monro",
    )
    print("olEM  NLL/epoch:", " ".join(f"{l:8.2f}" for l in on_losses))

    # EM over INCOMPLETE data: hide 25% of the entries (sentinel -1) — the
    # flows of the marginal likelihood are the textbook missing-at-random
    # E-step, so EM stays monotone with no imputation
    miss_x = np.where(
        np.random.default_rng(9).random(train_x.shape) < 0.25, -1, train_x
    ).astype(train_x.dtype)
    _, miss_losses = fit_em(
        cc, miss_x, store=ctx.parameters, num_epochs=num_epochs,
        batch_size=batch_size, missing=-1,
    )
    print("mEM   NLL/epoch:", " ".join(f"{l:8.2f}" for l in miss_losses),
          " (25% entries missing; marginal NLL)")
    if len(train_x) > 2 * batch_size:
        better = sum(o < e for o, e in zip(on_losses[:2], em_losses[:2]))
        print(f"online EM ahead of epoch EM in {better}/2 of the first passes")

    ctx2, cc2 = build(side, units, plain=False)
    t0 = time.time()
    adam_store, adam_losses = fit(
        cc2, train_x, store=ctx2.parameters, num_epochs=num_epochs,
        batch_size=batch_size, optimizer=optax.adam(1e-2),
    )
    adam_s = time.time() - t0
    per_epoch = len(adam_losses) // num_epochs
    means = [
        sum(adam_losses[i * per_epoch : (i + 1) * per_epoch]) / per_epoch
        for i in range(num_epochs)
    ]
    print("Adam  NLL/epoch:", " ".join(f"{l:8.2f}" for l in means))

    from cirkit_tpu.parallel import evaluate_ll

    for name, circuit, store, secs in (
        ("EM", cc, em_store, em_s), ("Adam", cc2, adam_store, adam_s),
    ):
        ll = evaluate_ll(circuit, test_x, store=store)
        print(f"{name:>4}: test bpd {-ll * nats2bpd:6.3f}  ({secs:.1f}s train)")

    # optional figure (PLOTS=1): the three trainers' per-epoch curves
    try:
        from examples._plots import enabled, save_learning_curve
    except ImportError:  # run as `python examples/<name>.py`
        from _plots import enabled, save_learning_curve

    if enabled():
        save_learning_curve(
            "em_vs_adam",
            {
                "epoch EM": em_losses,
                "online EM (Robbins-Monro)": on_losses,
                "Adam": means,
            },
            title="EM vs Adam on the QuadGraph circuit",
        )


if __name__ == "__main__":
    main()
