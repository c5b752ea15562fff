"""Train a class-conditional circuit generatively, discriminatively, or both
(the reference's ``generative-vs-discriminative-circuit.ipynb`` flow, after
the RAT-SPN paper).

One circuit with ``num_classes`` output units models log p(x, y) for every
class head at once; Bayes' rule with a uniform prior turns it into a
classifier: log p(y|x) = log_softmax over the class heads. The combined loss
interpolates the two objectives with a weight ``lambda``:

    L = lambda * L_dis + (1 - lambda) * L_gen / num_pixels

After training, the same circuit classifies images with missing pixels by
marginalizing them out with an :class:`IntegrateQuery` — no retraining and no
recompilation (the mask is a runtime argument).

Uses MNIST if ``MNIST_NPZ`` points at an ``.npz`` with ``x_train``/``y_train``
arrays, synthetic class-structured images otherwise.

Run: python examples/classifier_circuit.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cirkit_tpu.backend.jax.queries import IntegrateQuery
from cirkit_tpu.models import image_data
from cirkit_tpu.parallel.training import split_trainable
from cirkit_tpu.pipeline import PipelineContext

NUM_CLASSES = 10


def load_labeled_images(side: int, num_synthetic: int = 2048):
    path = os.environ.get("MNIST_NPZ")
    if path and os.path.exists(path) and side == 28:
        with np.load(path) as data:
            x = data["x_train"].reshape(-1, side * side).astype(np.int32)
            y = data["y_train"].astype(np.int32)
            return x, y
    print("MNIST_NPZ not set; using synthetic class-structured images")
    rng = np.random.default_rng(0)
    y = rng.integers(0, NUM_CLASSES, size=num_synthetic).astype(np.int32)
    # each class has its own smooth base pattern; add pixel noise
    bases = rng.integers(0, 256, size=(NUM_CLASSES, side * side))
    noise = rng.integers(-24, 25, size=(num_synthetic, side * side))
    x = np.clip(bases[y] + noise, 0, 255).astype(np.int32)
    return x, y


def build_classifier(side: int, units: int):
    symbolic = image_data(
        (1, side, side),
        "quad-graph",
        input_layer="categorical",
        num_input_units=units,
        sum_product_layer="cp",
        num_sum_units=units,
        num_classes=NUM_CLASSES,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    return ctx, ctx.compile(symbolic)


def make_train_step(circuit, optimizer, lam: float, num_pixels: int):
    """A jitted step over the combined objective.

    The circuit's (B, O=1, K=num_classes) output holds log p(x, y=c) per
    class head (up to the uniform prior constant, which cancels in both
    losses' argmin)."""

    def losses_fn(trainable, frozen, batch, labels):
        ll = circuit.evaluate({**trainable, **frozen}, batch)[:, 0, :]  # (B, C)
        picked = jnp.take_along_axis(ll, labels[:, None], axis=1)[:, 0]
        loss_gen = -jnp.mean(picked)
        # uniform p(y): log p(y|x) = log_softmax over class heads
        loss_dis = -jnp.mean(jax.nn.log_softmax(ll, axis=1)[jnp.arange(ll.shape[0]), labels])
        return loss_gen, loss_dis

    def loss_fn(trainable, frozen, batch, labels):
        loss_gen, loss_dis = losses_fn(trainable, frozen, batch, labels)
        return lam * loss_dis + (1.0 - lam) * loss_gen / num_pixels, (loss_gen, loss_dis)

    @jax.jit
    def step(trainable, frozen, opt_state, batch, labels):
        (_, (lg, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, lg, ld

    return step


def train(circuit, store, x, y, *, lam: float, steps: int, batch_size: int):
    optimizer = optax.adam(5e-3)
    trainable, frozen = split_trainable(circuit, store)
    trainable = {k: jnp.array(v) for k, v in trainable.items()}
    opt_state = optimizer.init(trainable)
    step = make_train_step(circuit, optimizer, lam, num_pixels=x.shape[1])
    rng = np.random.default_rng(42)
    lg = ld = float("nan")
    for s in range(steps):
        idx = rng.integers(0, len(x), size=batch_size)
        trainable, opt_state, lg, ld = step(
            trainable, frozen, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx])
        )
    new_store = dict(store)
    new_store.update(trainable)
    print(f"  lambda={lam:.2f}: L_gen={float(lg):8.2f}  L_dis={float(ld):6.3f}")
    return new_store


def accuracy(circuit, store, x, y, batch_size: int = 512) -> float:
    fwd = jax.jit(lambda b: jnp.argmax(circuit.evaluate(store, b)[:, 0, :], axis=1))
    hits = 0
    for i in range(0, len(x), batch_size):
        hits += int(jnp.sum(fwd(jnp.asarray(x[i : i + batch_size])) == y[i : i + batch_size]))
    return hits / len(x)


def masked_accuracy(circuit, store, x, y, missing: float, seed: int = 0) -> float:
    """Classify with ``missing`` fraction of pixels marginalized out per
    sample — one IntegrateQuery call, masks as runtime data."""
    query = IntegrateQuery(circuit)
    rng = np.random.default_rng(seed)
    mask = rng.random((len(x), x.shape[1])) < missing
    ll = query(jnp.asarray(x), integrate_vars=mask, store=store)[:, 0, :]
    preds = np.asarray(jnp.argmax(ll, axis=1))
    return float(np.mean(preds == y))


def main() -> None:
    side = int(os.environ.get("SIDE", "28"))
    units = int(os.environ.get("UNITS", "32"))
    steps = int(os.environ.get("STEPS", "300"))
    batch_size = int(os.environ.get("BATCH", "128"))
    lambdas = [float(s) for s in os.environ.get("LAMBDAS", "0,0.5,1").split(",")]

    x, y = load_labeled_images(side)
    split = max(1, int(0.9 * len(x)))
    x_tr, y_tr, x_te, y_te = x[:split], y[:split], x[split:], y[split:]

    ctx, circuit = build_classifier(side, units)
    print(f"compiled classifier: {circuit.num_parameters():,} parameters, "
          f"{NUM_CLASSES} class heads")

    t0 = time.time()
    stores = {}
    for lam in lambdas:
        stores[lam] = train(
            circuit, dict(ctx.parameters), x_tr, y_tr,
            lam=lam, steps=steps, batch_size=batch_size,
        )
    print(f"trained {len(lambdas)} models in {time.time() - t0:.1f}s")

    for lam, store in stores.items():
        acc = accuracy(circuit, store, x_te, y_te)
        print(f"lambda={lam:.2f}: test accuracy {100 * acc:5.1f}%")

    # circuits are robust to missing inputs: marginalize dropped pixels
    lam = lambdas[0]
    for missing in (0.25, 0.5):
        acc = masked_accuracy(circuit, stores[lam], x_te, y_te, missing)
        print(f"lambda={lam:.2f}, {int(missing * 100)}% pixels missing: "
              f"accuracy {100 * acc:5.1f}% (marginalized, no retraining)")

    # ... or reconstruct them: class-conditional MAP completion — classify
    # from the evidence first (marginalizing the missing pixels), then
    # complete each sample under its PREDICTED class head (the query's
    # output/unit arguments select the root head; one cached program each)
    from cirkit_tpu.backend.jax.queries import MAPQuery

    query = MAPQuery(circuit)
    rng = np.random.default_rng(7)
    n = min(len(x_te), 64)
    mask = rng.random((n, x_te.shape[1])) < 0.5  # True = observed
    xe = jnp.asarray(x_te[:n])
    ll_e = IntegrateQuery(circuit)(xe, integrate_vars=~mask, store=stores[lam])[:, 0, :]
    pred = np.asarray(jnp.argmax(ll_e, axis=1))
    per_head = [
        np.asarray(query(xe, evidence_mask=mask, store=stores[lam], unit=h)[0])
        for h in range(NUM_CLASSES)
    ]
    completed = np.stack(per_head)[pred, np.arange(n)]
    err = np.abs(completed[~mask] - x_te[:n][~mask]).mean()
    print(f"MAP inpainting of the 50% missing pixels under the predicted "
          f"class head: mean abs error {err:.1f}/255")

    # soft imputation: posterior EXPECTED pixels (one backward pass, exact)
    # typically beat the MAP point estimate in mean absolute error
    from cirkit_tpu.backend.jax.queries import ExpectationQuery

    eq = ExpectationQuery(circuit)
    soft_heads = [
        np.asarray(eq(xe, evidence_mask=mask, store=stores[lam], unit=h))
        for h in range(NUM_CLASSES)
    ]
    soft = np.stack(soft_heads)[pred, np.arange(n)]
    err_soft = np.abs(soft[~mask] - x_te[:n][~mask]).mean()
    print(f"posterior-mean inpainting (ExpectationQuery): "
          f"mean abs error {err_soft:.1f}/255")

    # uncertainty-aware imputation: the SAME backward pass also yields the
    # exact posterior variance of each filled pixel — the model's own error
    # bar. Pixels it is confident about should indeed be easier: compare
    # the imputation error on the most- vs least-certain halves.
    _, var0 = eq(
        xe, evidence_mask=mask, store=stores[lam], unit=0, return_variance=True
    )
    sd = np.sqrt(np.asarray(var0))[~mask]
    errs = np.abs(soft_heads[0][~mask] - x_te[:n][~mask])
    lo, hi = sd <= np.median(sd), sd > np.median(sd)
    print(f"posterior stddev splits the error: confident half "
          f"{errs[lo].mean():.1f}/255 vs uncertain half {errs[hi].mean():.1f}/255")

    # optional figure (PLOTS=1): original / evidence / MAP completion grid
    try:
        from examples._plots import enabled, save_image_grid
    except ImportError:  # run as `python examples/<name>.py`
        from _plots import enabled, save_image_grid

    if enabled():
        shown = np.asarray(x_te[:n], dtype=float)
        evidence = np.where(mask[: len(shown)], shown, np.nan)
        save_image_grid(
            "map_inpainting",
            {
                "original": shown,
                "evidence": evidence,
                "MAP": np.asarray(completed, dtype=float),
                "E[x]": np.asarray(soft, dtype=float),
            },
            side,
            title="Inpainting 50% missing pixels: MAP vs posterior mean",
        )


if __name__ == "__main__":
    main()
