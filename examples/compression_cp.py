"""Compress a dense tensor with a CP factorization circuit (the
reference's ``compression-cp-factorization`` flow).

A rank-R CP decomposition is a circuit: per-axis Embedding factors, a
Hadamard product, and a weighted sum. Fitting the circuit's output to the
tensor entries by least squares *is* CP tensor compression — entirely
through the circuit API.

Run: python examples/compression_cp.py
"""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cirkit_tpu.models import cp
from cirkit_tpu.pipeline import PipelineContext


def main() -> None:
    shape, rank = (8, 9, 10), 6
    rng = np.random.default_rng(0)
    # a ground-truth low-rank tensor plus noise
    fs = [rng.normal(size=(rank, d)) for d in shape]
    target = np.einsum("ra,rb,rc->abc", *fs) + 0.01 * rng.normal(size=shape)

    sc = cp(shape, rank)
    ctx = PipelineContext(semiring="sum-product", fold=True)
    circuit = ctx.compile(sc)

    entries = jnp.asarray(
        np.array(list(itertools.product(*(range(d) for d in shape))), dtype=np.int32)
    )
    values = jnp.asarray(target.ravel(), jnp.float32)

    from cirkit_tpu.parallel.training import split_trainable

    trainable, frozen = split_trainable(circuit, ctx.parameters)
    opt = optax.adam(5e-2)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(tr, opt_state):
        def loss(tr):
            pred = circuit.evaluate({**tr, **frozen}, entries)[:, 0, 0]
            return jnp.mean((pred - values) ** 2)

        l, g = jax.value_and_grad(loss)(tr)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(tr, updates), opt_state, l

    for i in range(int(os.environ.get("STEPS", "600"))):
        trainable, opt_state, mse = step(trainable, opt_state)
    rel = float(jnp.sqrt(mse)) / float(np.abs(target).mean())
    n_full = int(np.prod(shape))
    n_cp = rank * (sum(shape) + 1)
    print(f"rank-{rank} CP: {n_full} entries -> {n_cp} parameters "
          f"({n_full / n_cp:.1f}x compression), rel RMSE {rel:.4f}")
    assert rel < 0.1


if __name__ == "__main__":
    main()
