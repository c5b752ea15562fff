"""Learn a quadrature probabilistic circuit (the reference's
``learning-a-circuit-with-pic.ipynb`` flow).

Compiles a QuadGraph Tucker circuit, converts it to a QPC with pc2qpc —
its parameters become the outputs of small Fourier-feature integral
networks evaluated at quadrature points — and trains those networks by
maximum likelihood. The converted circuit stays exactly normalized
(log Z == 0) throughout training by construction.

Run: python examples/learning_a_qpc.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cirkit_tpu.backend.jax.pic import pc2qpc
from cirkit_tpu.backend.jax.queries import IntegrateQuery
from cirkit_tpu.models import image_data
from cirkit_tpu.pipeline import PipelineContext


def main() -> None:
    side = int(os.environ.get("SIDE", "8"))
    units = int(os.environ.get("UNITS", "16"))
    num_steps = int(os.environ.get("STEPS", "50"))
    sc = image_data(
        (1, side, side),
        "quad-graph",
        input_layer="categorical",
        num_input_units=units,
        sum_product_layer="tucker",
        num_sum_units=units,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    qpc, qparams = pc2qpc(
        cc,
        ctx.parameters,
        integration_method="leggauss",
        key=jax.random.PRNGKey(42),
        net_dim=64,
    )
    n_net = sum(int(np.prod(p.shape)) for g in qparams.net_params.values() for p in g.values())
    print(f"QPC: {n_net:,} integral-network parameters replace "
          f"{cc.num_parameters():,} circuit parameters")

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(256, side * side))
    )
    opt = optax.adam(5e-3)
    opt_state = opt.init(qparams.net_params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            return -jnp.mean(qpc.evaluate(qparams.materialize(p), x)[:, 0, 0])

        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    params = qparams.net_params
    t0 = time.time()
    for i in range(num_steps):
        params, opt_state, loss = step(params, opt_state)
        if i % 10 == 0:
            print(f"step {i:3d}  nll {float(loss):10.3f}")
    print(f"{num_steps} steps in {time.time() - t0:.1f}s")

    z = IntegrateQuery(qpc)(
        jnp.zeros((1, side * side)), integrate_vars=qpc.scope,
        store=qparams.materialize(params),
    )
    print(f"log Z after training: {float(z[0, 0, 0]):.2e} (exactly normalized)")


if __name__ == "__main__":
    main()
