"""Train -> prune -> fine-tune: structural compression of a circuit.

An extension beyond the reference (which has no post-training
compression): ``prune_circuit`` scores units by a root-to-leaf
max-product importance flow over the TRAINED weights, drops the
unimportant ones under the circuit's structural constraints, and rebuilds
a smaller symbolic circuit carrying the trained values — plain learnable
constants, so EM fine-tuning applies directly. On this synthetic task the
circuit pruned to ~30% of its units recovers the full model's likelihood
after a few EM epochs.

The initial training runs with ``checkpoint_every``/``resume``: kill the
script mid-train and rerun it — EM resumes from the last epoch checkpoint
instead of restarting.

Run: python examples/prune_finetune.py
"""

import os
import tempfile

import numpy as np

from cirkit_tpu.backend.jax import prune_circuit
from cirkit_tpu.models import image_data
from cirkit_tpu.parallel import fit_em
from cirkit_tpu.pipeline import PipelineContext


def main() -> None:
    import jax.numpy as jnp

    sc = image_data(
        (1, 4, 4), "quad-tree-2", input_layer="categorical",
        num_input_units=8, sum_product_layer="tucker", num_sum_units=8,
        em_ready=True,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=23)
    cc = ctx.compile(sc)

    # synthetic "images": two cluster prototypes + noise over 8 states
    rng = np.random.default_rng(3)
    protos = rng.integers(0, 8, size=(2, 16))
    labels = rng.integers(0, 2, size=512)
    data = protos[labels]
    noise = rng.random(data.shape) < 0.3
    data = np.where(noise, rng.integers(0, 8, size=data.shape), data).astype(np.int32)

    ck = os.path.join(tempfile.gettempdir(), "prune_finetune_em.npz")
    store, losses = fit_em(
        cc, data, store=ctx.parameters, num_epochs=8, batch_size=128,
        checkpoint_every=2, checkpoint_path=ck, resume=True,
    )
    print(f"trained {len(losses)} EM epochs: NLL {losses[0]:.2f} -> {losses[-1]:.2f}")
    if os.path.exists(ck):
        os.remove(ck)  # a completed run starts fresh next time

    x = jnp.asarray(data[:64])
    ll_full = float(np.mean(np.asarray(cc.evaluate(store, x))[:, 0, 0]))

    for fraction in (0.5, 0.75):
        pruned, report = prune_circuit(sc, ctx=ctx, store=store, fraction=fraction)
        ctx2 = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
        cc2 = ctx2.compile(pruned)
        ll0 = float(np.mean(np.asarray(cc2.evaluate(ctx2.parameters, x))[:, 0, 0]))
        s2, l2 = fit_em(cc2, data, store=ctx2.parameters, num_epochs=5, batch_size=128)
        ll1 = float(np.mean(np.asarray(cc2.evaluate(s2, x))[:, 0, 0]))
        print(
            f"fraction={fraction}: units {report['units_before']} -> "
            f"{report['units_after']}; mean LL full {ll_full:.2f}, pruned "
            f"{ll0:.2f}, fine-tuned {ll1:.2f}"
        )


if __name__ == "__main__":
    main()
