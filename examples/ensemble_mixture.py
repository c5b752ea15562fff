"""Ensembles as circuits: train diverse models independently, blend them
with the `mixture` operator, and serve/query the ensemble as ONE circuit.

The flow (no reference counterpart — cirkit only concatenates outputs):
  1. Train three structurally different circuits (two region-graph
     templates + a LearnSPN structure) on the same data.
  2. `mixture(...)` them: a new symbolic circuit whose density is
     sum_i w_i p_i(x), parameters SHARED with the trained components
     (pointer slots), blend weights learnable (softmax).
  3. Fit the blend on held-out data (stacking); learnability flows
     through the pointer slots, so the same call can fine-tune the
     components jointly.
  4. Run standard queries on the ensemble directly: held-out LL,
     per-sample marginals with soft (virtual) evidence, sampling.

Run: python examples/ensemble_mixture.py
"""

import os

import jax
import numpy as np
import optax

from cirkit_tpu.models import image_data, learn_spn
from cirkit_tpu.parallel import fit
from cirkit_tpu.parallel.training import evaluate_ll
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.backend.jax.queries import IntegrateQuery, SamplingQuery
from cirkit_tpu.utils import Scope


def main() -> None:
    side = int(os.environ.get("SIDE", "4"))
    units = int(os.environ.get("UNITS", "4"))
    epochs = int(os.environ.get("EPOCHS", "3"))
    d = side * side
    rng = np.random.default_rng(0)

    # synthetic "image" data: a few prototypes + noise, split train/valid
    protos = rng.integers(0, 256, size=(4, d))
    idx = rng.integers(0, 4, 2048)
    data = np.clip(protos[idx] + rng.integers(-12, 13, (2048, d)), 0, 255)
    train, valid = data[:1536], data[1536:]

    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=1)

    # -- 1. three diverse components, trained independently ----------------
    components = []
    for name, sc in [
        ("quad-tree", image_data((1, side, side), "quad-tree-2",
                                 input_layer="categorical", num_input_units=units,
                                 sum_product_layer="cp", num_sum_units=units)),
        ("quad-graph", image_data((1, side, side), "quad-graph",
                                  input_layer="categorical", num_input_units=max(2, units // 2),
                                  sum_product_layer="cp", num_sum_units=max(2, units // 2))),
        ("learn-spn", learn_spn(train.astype(np.int64), num_categories=256,
                                min_instances=512)),
    ]:
        cc = ctx.compile(sc)
        _, losses = fit(cc, train, store=ctx.parameters, num_epochs=epochs,
                        batch_size=256, optimizer=optax.adam(2e-2),
                        key=jax.random.PRNGKey(7))
        ctx.update_parameters(cc.default_store)
        ll = evaluate_ll(cc, valid, store=ctx.parameters)
        print(f"component {name:10s}: valid LL/sample {ll:8.2f}")
        components.append(cc)

    # -- 2.+3. blend on held-out data (stacking) ---------------------------
    # freeze="shared" trains ONLY the blend coefficients: the components
    # stay exactly as trained above (drop it to fine-tune them jointly)
    mixed = ctx.mixture(*components)
    store, _ = fit(mixed, valid, store=dict(ctx.parameters), num_epochs=8,
                   batch_size=256, optimizer=optax.adam(5e-2),
                   key=jax.random.PRNGKey(9), freeze="shared")
    ll_mix = evaluate_ll(mixed, valid, store=store)
    print(f"ensemble        : valid LL/sample {ll_mix:8.2f} "
          "(>= best component up to optimization noise)")

    # -- 4. ensemble queries ------------------------------------------------
    # exact per-sample marginal of pixel 0 under the ensemble
    q = IntegrateQuery(mixed)
    ll_marg = np.asarray(q(valid[:4], integrate_vars=Scope([0]), store=store))
    print("marginal LL (pixel 0 summed out), 4 rows:",
          np.round(ll_marg[:, 0, 0], 2))

    # soft (virtual) evidence: an unreliable sensor on pixel 1 --
    # weights proportional to a noisy reading's likelihood
    W = np.ones((d, 256))
    W[1] = np.exp(-0.5 * ((np.arange(256) - float(valid[0, 1])) / 16.0) ** 2)
    ll_soft = np.asarray(q(valid[:4], soft_vars=Scope([1]), soft_weights=W, store=store))
    print("LL under soft evidence on pixel 1:", np.round(ll_soft[:, 0, 0], 2))

    # draw from the ensemble
    samples, _ = SamplingQuery(mixed)(4, key=jax.random.PRNGKey(3), store=store)
    print("ensemble samples shape:", np.asarray(samples).shape)

    # -- 5. boosted density estimation (Rosset & Segal 2002) ----------------
    # stagewise: each stage trains on inverse-density weights, an exact
    # line search blends it in; the result is again ONE mixture circuit
    from cirkit_tpu.models import boost_mixture

    bctx = PipelineContext(semiring="lse-sum", fold=True, seed=2)
    res = boost_mixture(
        lambda t: image_data((1, side, side), "quad-tree-2",
                             input_layer="categorical", num_input_units=units,
                             sum_product_layer="cp", num_sum_units=units),
        train, ctx=bctx, num_stages=3, num_epochs=max(2, epochs),
        batch_size=256, valid_data=valid, key=jax.random.PRNGKey(11),
    )
    print(f"boosting: {len(res.components)} stages, weights "
          f"{np.round(res.weights, 3)}, valid LL "
          f"{res.stage_lls[0]:8.2f} -> {res.stage_lls[-1]:8.2f}")

    # -- 6. bagged density estimation (bootstrap members, uniform blend) ----
    # bootstrap resamples ride multinomial sample weights: no data copies,
    # every member reuses the same compiled programs
    from cirkit_tpu.models import bag_mixture

    gctx = PipelineContext(semiring="lse-sum", fold=True, seed=4)
    bag = bag_mixture(
        lambda t: image_data((1, side, side), "quad-tree-2",
                             input_layer="categorical", num_input_units=units,
                             sum_product_layer="cp", num_sum_units=units),
        train, ctx=gctx, num_components=3, num_epochs=max(2, epochs),
        batch_size=256, key=jax.random.PRNGKey(12),
    )
    bll = np.asarray(bag.circuit(bag.store, valid[:256])).reshape(-1)
    print(f"bagging: {len(bag.components)} members, member train LLs "
          f"{np.round(bag.stage_lls, 2)}, blended valid LL {bll.mean():8.2f}")


if __name__ == "__main__":
    main()
