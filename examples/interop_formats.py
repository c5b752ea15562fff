"""Move models between ecosystems: Juice ``.jpc``, SPFlow, and UAI.

A circuit is learned and EM-trained here, exported to Juice's
(ProbabilisticCircuits.jl) ``.jpc`` file format and to an SPFlow text
equation, reloaded from both artifacts in fresh contexts, and shown to
be the SAME distribution (identical test log-likelihood). The reloaded
JPC is then EM fine-tuned on fresh data — ``learnable=True`` imports are
first-class trainable circuits, not frozen snapshots. Finally a
UAI-format Markov network is COMPILED into a circuit by bucket
elimination, making ``IntegrateQuery`` its exact inference engine. An
extension: the reference loads only unparameterized ``.sdd`` logic files
and exports nothing.

Run: python examples/interop_formats.py
"""

import os
import tempfile

import numpy as np

from cirkit_tpu.models import (
    learn_spn,
    load_jpc,
    load_spflow,
    load_uai,
    save_jpc,
    save_spflow,
)
from cirkit_tpu.parallel import evaluate_ll, fit_em
from cirkit_tpu.pipeline import PipelineContext


def main():
    num_vars = int(os.environ.get("VARS", "6"))
    n = int(os.environ.get("SAMPLES", "2000"))
    out_dir = os.environ.get("OUT_DIR") or tempfile.mkdtemp(prefix="cirkit_interop_")
    rng = np.random.default_rng(0)

    # correlated binary data: a hidden bit drives every variable
    z = rng.choice(2, size=n)
    data = np.stack(
        [(z + rng.choice(2, size=n, p=[0.8, 0.2])) % 2 for _ in range(num_vars)],
        axis=1,
    ).astype(np.int32)
    train, test = data[: 3 * n // 4], data[3 * n // 4 :]

    # learn + EM-train a model to export
    sc = learn_spn(train, num_categories=2, min_instances=64, seed=0)
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    cc = ctx.compile(sc)
    store, _ = fit_em(cc, train, store=dict(ctx.parameters), num_epochs=5,
                      batch_size=256)
    ctx.parameters.update(store)
    ll = float(evaluate_ll(cc, test, store=store))
    print(f"trained model:      test LL {ll:.4f}")

    # ---- export: the TRAINED weights are read back through the context
    jpc_path = os.path.join(out_dir, "model.jpc")
    save_jpc(jpc_path, sc, ctx)
    eq = save_spflow(sc, ctx, filename=os.path.join(out_dir, "model.spn"))
    print(f"saved {jpc_path} ({os.path.getsize(jpc_path)} bytes) and "
          f"model.spn ({len(eq)} chars)")
    print(f"spflow equation head: {eq[:70]}...")

    # ---- reload both in FRESH contexts: same distribution
    for name, back in (
        ("jpc round trip:   ", load_jpc(jpc_path)),
        ("spflow round trip:", load_spflow(eq)),
    ):
        bctx = PipelineContext(semiring="lse-sum", fold=True)
        bll = float(evaluate_ll(bctx.compile(back), test, store=bctx.parameters))
        print(f"{name} test LL {bll:.4f} (drift {abs(bll - ll):.2e})")
        assert abs(bll - ll) < 1e-6

    # ---- imported circuits are trainable: EM fine-tune the reloaded JPC
    tuned = load_jpc(jpc_path, learnable=True)
    tctx = PipelineContext(semiring="lse-sum", fold=True)
    tcc = tctx.compile(tuned)
    tstore, _ = fit_em(tcc, train, store=dict(tctx.parameters), num_epochs=5,
                       batch_size=256)
    tll = float(evaluate_ll(tcc, test, store=tstore))
    print(f"jpc + EM fine-tune: test LL {tll:.4f}")

    # ---- UAI: compile a Markov network into an exact inference engine
    from cirkit_tpu.backend.jax.queries import IntegrateQuery

    uai_path = os.path.join(out_dir, "chain.uai")
    with open(uai_path, "w") as f:  # a 4-variable binary chain MRF
        f.write("MARKOV\n4\n2 2 2 2\n3\n"
                "2 0 1\n2 1 2\n2 2 3\n"
                "4\n2.0 1.0 1.0 2.0\n"   # attractive couplings
                "4\n2.0 1.0 1.0 2.0\n"
                "4\n2.0 1.0 1.0 2.0\n")
    mrf = load_uai(uai_path)
    mctx = PipelineContext(semiring="lse-sum", fold=True)
    mcc = mctx.compile(mrf)
    q = IntegrateQuery(mcc)
    ones = np.ones((1, 4), dtype=np.int32)
    z = float(np.exp(np.asarray(q(
        ones, integrate_vars=np.ones(4, bool), store=mctx.parameters))[0, 0, 0]))
    # p(x3=1 | x0=1) through two marginalization masks
    num = float(np.exp(np.asarray(q(
        ones, integrate_vars=np.array([0, 1, 1, 0], bool),
        store=mctx.parameters))[0, 0, 0]))
    den = float(np.exp(np.asarray(q(
        ones, integrate_vars=np.array([0, 1, 1, 1], bool),
        store=mctx.parameters))[0, 0, 0]))
    print(f"uai chain MRF:      Z {z:.1f}, p(x3=1 | x0=1) = {num / den:.4f} "
          "(attractive couplings pull it above 0.5)")
    assert num / den > 0.5


if __name__ == "__main__":
    main()
