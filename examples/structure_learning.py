"""Learn a circuit's STRUCTURE from data, then refine and query it.

LearnSPN (Gens & Domingos 2013) grows a circuit from a data matrix: the
pairwise independence structure decides product splits, row clustering
decides mixture splits, and the leaves/weights are smoothed maximum-
likelihood estimates — so the learned circuit is exactly normalized
before any gradient step. This example learns a structure on synthetic
binary data with a hidden latent bit, shows it beating the fully-
factorized baseline, fine-tunes it with EM, and asks it for the top-k
most probable states. An extension: the reference has no structure
learner (its region graphs are fixed templates or a Chow-Liu tree).

Run: python examples/structure_learning.py
"""

import os

import numpy as np

from cirkit_tpu.backend.jax.queries import MAPQuery, mutual_information
from cirkit_tpu.models import learn_spn
from cirkit_tpu.parallel import evaluate_ll, fit_em
from cirkit_tpu.pipeline import PipelineContext


def main():
    num_vars = int(os.environ.get("VARS", "8"))
    n = int(os.environ.get("SAMPLES", "4000"))
    rng = np.random.default_rng(0)

    # a hidden bit z drives every variable through 15% noise: uniform
    # marginals (a factorized model learns nothing), strong dependence
    z = rng.choice(2, size=n)
    data = np.stack(
        [(z + rng.choice(2, size=n, p=[0.85, 0.15])) % 2 for _ in range(num_vars)],
        axis=1,
    )
    train, test = data[: 3 * n // 4], data[3 * n // 4 :]

    sc = learn_spn(train, num_categories=2, min_instances=64, seed=0)
    num_layers = len(list(sc.topological_ordering()))
    print(f"learned structure: {num_layers} layers over {num_vars} variables")

    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)

    test32 = test.astype(np.int32)
    ll = evaluate_ll(cc, test32, store=ctx.parameters)
    base = sum(
        np.log(np.bincount(train[:, v], minlength=2) / len(train))[test[:, v]].mean()
        for v in range(num_vars)
    )
    print(f"held-out LL/var: learned {ll / num_vars:.4f}  factorized {base / num_vars:.4f}")

    # the learned parameters are plain + normalized: EM-eligible as-is
    store, losses = fit_em(
        cc, train.astype(np.int32), store=ctx.parameters, num_epochs=5, batch_size=512
    )
    ll_em = evaluate_ll(cc, test32, store=store)
    print(f"after 5 EM epochs: {ll_em / num_vars:.4f} (train NLL {losses[0]:.4f} -> {losses[-1]:.4f})")

    # top-k most probable joint states: the two latent-bit modes first
    asg, scores = MAPQuery(cc)(store=store, top_k=4)
    print("top-4 states (score):")
    for t in range(4):
        state = "".join(str(int(s)) for s in np.asarray(asg[0, t]))
        print(f"  {state}  ({float(scores[0, t]):.3f})")

    # exact model mutual information: the dependence signal Chow-Liu
    # estimates from data, read directly off the learned distribution —
    # the hidden bit makes every pair informative (I > 0), and the model
    # MI tracks the empirical MI the structure was learned from
    mi = np.asarray(mutual_information(cc, store=store))
    off = mi[~np.eye(num_vars, dtype=bool)]
    print(
        f"model MI: every pair dependent (min {off.min():.4f} nats), "
        f"H(x_v) ~ {np.diag(mi).mean():.4f} vs ln 2 = {np.log(2):.4f}"
    )

    def empirical_mi(a, b):
        joint = np.zeros((2, 2))
        np.add.at(joint, (a, b), 1.0)
        joint /= joint.sum()
        pa, pb = joint.sum(1), joint.sum(0)
        nz = joint > 0
        return (joint[nz] * np.log(joint[nz] / np.outer(pa, pb)[nz])).sum()

    emp01 = empirical_mi(train[:, 0], train[:, 1])
    print(f"I(x0; x1): model {mi[0, 1]:.4f}  empirical {emp01:.4f}")


if __name__ == "__main__":
    main()
