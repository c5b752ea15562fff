"""PSDD loading: the ``.psdd`` text format lowers to a NORMALIZED symbolic
circuit whose evaluation is the PSDD's distribution. Ground truth comes
from an independent hand-computed factorization of the test file — not
from the loader — and from exhaustive enumeration.

The reference loads only unparameterized ``.sdd`` files (ref:
``cirkit/templates/logic/sdd.py:19-82``); PSDD support is an extension.
"""

import itertools
import math

import numpy as np
import pytest

from cirkit_tpu.models.logic import PSDD
from cirkit_tpu.pipeline import PipelineContext

# vtree ((1,2),3); root = single-element decision (D5 ∧ T4);
# D5 = 0.6·(x1 ∧ Bern(x2; .3)) + 0.4·(¬x1 ∧ Bern(x2; .9)); T4 = Bern(x3; .8)
PSDD_TEXT = """c a 3-variable test psdd
psdd 7
L 0 0 1
L 1 0 -1
T 2 1 2 {l3}
T 3 1 2 {l9}
T 4 2 3 {l8}
D 5 3 2 0 2 {l6} 1 3 {l4}
D 6 4 1 5 4 0.0
""".format(
    l3=math.log(0.3), l9=math.log(0.9), l8=math.log(0.8),
    l6=math.log(0.6), l4=math.log(0.4),
)


def _true_prob(x1: int, x2: int, x3: int) -> float:
    """The test file's distribution, written out by hand."""
    bern = lambda x, p: p if x else 1.0 - p  # noqa: E731
    mix = 0.6 * (x1 == 1) * bern(x2, 0.3) + 0.4 * (x1 == 0) * bern(x2, 0.9)
    return mix * bern(x3, 0.8)


@pytest.fixture(scope="module")
def compiled(tmp_path_factory):
    path = tmp_path_factory.mktemp("psdd") / "test.psdd"
    path.write_text(PSDD_TEXT)
    psdd = PSDD.load(str(path))
    sc = psdd.build_circuit()
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    return ctx, ctx.compile(sc)


def test_psdd_matches_hand_computed_distribution(compiled):
    ctx, cc = compiled
    xs = np.asarray(list(itertools.product([0, 1], repeat=3)), np.int64)
    out = np.asarray(cc.evaluate(ctx.parameters, xs)).reshape(-1)
    expected = np.log([_true_prob(*x) for x in xs])
    np.testing.assert_allclose(out, expected, rtol=1e-9)


def test_psdd_is_normalized(compiled):
    ctx, cc = compiled
    xs = np.asarray(list(itertools.product([0, 1], repeat=3)), np.int64)
    out = np.asarray(cc.evaluate(ctx.parameters, xs)).reshape(-1)
    np.testing.assert_allclose(np.exp(out).sum(), 1.0, rtol=1e-9)


def test_psdd_exact_entropy_and_map(compiled):
    from cirkit_tpu.backend.jax import EntropyQuery, MAPQuery

    ctx, cc = compiled
    store = cc.restrict_store(ctx.parameters)
    probs = np.asarray(
        [_true_prob(*x) for x in itertools.product([0, 1], repeat=3)]
    )
    h = float(np.asarray(EntropyQuery(cc)(store=store)).reshape(()))
    np.testing.assert_allclose(
        h, -(probs * np.log(probs)).sum(), rtol=1e-7
    )  # PSDDs are deterministic: the latent bound IS the entropy
    x = np.zeros((1, 3), np.int64)
    asg, val = MAPQuery(cc)(x, evidence_mask=np.zeros((1, 3), bool), store=store)
    best = np.asarray(
        list(itertools.product([0, 1], repeat=3))[int(np.argmax(probs))]
    )
    np.testing.assert_array_equal(np.asarray(asg).reshape(-1), best)
    np.testing.assert_allclose(
        float(np.asarray(val).reshape(())), np.log(probs.max()), rtol=1e-7
    )


def test_psdd_learnable_trains_with_em(tmp_path):
    from cirkit_tpu.parallel import fit_em

    path = tmp_path / "t.psdd"
    path.write_text(PSDD_TEXT)
    sc = PSDD.load(str(path)).build_circuit(learnable=True)
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, (256, 3), np.int64)
    store, losses = fit_em(
        cc, data, store=dict(ctx.parameters), num_epochs=4, batch_size=256,
        pseudocount=1e-3,
    )
    assert losses[-1] <= losses[0] + 1e-9, losses
    # still a distribution after training
    xs = np.asarray(list(itertools.product([0, 1], repeat=3)), np.int64)
    out = np.asarray(cc.evaluate(store, xs)).reshape(-1)
    np.testing.assert_allclose(np.exp(out).sum(), 1.0, rtol=1e-6)


@pytest.mark.parametrize(
    "bad, match",
    [
        ("psdd 1\nD 0 0 1 7 8 0.0\n", "malformed"),
        ("psdd 1\nQ 0 0 1\n", "Unknown PSDD node tag"),
        ("psdd 2\nL 0 0 1\nT 1 0 1 0.5\n", "log-prob"),
        (
            "psdd 3\nL 0 0 1\nL 1 0 -1\nD 2 1 2 0 0 -0.1 1 1 -0.1\n",
            "probabilities sum",
        ),
        ("c nothing\n", "no PSDD nodes"),
    ],
)
def test_psdd_malformed_raises(tmp_path, bad, match):
    p = tmp_path / "bad.psdd"
    p.write_text(bad)
    with pytest.raises(ValueError, match=match):
        PSDD.load(str(p))
