"""Sum-of-squares (squared non-monotonic circuit) tests under the complex
log semiring: evaluation, |c|^2 via multiply(conjugate(c), c), and its
partition function, all against exhaustive enumeration (ref coverage:
``tests/backend/torch/test_semiring.py`` and the SoS paths of
``test_compile_circuit_operators.py``)."""

import numpy as np
import pytest

from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic.circuit import Circuit
from cirkit_tpu.symbolic.initializers import ConstantTensorInitializer
from cirkit_tpu.symbolic.layers import CategoricalLayer, HadamardLayer, SumLayer
from cirkit_tpu.symbolic.parameters import Parameter, TensorParameter
from cirkit_tpu.utils.scope import Scope

from tests.reference_eval import enumerate_worlds, eval_circuit


def _const(arr):
    arr = np.asarray(arr, dtype=np.float64)
    return Parameter.from_input(
        TensorParameter(*arr.shape, initializer=ConstantTensorInitializer(arr))
    )


def _nonmonotonic_pc():
    """A bivariate circuit with a negative sum weight: c(x) can be < 0, so
    only |c|^2 is a valid (unnormalized) distribution."""
    p0 = np.array([[0.2, 0.5, 0.3], [0.6, 0.1, 0.3]])
    p1 = np.array([[0.4, 0.4, 0.2], [0.1, 0.8, 0.1]])
    l0 = CategoricalLayer(Scope([0]), 2, num_categories=3, probs=_const(p0))
    l1 = CategoricalLayer(Scope([1]), 2, num_categories=3, probs=_const(p1))
    h = HadamardLayer(2, arity=2)
    s = SumLayer(2, 1, weight=_const([[0.9, -0.7]]))
    return Circuit([l0, l1, h, s], {h: [l0, l1], s: [h]}, [s])


@pytest.mark.parametrize("fold", [False, True])
def test_complex_semiring_evaluates_negative_outputs(fold):
    sc = _nonmonotonic_pc()
    ctx = PipelineContext(semiring="complex-lse-sum", fold=fold)
    cc = ctx.compile(sc)
    worlds = enumerate_worlds(2, 3)
    want = eval_circuit(sc, worlds)[:, 0, 0]  # real, some entries negative
    assert (want < 0).any() and (want > 0).any()
    got = np.asarray(cc(worlds))[:, 0, 0]
    np.testing.assert_allclose(np.exp(got).real, want, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.exp(got).imag, 0.0, atol=1e-9)


@pytest.mark.parametrize("fold", [False, True])
def test_squared_circuit_and_partition(fold):
    sc = _nonmonotonic_pc()
    ctx = PipelineContext(semiring="complex-lse-sum", fold=fold)
    cc = ctx.compile(sc)
    sq = ctx.multiply(ctx.conjugate(cc), cc)  # |c|^2
    worlds = enumerate_worlds(2, 3)
    want = eval_circuit(sc, worlds)[:, 0, 0] ** 2
    got = np.exp(np.asarray(sq(worlds))[:, 0, 0])
    np.testing.assert_allclose(got.real, want, rtol=1e-9, atol=1e-12)

    zc = ctx.integrate(sq)
    z = np.exp(np.asarray(zc(ctx.parameters, worlds[:1]))[0, 0, 0])
    np.testing.assert_allclose(z.real, want.sum(), rtol=1e-9)
    np.testing.assert_allclose(np.imag(z), 0.0, atol=1e-9)


def test_csafelog_gradient_no_nan_at_zero():
    """The complex safe log must produce finite (zeroed) gradients at 0+0j,
    mirroring the reference's ComplexSafeLog backward
    (ref: ``backend/torch/utils.py:32-50``)."""
    import jax
    import jax.numpy as jnp

    from cirkit_tpu.backend.jax.utils import csafelog

    def f(x):
        return jnp.real(csafelog(x * (1.0 + 0.0j)))

    g = jax.grad(f)(0.0)
    assert np.isfinite(g)

    # and matches 1/x away from zero
    g1 = jax.grad(f)(2.0)
    np.testing.assert_allclose(g1, 0.5, rtol=1e-9)


def test_csafelog_matches_native_complex_log_gradient():
    """csafelog's backward must follow JAX's holomorphic VJP (plain g/x, no
    conjugation — torch's conj convention flips the imaginary part) so that
    training a squared circuit descends the true gradient. Pinned against
    both jax.vjp(jnp.log) and real-calculus ground truth."""
    import jax
    import jax.numpy as jnp

    from cirkit_tpu.backend.jax.utils import csafelog

    rng = np.random.default_rng(41)
    y = jnp.asarray(rng.normal(size=(6,)) + 1j * rng.normal(size=(6,)), jnp.complex128)

    def loss_safe(yr, yi):
        o = csafelog(jax.lax.complex(yr, yi))
        return jnp.sum(jnp.sin(o.real) + 0.7 * jnp.cos(o.imag))

    def loss_real_calculus(yr, yi):
        outr = 0.5 * jnp.log(yr**2 + yi**2)
        outi = jnp.arctan2(yi, yr)
        return jnp.sum(jnp.sin(outr) + 0.7 * jnp.cos(outi))

    gs = jax.grad(loss_safe, argnums=(0, 1))(y.real, y.imag)
    gt = jax.grad(loss_real_calculus, argnums=(0, 1))(y.real, y.imag)
    for a, b in zip(gs, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
