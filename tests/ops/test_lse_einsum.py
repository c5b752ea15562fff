"""Parity tests for the fused Pallas log-einsum-exp kernels.

The kernels run here in interpreter mode (CPU), forced via the
``CIRKIT_TPU_FORCE_PALLAS`` hook, and are compared against the XLA
fallback composition — the same fallback the float64 circuit tests
exercise. Mirrors the reference's semiring numerics coverage
(``tests/backend/torch/test_semiring.py``) extended with gradient checks
for the custom VJPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.ops import lse_einsum as L

# f32 inputs + interpreter-mode bf16x3 dots: tolerances well above exactness
# but far below a single bf16 pass (~4e-3).
ATOL = 5e-4
RTOL = 5e-4


@pytest.fixture(autouse=True)
def _force_pallas(monkeypatch):
    monkeypatch.setenv("CIRKIT_TPU_FORCE_PALLAS", "1")


def _rand(rng, shape, scale=3.0, shift=-2.0):
    return jnp.asarray(rng.normal(size=shape) * scale + shift, jnp.float32)


def _weights(rng, shape):
    return jnp.asarray(rng.uniform(0.01, 1.0, size=shape), jnp.float32)


def _fallback_matmul(x, w):
    m = L._clamp_max(x)
    return jnp.log(jnp.einsum("fbi,foi->fbo", jnp.exp(x - m), w)) + m


def _fallback_tucker(x1, x2, w):
    m1 = L._clamp_max(x1)
    m2 = L._clamp_max(x2)
    k1, k2 = x1.shape[-1], x2.shape[-1]
    w3 = w.reshape(w.shape[0], w.shape[1], k1, k2)
    e = jnp.einsum("fbi,fbj->fbij", jnp.exp(x1 - m1), jnp.exp(x2 - m2))
    return jnp.log(jnp.einsum("fbij,foij->fbo", e, w3)) + m1 + m2


@pytest.mark.parametrize("b", [8, 13])  # 13 exercises the batch padding
def test_lse_matmul_matches_fallback(b):
    rng = np.random.default_rng(0)
    x = _rand(rng, (3, b, 32))
    w = _weights(rng, (3, 16, 32))
    out = L.lse_matmul(x, w)
    ref = _fallback_matmul(x, w)
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


def test_fast_mode_within_bf16_tolerance(monkeypatch):
    """CIRKIT_TPU_FAST trades the bf16 splits for single-pass bf16 matmuls;
    the nonnegative contraction keeps the error within bf16 epsilon."""
    monkeypatch.setenv("CIRKIT_TPU_FAST", "1")
    rng = np.random.default_rng(10)
    x = _rand(rng, (2, 8, 64))
    w = _weights(rng, (2, 16, 64))
    out = L.lse_matmul(x, w)
    ref = _fallback_matmul(x, w)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    x1 = _rand(rng, (2, 8, 8))
    x2 = _rand(rng, (2, 8, 8))
    theta = _rand(rng, (2, 8, 64), scale=1.0, shift=0.0)
    out = L.lse_tucker2_softmax(x1, x2, theta)
    import jax

    ref = _fallback_tucker(x1, x2, jax.nn.softmax(theta, axis=-1))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_lse_matmul_softmax_matches_composition():
    rng = np.random.default_rng(1)
    x = _rand(rng, (2, 8, 32))
    theta = _rand(rng, (2, 16, 32), scale=1.0, shift=0.0)
    out = L.lse_matmul_softmax(x, theta)
    ref = _fallback_matmul(x, jax.nn.softmax(theta, axis=-1))
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("b", [8, 11])
def test_lse_tucker2_matches_fallback(b):
    rng = np.random.default_rng(2)
    x1 = _rand(rng, (3, b, 8))
    x2 = _rand(rng, (3, b, 16))
    w = _weights(rng, (3, 8, 8 * 16))
    out = L.lse_tucker2(x1, x2, w)
    ref = _fallback_tucker(x1, x2, w)
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


def test_lse_tucker2_softmax_matches_composition():
    rng = np.random.default_rng(3)
    x1 = _rand(rng, (2, 8, 8))
    x2 = _rand(rng, (2, 8, 8))
    theta = _rand(rng, (2, 8, 64), scale=1.0, shift=0.0)
    out = L.lse_tucker2_softmax(x1, x2, theta)
    ref = _fallback_tucker(x1, x2, jax.nn.softmax(theta, axis=-1))
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.slow
def test_lse_matmul_gradients_match_fallback():
    rng = np.random.default_rng(4)
    x = _rand(rng, (2, 8, 32))
    w = _weights(rng, (2, 16, 32))

    def loss_k(x, w):
        return jnp.sum(jnp.sin(L.lse_matmul(x, w)))

    def loss_f(x, w):
        return jnp.sum(jnp.sin(_fallback_matmul(x, w)))

    gk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    for a, b in zip(gk, gf):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_lse_tucker2_softmax_gradients_match_composition():
    rng = np.random.default_rng(5)
    x1 = _rand(rng, (2, 8, 8))
    x2 = _rand(rng, (2, 8, 8))
    theta = _rand(rng, (2, 8, 64), scale=1.0, shift=0.0)

    def loss_k(x1, x2, th):
        return jnp.sum(jnp.sin(L.lse_tucker2_softmax(x1, x2, th)))

    def loss_f(x1, x2, th):
        return jnp.sum(jnp.sin(_fallback_tucker(x1, x2, jax.nn.softmax(th, axis=-1))))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x1, x2, theta)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x1, x2, theta)
    for a, b in zip(gk, gf):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_lse_matmul_softmax_grad_multi_tile_batch():
    """dtheta accumulates across batch tiles; check a batch spanning >1 tile
    by shrinking the tile budget via a large input width."""
    rng = np.random.default_rng(6)
    x = _rand(rng, (1, 300, 16))
    theta = _rand(rng, (1, 8, 16), scale=1.0, shift=0.0)

    def loss_k(th):
        return jnp.sum(jnp.sin(L.lse_matmul_softmax(x, th)))

    def loss_f(th):
        return jnp.sum(jnp.sin(_fallback_matmul(x, jax.nn.softmax(th, axis=-1))))

    gk = jax.grad(loss_k)(theta)
    gf = jax.grad(loss_f)(theta)
    np.testing.assert_allclose(gk, gf, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_lse_matmul_all_neg_inf_row_yields_no_nan():
    """Rows of -inf (zero probability everywhere) must stay NaN-free in both
    the output (-inf) and the gradient (zero), mirroring SafeLog."""
    rng = np.random.default_rng(7)
    x = _rand(rng, (1, 8, 16)).at[0, 3].set(-jnp.inf)
    w = _weights(rng, (1, 8, 16))
    out = L.lse_matmul(x, w)
    assert bool(jnp.all(jnp.isneginf(out[0, 3])))
    assert bool(jnp.all(jnp.isfinite(out[0, :3])))

    g = jax.grad(lambda x: jnp.sum(jnp.where(jnp.isfinite(out), L.lse_matmul(x, w), 0.0)))(x)
    assert bool(jnp.all(jnp.isfinite(jnp.nan_to_num(g, posinf=jnp.inf))))
    assert not bool(jnp.any(jnp.isnan(g)))


def test_dispatch_falls_back_off_pallas(monkeypatch):
    monkeypatch.setenv("CIRKIT_TPU_DISABLE_PALLAS", "1")
    rng = np.random.default_rng(8)
    x = _rand(rng, (2, 8, 32))
    w = _weights(rng, (2, 16, 32))
    out = L.lse_matmul(x, w)
    ref = _fallback_matmul(x, w)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_float64_uses_fallback():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float64)
    w = jnp.asarray(rng.uniform(0.01, 1.0, size=(2, 8, 16)), jnp.float64)
    out = L.lse_matmul(x, w)
    assert out.dtype == jnp.float64
    m = np.max(np.asarray(x), axis=-1, keepdims=True)
    ref = np.log(np.einsum("fbi,foi->fbo", np.exp(np.asarray(x) - m), np.asarray(w))) + m
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_blocked_matmul_matches_fallback(monkeypatch):
    """Contractions wider than the VMEM budget stream through the blocked
    (flash-style) kernel with a running max; same math, chunked."""
    monkeypatch.setattr(L, "_VMEM_BUDGET", 64 * 1024)
    rng = np.random.default_rng(11)
    x = _rand(rng, (2, 9, 1000))  # exercises batch AND width padding
    w = _weights(rng, (2, 16, 1000))
    out = L.lse_matmul(x, w)
    ref = _fallback_matmul(x, w)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_blocked_matmul_gradients_match(monkeypatch):
    monkeypatch.setattr(L, "_VMEM_BUDGET", 64 * 1024)
    rng = np.random.default_rng(12)
    x = _rand(rng, (1, 8, 512))
    w = _weights(rng, (1, 8, 512))

    def loss_k(x, w):
        return jnp.sum(jnp.sin(L.lse_matmul(x, w)))

    def loss_f(x, w):
        return jnp.sum(jnp.sin(_fallback_matmul(x, w)))

    gk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    for a, b in zip(gk, gf):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-2)


def test_oversized_tucker_routes_through_blocked_matmul(monkeypatch):
    monkeypatch.setattr(L, "_VMEM_BUDGET", 64 * 1024)
    rng = np.random.default_rng(13)
    x1 = _rand(rng, (1, 8, 32))
    x2 = _rand(rng, (1, 8, 32))
    w = _weights(rng, (1, 16, 32 * 32))
    out = L.lse_tucker2(x1, x2, w)
    ref = _fallback_tucker(x1, x2, w)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_lse_tucker2_softmax_grad_multi_tile_batch(monkeypatch):
    """dtheta accumulation across batch tiles for the tucker-softmax kernel
    (batch tiles shrink when the VMEM budget forces it)."""
    monkeypatch.setattr(L, "_VMEM_BUDGET", 48 * 1024)
    rng = np.random.default_rng(14)
    x1 = _rand(rng, (1, 40, 8))
    x2 = _rand(rng, (1, 40, 8))
    theta = _rand(rng, (1, 8, 64), scale=1.0, shift=0.0)

    def loss_k(th):
        return jnp.sum(jnp.sin(L.lse_tucker2_softmax(x1, x2, th)))

    def loss_f(th):
        return jnp.sum(jnp.sin(_fallback_tucker(x1, x2, jax.nn.softmax(th, axis=-1))))

    gk = jax.grad(loss_k)(theta)
    gf = jax.grad(loss_f)(theta)
    np.testing.assert_allclose(gk, gf, rtol=5e-3, atol=5e-3)


# --------------------------------------------------------------------------- #
# Documented error bounds vs a float64 reference (VERDICT r1 item 4): the
# default bf16x3 path is f32-grade (exp-limited, ~1e-4 nats) and
# CIRKIT_TPU_FAST stays within its advertised ~4e-3 worst-case, forward AND
# backward. A regression in either path fails here.
# --------------------------------------------------------------------------- #

def _f64_matmul(x, w):
    x, w = jnp.asarray(x, jnp.float64), jnp.asarray(w, jnp.float64)
    m = jnp.max(x, axis=-1, keepdims=True)
    return jnp.log(jnp.einsum("fbi,foi->fbo", jnp.exp(x - m), w)) + m


def _f64_tucker(x1, x2, w):
    x1, x2 = jnp.asarray(x1, jnp.float64), jnp.asarray(x2, jnp.float64)
    w = jnp.asarray(w, jnp.float64)
    k1, k2 = x1.shape[-1], x2.shape[-1]
    m1 = jnp.max(x1, axis=-1, keepdims=True)
    m2 = jnp.max(x2, axis=-1, keepdims=True)
    w3 = w.reshape(w.shape[0], w.shape[1], k1, k2)
    e = jnp.einsum("fbi,fbj->fbij", jnp.exp(x1 - m1), jnp.exp(x2 - m2))
    return jnp.log(jnp.einsum("fbij,foij->fbo", e, w3)) + m1 + m2


# (op name, forward tolerance, gradient tolerance) per mode; tolerances are
# the documented bounds with 2x headroom.
_BOUNDS = {False: (3e-4, 2e-3), True: (8e-3, 4e-2)}


@pytest.mark.parametrize("fast", [False, True], ids=["bf16x3", "fast"])
@pytest.mark.parametrize(
    "op", ["matmul", "matmul_softmax", "tucker2", "tucker2_softmax"]
)
@pytest.mark.slow
def test_error_bounds_vs_float64(op, fast, monkeypatch):
    if fast:
        monkeypatch.setenv("CIRKIT_TPU_FAST", "1")
    ftol, gtol = _BOUNDS[fast]
    rng = np.random.default_rng(20)

    if op.startswith("matmul"):
        x = _rand(rng, (2, 16, 64))
        if op.endswith("softmax"):
            th = _rand(rng, (2, 16, 64), scale=1.0, shift=0.0)
            kfn = lambda: L.lse_matmul_softmax(x, th)
            rfn = lambda: _f64_matmul(x, jax.nn.softmax(jnp.asarray(th, jnp.float64), axis=-1))
            kgrad = jax.grad(lambda t: jnp.sum(jnp.sin(L.lse_matmul_softmax(x, t))))(th)
            rgrad = jax.grad(
                lambda t: jnp.sum(jnp.sin(_f64_matmul(x, jax.nn.softmax(t, axis=-1))))
            )(jnp.asarray(th, jnp.float64))
        else:
            w = _weights(rng, (2, 16, 64))
            kfn = lambda: L.lse_matmul(x, w)
            rfn = lambda: _f64_matmul(x, w)
            kgrad = jax.grad(lambda xx: jnp.sum(jnp.sin(L.lse_matmul(xx, w))))(x)
            rgrad = jax.grad(lambda xx: jnp.sum(jnp.sin(_f64_matmul(xx, w))))(
                jnp.asarray(x, jnp.float64)
            )
    else:
        x1 = _rand(rng, (2, 16, 8))
        x2 = _rand(rng, (2, 16, 8))
        if op.endswith("softmax"):
            th = _rand(rng, (2, 16, 64), scale=1.0, shift=0.0)
            kfn = lambda: L.lse_tucker2_softmax(x1, x2, th)
            rfn = lambda: _f64_tucker(
                x1, x2, jax.nn.softmax(jnp.asarray(th, jnp.float64), axis=-1)
            )
            kgrad = jax.grad(
                lambda t: jnp.sum(jnp.sin(L.lse_tucker2_softmax(x1, x2, t)))
            )(th)
            rgrad = jax.grad(
                lambda t: jnp.sum(jnp.sin(_f64_tucker(x1, x2, jax.nn.softmax(t, axis=-1))))
            )(jnp.asarray(th, jnp.float64))
        else:
            w = _weights(rng, (2, 16, 64))
            kfn = lambda: L.lse_tucker2(x1, x2, w)
            rfn = lambda: _f64_tucker(x1, x2, w)
            kgrad = jax.grad(lambda xx: jnp.sum(jnp.sin(L.lse_tucker2(xx, x2, w))))(x1)
            rgrad = jax.grad(lambda xx: jnp.sum(jnp.sin(_f64_tucker(xx, x2, w))))(
                jnp.asarray(x1, jnp.float64)
            )

    out, ref = np.asarray(kfn(), np.float64), np.asarray(rfn())
    ferr = np.max(np.abs(out - ref))
    assert ferr < ftol, f"forward error {ferr:.2e} exceeds the {ftol} bound"
    gerr = np.max(np.abs(np.asarray(kgrad, np.float64) - np.asarray(rgrad)))
    gscale = max(1.0, float(np.max(np.abs(np.asarray(rgrad)))))
    assert gerr / gscale < gtol, f"grad error {gerr:.2e} exceeds the {gtol} bound"


# --------------------------------------------------------------------------- #
# Complex kernel (SoS / squared circuits): split-real Pallas contraction vs
# a complex128 reference, forward and backward (VERDICT r1 item 5).
# --------------------------------------------------------------------------- #

def _crand(rng, shape, scale=1.5):
    re = rng.normal(size=shape) * scale - 1.0
    im = rng.normal(size=shape) * scale
    return jnp.asarray(re + 1j * im, jnp.complex64)


def _epilogue(parts):
    yr, yi, m = parts
    return jnp.log(jax.lax.complex(yr, yi).astype(jnp.complex128)) + m.astype(
        jnp.complex128
    )


def _f64_cmatmul(x, w):
    x = jnp.asarray(x, jnp.complex128)
    w = jnp.asarray(w, jnp.complex128)
    m = jnp.max(x.real, axis=-1, keepdims=True)
    y = jnp.einsum("fbi,foi->fbo", jnp.exp(x - m), w)
    return jnp.log(y) + m


@pytest.mark.parametrize("b", [8, 13])
@pytest.mark.slow
def test_clse_matmul_matches_complex128(b):
    from cirkit_tpu.ops.lse_einsum import clse_matmul_parts

    rng = np.random.default_rng(21)
    x = _crand(rng, (3, b, 32))
    w = _crand(rng, (3, 16, 32))
    parts = clse_matmul_parts(x, w)
    assert parts is not None
    out = np.asarray(_epilogue(parts))
    ref = np.asarray(_f64_cmatmul(x, w))
    np.testing.assert_allclose(out.real, ref.real, rtol=5e-4, atol=5e-4)
    # phases compared modulo 2*pi
    dphi = np.angle(np.exp(1j * (out.imag - ref.imag)))
    np.testing.assert_allclose(dphi, 0.0, atol=5e-4)


@pytest.mark.slow
def test_clse_matmul_gradients_match_fallback():
    from cirkit_tpu.backend.jax.semiring import ComplexLSESumSemiring as C
    from cirkit_tpu.backend.jax.utils import csafelog
    from cirkit_tpu.ops.lse_einsum import clse_matmul_parts

    rng = np.random.default_rng(22)
    x = _crand(rng, (2, 8, 32))
    w = _crand(rng, (2, 16, 32))

    def loss_k(x, w):
        yr, yi, m = clse_matmul_parts(x, w)
        out = csafelog(jax.lax.complex(yr, yi)) + m
        return jnp.sum(jnp.sin(out.real) + 0.7 * jnp.cos(out.imag))

    def loss_f(x, w):
        mx = jnp.max(x.real, axis=-1, keepdims=True)
        y = jnp.einsum("fbi,foi->fbo", jnp.exp(x - mx), w)
        out = csafelog(y) + mx
        return jnp.sum(jnp.sin(out.real) + 0.7 * jnp.cos(out.imag))

    gk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    for a, b_ in zip(gk, gf):
        np.testing.assert_allclose(
            np.asarray(a.real), np.asarray(b_.real), rtol=5e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(a.imag), np.asarray(b_.imag), rtol=5e-3, atol=5e-3
        )


def test_complex_semiring_tucker2_kernel_matches_fallback(monkeypatch):
    """The semiring's complex tucker2 routes through the kernel via the
    log-space outer sum and must agree with the XLA composition."""
    from cirkit_tpu.backend.jax.semiring import ComplexLSESumSemiring as C

    rng = np.random.default_rng(23)
    x1 = _crand(rng, (2, 8, 8))
    x2 = _crand(rng, (2, 8, 8))
    w = _crand(rng, (2, 16, 64))
    got = C.tucker2(x1, x2, w)
    monkeypatch.setenv("CIRKIT_TPU_DISABLE_PALLAS", "1")
    want = C.tucker2(x1, x2, w)
    np.testing.assert_allclose(
        np.asarray(got.real), np.asarray(want.real), rtol=5e-4, atol=5e-4
    )
    dphi = np.angle(np.exp(1j * np.asarray(got.imag - want.imag)))
    np.testing.assert_allclose(dphi, 0.0, atol=5e-4)


# --------------------------------------------------------------------------- #
# Signed kernels (the all-real SoS path): parity with the XLA composition,
# forward and backward, including the sign-zero (exact cancellation) case.
# --------------------------------------------------------------------------- #

def _signed_fallback_matmul(a, s, w):
    m = L._clamp_max(a)
    y = jnp.einsum("fbi,foi->fbo", s * jnp.exp(a - m), w)
    return jnp.log(jnp.abs(y)) + m, jnp.sign(y)


def _signed_fallback_tucker(a1, s1, a2, s2, w):
    k1, k2 = a1.shape[-1], a2.shape[-1]
    m1, m2 = L._clamp_max(a1), L._clamp_max(a2)
    w3 = w.reshape(w.shape[0], w.shape[1], k1, k2)
    y = jnp.einsum(
        "fbi,fbj,foij->fbo", s1 * jnp.exp(a1 - m1), s2 * jnp.exp(a2 - m2), w3
    )
    return jnp.log(jnp.abs(y)) + m1 + m2, jnp.sign(y)


def _signs(rng, shape):
    return jnp.asarray(rng.choice([-1.0, 1.0], size=shape), jnp.float32)


@pytest.mark.parametrize("b", [8, 13])
def test_slse_matmul_matches_fallback(b):
    from cirkit_tpu.ops.lse_einsum import slse_dispatch

    rng = np.random.default_rng(30)
    a = _rand(rng, (3, b, 32))
    s = _signs(rng, (3, b, 32))
    w = _weights(rng, (3, 16, 32))
    out = slse_dispatch((a, s), w, softmax=False, tucker=False)
    assert out is not None
    ra, rs = _signed_fallback_matmul(a, s, w)
    np.testing.assert_allclose(out[0], ra, rtol=RTOL, atol=ATOL)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(rs))


def test_slse_tucker2_softmax_matches_fallback():
    from cirkit_tpu.ops.lse_einsum import slse_dispatch

    rng = np.random.default_rng(31)
    a1, s1 = _rand(rng, (2, 8, 8)), _signs(rng, (2, 8, 8))
    a2, s2 = _rand(rng, (2, 8, 8)), _signs(rng, (2, 8, 8))
    th = _rand(rng, (2, 8, 64), scale=1.0, shift=0.0)
    out = slse_dispatch((a1, s1, a2, s2), th, softmax=True, tucker=True)
    assert out is not None
    ra, rs = _signed_fallback_tucker(a1, s1, a2, s2, jax.nn.softmax(th, axis=-1))
    np.testing.assert_allclose(out[0], ra, rtol=RTOL, atol=ATOL)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(rs))


@pytest.mark.slow
def test_slse_matmul_gradients_match_fallback():
    from cirkit_tpu.ops.lse_einsum import slse_dispatch

    rng = np.random.default_rng(32)
    a = _rand(rng, (2, 8, 32))
    s = _signs(rng, (2, 8, 32))
    w = _weights(rng, (2, 16, 32))

    def loss_k(a, w):
        oa, os_ = slse_dispatch((a, s), w, softmax=False, tucker=False)
        return jnp.sum(jnp.sin(oa) * os_)

    def loss_f(a, w):
        oa, os_ = _signed_fallback_matmul(a, s, w)
        return jnp.sum(jnp.sin(oa) * os_)

    gk = jax.grad(loss_k, argnums=(0, 1))(a, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(a, w)
    for x, y in zip(gk, gf):
        np.testing.assert_allclose(x, y, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_slse_tucker2_gradients_match_fallback_multi_tile(monkeypatch):
    from cirkit_tpu.ops import lse_einsum as LL

    monkeypatch.setattr(LL, "_VMEM_BUDGET", 48 * 1024)
    rng = np.random.default_rng(33)
    a1, s1 = _rand(rng, (1, 40, 8)), _signs(rng, (1, 40, 8))
    a2, s2 = _rand(rng, (1, 40, 8)), _signs(rng, (1, 40, 8))
    th = _rand(rng, (1, 8, 64), scale=1.0, shift=0.0)

    def loss_k(a1, a2, th):
        oa, os_ = LL.slse_dispatch((a1, s1, a2, s2), th, softmax=True, tucker=True)
        return jnp.sum(jnp.sin(oa) * os_)

    def loss_f(a1, a2, th):
        oa, os_ = _signed_fallback_tucker(a1, s1, a2, s2, jax.nn.softmax(th, axis=-1))
        return jnp.sum(jnp.sin(oa) * os_)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(a1, a2, th)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(a1, a2, th)
    for x, y in zip(gk, gf):
        np.testing.assert_allclose(x, y, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("softmax", [False, True], ids=["plain", "softmax"])
@pytest.mark.slow
def test_slse_bf16_weight_gradients(softmax):
    """Gradients through a bf16-resident weight store on the signed kernel:
    dL/dw accumulates in f32 in VMEM and is cast back to bf16 on exit
    (regression: the backward used to allocate dw as bf16 and crash with an
    'Invalid dtype for swap' error when storing the f32 accumulator)."""
    from cirkit_tpu.ops.lse_einsum import slse_dispatch

    rng = np.random.default_rng(34)
    a = _rand(rng, (2, 8, 32))
    s = _signs(rng, (2, 8, 32))
    if softmax:
        w32 = _rand(rng, (2, 16, 32), scale=1.0, shift=0.0)
    else:
        w32 = _weights(rng, (2, 16, 32))
    w16 = w32.astype(jnp.bfloat16)

    def loss_k(a, w):
        oa, os_ = slse_dispatch((a, s), w, softmax=softmax, tucker=False)
        return jnp.sum(jnp.sin(oa) * os_)

    def loss_f(a, w):
        wf = w.astype(jnp.float32)
        wf = jax.nn.softmax(wf, axis=-1) if softmax else wf
        oa, os_ = _signed_fallback_matmul(a, s, wf)
        return jnp.sum(jnp.sin(oa) * os_)

    ga_k, gw_k = jax.grad(loss_k, argnums=(0, 1))(a, w16)
    ga_f, gw_f = jax.grad(loss_f, argnums=(0, 1))(a, w16)
    assert gw_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(ga_k, ga_f, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        gw_k.astype(jnp.float32), gw_f.astype(jnp.float32), rtol=5e-2, atol=5e-2
    )


@pytest.mark.slow
def test_slse_exact_cancellation_sign_zero_no_nan():
    """Exact cancellation to 0 must give sign 0, log -inf, and finite (zero)
    gradients — the signed analogue of ComplexSafeLog."""
    from cirkit_tpu.ops.lse_einsum import slse_dispatch

    a = jnp.zeros((1, 8, 16), jnp.float32)
    s = jnp.asarray(np.tile([1.0, -1.0], 8), jnp.float32)[None, None, :].repeat(8, 1)
    w = jnp.ones((1, 8, 16), jnp.float32)
    oa, os_ = slse_dispatch((a, s), w, softmax=False, tucker=False)
    assert bool(jnp.all(os_ == 0.0))
    assert bool(jnp.all(jnp.isneginf(oa)))

    g = jax.grad(
        lambda a: jnp.sum(jnp.where(jnp.isfinite(oa), slse_dispatch((a, s), w, softmax=False, tucker=False)[0], 0.0))
    )(a)
    assert not bool(jnp.any(jnp.isnan(g)))


def test_sr_mode_parses_and_degrades_in_interpret(monkeypatch):
    """CIRKIT_TPU_FAST=sr: unbiased stochastic rounding on TPU; in CPU
    interpret mode (no pltpu PRNG lowering) it degrades to plain bf16 and
    must stay within the fast-mode bound."""
    monkeypatch.setenv("CIRKIT_TPU_FAST", "sr")
    assert L._fast_mode() == "sr"
    assert L._cfg_fast(interpret=True) == "bf16"
    assert L._cfg_fast(interpret=False) == "sr"
    rng = np.random.default_rng(50)
    x = _rand(rng, (2, 8, 64))
    w = _weights(rng, (2, 16, 64))
    out = L.lse_matmul(x, w)
    ref = _fallback_matmul(x, w)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


# --------------------------------------------------------------------------- #
# route_tucker2: the fused downward routing choice
# --------------------------------------------------------------------------- #


def _route_oracle(x1, x2, th, sel, log_weights):
    """numpy argmax over scores[m] = log w[sel, m] + x1[m//K2] + x2[m%K2]."""
    f, b, k1 = x1.shape
    k2 = x2.shape[2]
    lw = np.asarray(th, np.float64) if log_weights else np.log(np.asarray(th, np.float64))
    comb = (
        np.asarray(x1, np.float64)[:, :, :, None] + np.asarray(x2, np.float64)[:, :, None, :]
    ).reshape(f, b, k1 * k2)
    scores = np.stack(
        [lw[ff][np.asarray(sel)[ff]] for ff in range(f)]
    ) + comb
    return np.argmax(scores, axis=2)


@pytest.mark.parametrize("b", [8, 13])  # 13 exercises batch padding
@pytest.mark.parametrize("log_weights", [True, False], ids=["logits", "linear"])
def test_route_tucker2_max_matches_oracle(b, log_weights):
    rng = np.random.default_rng(70)
    f, k, o = 3, 16, 16
    x1 = _rand(rng, (f, b, k), scale=5.0, shift=-30.0)
    x2 = _rand(rng, (f, b, k), scale=5.0, shift=-30.0)
    if log_weights:
        th = _rand(rng, (f, o, k * k), scale=1.5, shift=0.0)
    else:
        th = _weights(rng, (f, o, k * k))
    sel = jnp.asarray(rng.integers(0, o, size=(f, b)), jnp.int32)
    got = L.route_tucker2(x1, x2, th, sel, kind="max", log_weights=log_weights)
    assert got is not None
    want = _route_oracle(x1, x2, th, sel, log_weights)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_route_tucker2_sample_falls_back_in_interpret():
    """The sample variant needs the hardware PRNG: in interpret mode the
    dispatch must return None so callers use the XLA draw."""
    rng = np.random.default_rng(71)
    x1 = _rand(rng, (1, 8, 16))
    x2 = _rand(rng, (1, 8, 16))
    th = _rand(rng, (1, 8, 256), scale=1.0, shift=0.0)
    sel = jnp.zeros((1, 8), jnp.int32)
    assert (
        L.route_tucker2(x1, x2, th, sel, kind="sample", log_weights=True, seed=jnp.int32(1))
        is None
    )
    # ... and the max variant on the same shapes does run
    assert L.route_tucker2(x1, x2, th, sel, kind="max", log_weights=True) is not None


@pytest.mark.parametrize("b", [8, 13])
@pytest.mark.parametrize("log_weights", [True, False], ids=["logits", "linear"])
def test_tropical_tucker2_matches_fallback(b, log_weights):
    rng = np.random.default_rng(72)
    f, k, o = 3, 16, 16
    x1 = _rand(rng, (f, b, k), scale=4.0, shift=-10.0)
    x2 = _rand(rng, (f, b, k), scale=4.0, shift=-10.0)
    if log_weights:
        th = _rand(rng, (f, o, k * k), scale=1.5, shift=0.0)
        lw = jax.nn.log_softmax(th, axis=-1)
    else:
        th = _weights(rng, (f, o, k * k))
        lw = jnp.log(th)
    got = L.tropical_tucker2(x1, x2, th, log_weights=log_weights)
    assert got is not None
    comb = (x1[:, :, :, None] + x2[:, :, None, :]).reshape(f, b, k * k)
    want = jnp.max(lw[:, None, :, :] + comb[:, :, None, :], axis=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_route_tucker2_max_with_neg_inf_child():
    """A -inf child log-value (zero-probability observation) must not
    poison the row: the kernel floors it before the bf16 splits and the
    choice matches the oracle computed with true -inf."""
    rng = np.random.default_rng(73)
    f, b, k, o = 2, 8, 16, 16
    x1 = _rand(rng, (f, b, k), scale=2.0, shift=-5.0)
    x2 = _rand(rng, (f, b, k), scale=2.0, shift=-5.0)
    x1 = x1.at[0, 3, 5].set(-jnp.inf)
    x1 = x1.at[1, 0, :8].set(-jnp.inf)
    th = _rand(rng, (f, o, k * k), scale=1.0, shift=0.0)
    sel = jnp.asarray(rng.integers(0, o, size=(f, b)), jnp.int32)
    got = L.route_tucker2(x1, x2, th, sel, kind="max", log_weights=True)
    assert got is not None
    want = _route_oracle(x1, x2, th, sel, True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_route_tucker2_zero_linear_weights_unroutable():
    """Zero linear weights must never win the routing (the XLA fallback's
    safelog gives them -inf); log(tiny) ~ -87 would be overtaken by an
    ~100-nat composite gap."""
    f, b, k, o = 1, 8, 16, 8
    x1 = jnp.full((f, b, k), -200.0, jnp.float32).at[:, :, 0].set(0.0)
    x2 = jnp.full((f, b, k), -200.0, jnp.float32).at[:, :, 0].set(0.0)
    th = jnp.zeros((f, o, k * k), jnp.float32)
    # weight mass ONLY on composite (1,1), which has comb = -400; composite
    # (0,0) has comb = 0 but zero weight — it must still never be chosen
    th = th.at[:, :, k + 1].set(1.0)
    sel = jnp.zeros((f, b), jnp.int32)
    got = L.route_tucker2(x1, x2, th, sel, kind="max", log_weights=False)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), np.full((f, b), k + 1))


def test_route_tucker2_max_with_neg_inf_logits():
    """-inf logits (explicit zero mixture weights) must not NaN the split:
    the kernel floors them like -inf child values (regression)."""
    rng = np.random.default_rng(74)
    f, b, k, o = 2, 8, 16, 16
    x1 = _rand(rng, (f, b, k), scale=2.0, shift=-5.0)
    x2 = _rand(rng, (f, b, k), scale=2.0, shift=-5.0)
    th = _rand(rng, (f, o, k * k), scale=1.0, shift=0.0)
    th = th.at[0, 5, 7].set(-jnp.inf).at[1, :, 100].set(-jnp.inf)
    sel = jnp.asarray(rng.integers(0, o, size=(f, b)), jnp.int32)
    got = L.route_tucker2(x1, x2, th, sel, kind="max", log_weights=True)
    assert got is not None
    want = _route_oracle(x1, x2, th, sel, True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_wide_tucker_routes_to_blocked_kernel():
    """K=128 Tucker (i = 16384): the fused kernel's true VMEM footprint is
    weight-dominant and exceeds the scoped limit — dispatch must reject it
    (regression: it was accepted and Mosaic OOM'd at compile time on TPU)
    and the composite + blocked-matmul path must produce correct values."""
    rng = np.random.default_rng(75)
    f, b, k, o = 2, 16, 128, 128
    x1 = _rand(rng, (f, b, k))
    x2 = _rand(rng, (f, b, k))
    w = _weights(rng, (f, o, k * k))
    # the unblocked fused path must decline this shape
    x12 = (x1[:, :, :, None] + x2[:, :, None, :]).reshape(f, b, k * k)
    assert L._dispatch((x12,), w, softmax=False, tucker=False, interpret=True) is None
    assert L._dispatch((x1, x2), w, softmax=False, tucker=True, interpret=True) is None
    # ... and the public entry still computes correctly (blocked kernel)
    out = L.lse_tucker2(x1, x2, w)
    ref = _fallback_tucker(x1, x2, w)
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.slow
def test_blocked_matmul_accepts_bf16_weights(monkeypatch):
    """Wide contractions with a bf16-resident weight store must stay on the
    blocked kernel (not fall to the dense XLA composition), and gradients
    accumulate in f32 before casting back (regression pair)."""
    monkeypatch.setattr(L, "_VMEM_BUDGET", 48 * 1024)  # force blocking
    rng = np.random.default_rng(76)
    x = _rand(rng, (2, 8, 2048))
    w32 = _weights(rng, (2, 16, 2048))
    w16 = w32.astype(jnp.bfloat16)
    out = L._dispatch_blocked(x, w16, interpret=True)
    assert out is not None
    ref = _fallback_matmul(x, w16.astype(jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    def loss_k(x, w):
        return jnp.sum(jnp.sin(L._dispatch_blocked(x, w, interpret=True)))

    def loss_f(x, w):
        return jnp.sum(jnp.sin(_fallback_matmul(x, w.astype(jnp.float32))))

    gx_k, gw_k = jax.grad(loss_k, argnums=(0, 1))(x, w16)
    gx_f, gw_f = jax.grad(loss_f, argnums=(0, 1))(x, w16)
    assert gw_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(gx_k, gx_f, rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(
        gw_k.astype(jnp.float32), gw_f.astype(jnp.float32), rtol=6e-2, atol=6e-2
    )


# --------------------------------------------------------------------------- #
# k1-chunked fused Tucker kernel (K >= 128; VERDICT r4 item 2)
# --------------------------------------------------------------------------- #


def _f64_tucker(x1, x2, w, softmax):
    x1 = np.asarray(x1, np.float64)
    x2 = np.asarray(x2, np.float64)
    w = np.asarray(w, np.float64)
    if softmax:
        w = np.exp(w - w.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
    f, b, k1 = x1.shape
    k2 = x2.shape[2]
    x12 = (x1[:, :, :, None] + x2[:, :, None, :]).reshape(f, b, k1 * k2)
    m = x12.max(-1, keepdims=True)
    return np.log(np.einsum("fbm,fom->fbo", np.exp(x12 - m), w)) + m


@pytest.mark.parametrize("softmax", [False, True])
@pytest.mark.parametrize(
    "shape", [(2, 16, 128, 128, 64), (1, 13, 128, 64, 16), (1, 8, 256, 128, 32)]
)
def test_chunked_tucker_matches_f64(shape, softmax):
    """The k1-chunked kernel (weight streamed in K1 chunks, global shift,
    online softmax) against a float64 oracle — 1e-4 nats, the f32 exp cap."""
    f, b, k1, k2, o = shape
    rng = np.random.default_rng(7)
    x1 = _rand(rng, (f, b, k1))
    x2 = _rand(rng, (f, b, k2))
    w = (
        _rand(rng, (f, o, k1 * k2), scale=2.0, shift=0.0)
        if softmax
        else _weights(rng, (f, o, k1 * k2))
    )
    got = L._dispatch_tucker_chunked((x1, x2), w, softmax=softmax, interpret=True)
    assert got is not None, "chunked kernel must engage at these shapes"
    want = _f64_tucker(x1, x2, w, softmax)
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=0, atol=1e-4)


def test_chunked_tucker_serves_public_wrappers(monkeypatch):
    """lse_tucker2(_softmax) at K=128 widths lands on the chunked kernel,
    not the materialized-composite fallback."""
    calls = []
    orig = L._dispatch_tucker_chunked

    def spy(*a, **k):
        out = orig(*a, **k)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(L, "_dispatch_tucker_chunked", spy)
    rng = np.random.default_rng(3)
    x1 = _rand(rng, (1, 8, 128))
    x2 = _rand(rng, (1, 8, 128))
    th = _rand(rng, (1, 64, 128 * 128), scale=1.0, shift=0.0)
    out = L.lse_tucker2_softmax(x1, x2, th)
    assert calls == [True]
    ref = _fallback_tucker(x1, x2, jax.nn.softmax(th, axis=-1))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("softmax", [False, True])
def test_chunked_tucker_gradients_match_composition(softmax):
    """The custom-VJP backward (XLA composition) against HIGHEST-precision
    autodiff of the same math."""
    f, b, k1, k2, o = 1, 8, 128, 128, 16
    rng = np.random.default_rng(11)
    x1 = _rand(rng, (f, b, k1))
    x2 = _rand(rng, (f, b, k2))
    w = (
        _rand(rng, (f, o, k1 * k2), scale=1.0, shift=0.0)
        if softmax
        else _weights(rng, (f, o, k1 * k2))
    )

    def loss_kernel(x1, x2, w):
        out = L._dispatch_tucker_chunked((x1, x2), w, softmax=softmax, interpret=True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_ref(x1, x2, w):
        ww = jax.nn.softmax(w, axis=-1) if softmax else w
        x12 = (x1[:, :, :, None] + x2[:, :, None, :]).reshape(f, b, k1 * k2)
        m = L._clamp_max(x12)
        y = jnp.einsum(
            "fbm,fom->fbo", jnp.exp(x12 - m), ww,
            precision=jax.lax.Precision.HIGHEST,
        )
        out = jnp.log(y) + m
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(x1, x2, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x1, x2, w)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3)


def test_chunked_tucker_all_neg_inf_row_yields_no_nan():
    """Rows that are entirely log-zero stay NaN-free (the clamped global
    shift), matching the unchunked kernel's behavior."""
    rng = np.random.default_rng(5)
    x1 = _rand(rng, (1, 8, 128))
    x2 = _rand(rng, (1, 8, 128))
    x1 = x1.at[0, 3].set(-jnp.inf)
    w = _weights(rng, (1, 16, 128 * 128))
    out = L._dispatch_tucker_chunked((x1, x2), w, softmax=False, interpret=True)
    assert out is not None
    assert not np.isnan(np.asarray(out)).any()
    assert np.all(np.asarray(out)[0, 3] == -np.inf)
