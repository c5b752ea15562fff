"""Numerics helpers for the JAX backend.

Safe logarithms with custom gradients, mirroring the reference's
``SafeLog``/``ComplexSafeLog`` autograd functions
(``cirkit/backend/torch/utils.py:10-50``): the gradient of ``log`` at 0 is
replaced by 0 instead of NaN/inf, which squared non-monotonic circuits rely
on (cancellations under-flow to exactly 0 + 0j in float32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def default_real_dtype() -> jnp.dtype:
    """The ambient real dtype: float64 under jax_enable_x64, else float32."""
    return jax.dtypes.canonicalize_dtype(jnp.float64)


def default_int_dtype() -> jnp.dtype:
    """The ambient integer dtype: int64 under jax_enable_x64, else int32."""
    return jax.dtypes.canonicalize_dtype(jnp.int64)


def default_complex_dtype() -> jnp.dtype:
    """The ambient complex dtype: complex128 under jax_enable_x64, else complex64."""
    return jax.dtypes.canonicalize_dtype(jnp.complex128)


def to_complex_dtype(dtype) -> jnp.dtype:
    """The complex dtype matching a real dtype's precision."""
    return jnp.result_type(jnp.zeros((), dtype=dtype), jnp.zeros((), dtype=jnp.complex64))


@jax.custom_vjp
def safelog(x: jax.Array) -> jax.Array:
    """log(x) whose gradient nan/inf values are zeroed."""
    return jnp.log(x)


def _safelog_fwd(x):
    return jnp.log(x), (x,)


def _safelog_bwd(res, g):
    (x,) = res
    grad = g / x
    return (jnp.nan_to_num(grad, nan=0.0, posinf=0.0, neginf=0.0),)


safelog.defvjp(_safelog_fwd, _safelog_bwd)


@jax.custom_vjp
def csafelog(x: jax.Array) -> jax.Array:
    """Complex log(x) with the conjugate-gradient convention and nan/inf
    gradient values replaced by zero (ref rationale: ``semiring.py:467-476``)."""
    return jnp.log(x)


def _csafelog_fwd(x):
    return jnp.log(x), (x,)


def _csafelog_bwd(res, g):
    (x,) = res
    # JAX's VJP rule for holomorphic primitives is plain ct * df/dz — the
    # conjugation of torch's convention (ref ``utils.py:47`` uses
    # grad / x.conj()) is already folded into how JAX represents complex
    # cotangents, so adding another conj here would flip the imaginary part
    # of every gradient (verified against jax.vjp(jnp.log)).
    grad = g / x
    grad = jnp.where(jnp.isfinite(grad.real) & jnp.isfinite(grad.imag), grad, 0.0 + 0.0j)
    return (grad,)


csafelog.defvjp(_csafelog_fwd, _csafelog_bwd)
