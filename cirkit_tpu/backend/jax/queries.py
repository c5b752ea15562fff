"""Queries over compiled circuits: per-sample marginals and sampling.

Rebuild of ``cirkit/backend/torch/queries.py:19-275``, jit-native: both
queries compile to *plan variants* of the same evaluation plan — the same
step list with input-layer steps swapped. The integration mask is a runtime
argument, so one jitted function serves all per-sample marginal queries
without recompilation.
"""

from __future__ import annotations

from abc import ABC
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cirkit_tpu.backend.jax.circuit import JaxCircuit
from cirkit_tpu.backend.jax.layers import JaxInnerLayer, JaxInputLayer, JaxLayer
from cirkit_tpu.backend.jax.parameters import Store
from cirkit_tpu.utils.scope import Scope


class Query(ABC):
    """A query object over a compiled circuit."""


class IntegrateQuery(Query):
    """Per-sample marginalization without recompiling: input-layer steps
    select between the layer's output and its integral with a (B, D) boolean
    mask passed at run time."""

    def __init__(self, circuit: JaxCircuit) -> None:
        if not (circuit.properties.smooth and circuit.properties.decomposable):
            raise ValueError(
                f"The circuit to integrate must be smooth and decomposable, "
                f"but found {circuit.properties}"
            )
        self._circuit = circuit

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        integrate_vars: jnp.ndarray | np.ndarray | Scope | Sequence[Scope],
        store: Store | None = None,
    ) -> jnp.ndarray:
        """Evaluate marginals: ``integrate_vars`` is a (B, D) or (D,) boolean
        mask (True = marginalized), a Scope, or a sequence of Scopes of
        length 1 or B."""
        cc = self._circuit
        if isinstance(integrate_vars, (jnp.ndarray, np.ndarray)):
            mask = jnp.asarray(integrate_vars)
            if mask.dtype != jnp.bool_:
                raise ValueError(f"Expected a boolean mask, found dtype {mask.dtype}")
            if mask.ndim == 1:
                mask = mask[None]
            num_vars = max(cc.scope) + 1
            if mask.shape[1] != num_vars:
                raise ValueError(
                    f"The circuit scope has {num_vars} variables, but the mask "
                    f"covers {mask.shape[1]}"
                )
        else:
            mask = jnp.asarray(IntegrateQuery.scopes_to_mask(cc, integrate_vars))
        if mask.shape[0] not in (1, x.shape[0]):
            raise ValueError(
                "The number of integration scopes must be 1 (broadcast) or "
                f"match the batch size: found {mask.shape[0]} != {x.shape[0]}"
            )
        if mask.shape[0] == 1:
            mask = jnp.broadcast_to(mask, (x.shape[0], mask.shape[1]))

        if store is None:
            store = getattr(cc, "default_store", None)
            if store is None:
                raise ValueError("No parameter store bound; pass store=...")
        store = cc.restrict_store(store)

        # The jitted variant is cached on the circuit, not the query object:
        # constructing a fresh IntegrateQuery(cc) must not pay a retrace
        # (2-7 s per program on the remote-compile TPU backend).
        fn = getattr(cc, "_integrate_jit", None)
        if fn is None:
            def _run(st, xx, mk):
                def layer_fn(layer: JaxLayer, s, xin):
                    out = layer(s, xin)
                    if not isinstance(layer, JaxInputLayer) or layer.num_variables == 0:
                        return out
                    if layer.num_variables > 1:
                        raise NotImplementedError(
                            "Integration of multivariate input layers is not supported"
                        )
                    # mask gathered at the layer's scope: (B, F, 1) -> (F, B, 1)
                    m = jnp.transpose(mk[:, layer.scope_idx[:, 0]], (1, 0))[:, :, None]
                    return jax.tree_util.tree_map(
                        lambda iz, o: jnp.where(m, iz[:, None, :], o),
                        layer.integrate(s),
                        out,
                    )

                return cc.evaluate(st, xx, module_fn=layer_fn)

            fn = jax.jit(_run)
            cc._integrate_jit = fn
        return fn(store, jnp.asarray(x), mask)

    @staticmethod
    def scopes_to_mask(
        circuit: JaxCircuit, batch_integrate_vars: Scope | Sequence[Scope]
    ) -> np.ndarray:
        """Scopes -> (B, num_vars) boolean mask."""
        if isinstance(batch_integrate_vars, Scope):
            batch_integrate_vars = [batch_integrate_vars]
        num_vars = max(circuit.scope) + 1
        mask = np.zeros((len(batch_integrate_vars), num_vars), dtype=bool)
        for i, scope in enumerate(batch_integrate_vars):
            invalid = Scope(scope) - circuit.scope
            if invalid:
                raise ValueError(
                    "The variables to marginalize must be a subset of the circuit "
                    f"scope; invalid variables: {list(invalid)}"
                )
            mask[i, list(scope)] = True
        return mask


class SamplingQuery(Query):
    """Ancestral sampling through the evaluation plan: input layers sample
    their units' distributions, product layers combine disjoint assignments,
    sum layers draw latent mixture indices and route child samples."""

    def __init__(self, circuit: JaxCircuit) -> None:
        if not (circuit.properties.smooth and circuit.properties.decomposable):
            raise ValueError(
                f"The circuit to sample from must be smooth and decomposable, "
                f"but found {circuit.properties}"
            )
        self._circuit = circuit
        # shared across query objects: one traced program per sample count
        if not hasattr(circuit, "_sampling_jit"):
            circuit._sampling_jit = {}
        self._jit_cache: dict[int, object] = circuit._sampling_jit

    def __call__(
        self, num_samples: int = 1, *, key: jax.Array | None = None, store: Store | None = None
    ) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
        """Draw samples: returns (samples of shape (N, D), per-layer latent
        mixture samples)."""
        if num_samples <= 0:
            raise ValueError("The number of samples must be a positive number")
        cc = self._circuit
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        if store is None:
            store = getattr(cc, "default_store", None)
            if store is None:
                raise ValueError("No parameter store bound; pass store=...")
        store = cc.restrict_store(store)
        num_vars = max(cc.scope) + 1

        if num_samples not in self._jit_cache:

            def _run(st, k):
                mixtures: list[jnp.ndarray] = []
                keys = iter(jax.random.split(k, len(cc.layers)))

                def layer_fn(layer: JaxLayer, s, xin):
                    lk = next(keys)
                    if isinstance(layer, JaxInputLayer):
                        samples = layer.sample(s, lk, num_samples)  # (F, K, N)
                        return _pad_samples(samples, layer.scope_idx, num_vars)
                    assert isinstance(layer, JaxInnerLayer)
                    out, mix = layer.sample(s, lk, xin)
                    if mix is not None:
                        mixtures.append(mix)
                    return out

                out = cc.evaluate_raw(st, None, module_fn=layer_fn)  # (O, K, N, D)
                return out, tuple(mixtures)

            self._jit_cache[num_samples] = jax.jit(_run)
        out, mixtures = self._jit_cache[num_samples](store, key)
        samples = jnp.transpose(out, (2, 0, 1, 3))[:, 0, 0]  # (N, D)
        return samples, list(mixtures)

    def conditional(
        self,
        x: jnp.ndarray | np.ndarray,
        *,
        evidence_mask: jnp.ndarray | np.ndarray,
        key: jax.Array | None = None,
        store: Store | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior sampling given evidence — an extension: the reference
        documents this as not implemented (ref: ``queries.py:191-194``).

        Draws one completion per row: free entries of ``x`` (where
        ``evidence_mask`` is False) are replaced by a sample from
        ``p(x_free | x_obs)``. Returns ``(samples (B, D), log_evidence
        (B,))`` where the value is ``log p(x_obs)`` (free variables
        marginalized). One jitted program serves every mask; tile rows to
        draw several completions of the same evidence. Requires normalized
        sum weights and the ``lse-sum`` semiring (as :class:`MAPQuery`).
        """
        from cirkit_tpu.backend.jax.semiring import LSESumSemiring

        cc = self._circuit
        if cc.semiring is not LSESumSemiring:
            raise ValueError(
                "Conditional sampling requires a circuit compiled under the "
                f"'lse-sum' semiring, found {cc.semiring.__name__}"
            )
        num_vars = max(cc.scope) + 1
        x = jnp.asarray(x)
        mask = _evidence_to_mask(cc, evidence_mask, x.shape[0])
        if mask.shape[1] != num_vars:
            raise ValueError(
                f"The circuit scope has {num_vars} variables, but the mask "
                f"covers {mask.shape[1]}"
            )
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        if store is None:
            store = getattr(cc, "default_store", None)
            if store is None:
                raise ValueError("No parameter store bound; pass store=...")
        store = cc.restrict_store(store)

        fn = getattr(cc, "_cond_sampling_jit", None)
        if fn is None:
            fn = jax.jit(_build_routing_run(cc, "sample"))
            cc._cond_sampling_jit = fn
        vals, asgs = fn(store, x, mask, key)  # (O, K, B), (O, K, B, D)
        return asgs[0, 0], vals[0, 0]


def _pad_samples(samples: jnp.ndarray, scope_idx: np.ndarray, num_vars: int) -> jnp.ndarray:
    """Scatter univariate per-unit samples (F, K, N) into zero-padded
    assignments (F, K, N, D) at the layer's variable positions."""
    if scope_idx.shape[1] != 1:
        raise NotImplementedError("Padding is only implemented for univariate samples")
    one_hot = jax.nn.one_hot(scope_idx[:, 0], num_vars, dtype=samples.dtype)  # (F, D)
    return samples[:, :, :, None] * one_hot[:, None, None, :]


class MAPQuery(Query):
    """Max-product MPE (most-probable-explanation) through the evaluation
    plan — an extension beyond the reference, whose only queries are
    integration and sampling (ref: ``backend/torch/queries.py:19-275``).

    Sum-style layers take the *max* over their mixture inputs instead of
    the sum and route the argmax child's assignment upward; input layers
    contribute their per-unit mode. With evidence, observed variables
    contribute their data log-likelihood instead, so the query completes
    partial assignments: ``argmax_{x_miss} p(x_miss, x_obs)`` per sample
    (image inpainting, classification under missing features, ...). The
    evidence mask is a runtime argument — one jitted program serves every
    query, like :class:`IntegrateQuery`.

    Exact on deterministic (selective) circuits; otherwise the standard
    max-product approximation, where the returned log-value is the weight
    of the best latent parse — a lower bound on the returned assignment's
    true log-probability. Requires normalized non-negative sum weights
    (the latent-variable semantics :class:`SamplingQuery` also assumes)
    and a circuit compiled under the ``lse-sum`` semiring.
    """

    def __init__(self, circuit: JaxCircuit) -> None:
        from cirkit_tpu.backend.jax.semiring import LSESumSemiring

        if not (circuit.properties.smooth and circuit.properties.decomposable):
            raise ValueError(
                f"The circuit to maximize must be smooth and decomposable, "
                f"but found {circuit.properties}"
            )
        if circuit.semiring is not LSESumSemiring:
            raise ValueError(
                "MAPQuery requires a circuit compiled under the 'lse-sum' "
                f"semiring, found {circuit.semiring.__name__}"
            )
        self._circuit = circuit

    def __call__(
        self,
        x: jnp.ndarray | np.ndarray | None = None,
        *,
        evidence_mask: jnp.ndarray | np.ndarray | None = None,
        store: Store | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Compute MPE states: returns ``(assignments (B, D), log_values
        (B,))``. Unconditional when ``x`` is None (B=1); otherwise
        ``evidence_mask`` — a (B, D)/(D,) boolean mask, a Scope, or a
        sequence of Scopes (like IntegrateQuery) — marks the *observed*
        entries of ``x`` and free variables are maximized per sample."""
        cc = self._circuit
        num_vars = max(cc.scope) + 1
        if x is None:
            if evidence_mask is not None:
                raise ValueError("evidence_mask requires an input batch x")
            x = jnp.zeros((1, num_vars))
            mask = jnp.zeros((1, num_vars), dtype=bool)
        else:
            if evidence_mask is None:
                raise ValueError(
                    "Pass evidence_mask marking the observed entries of x "
                    "(an all-False mask reproduces the unconditional query)"
                )
            x = jnp.asarray(x)
            mask = _evidence_to_mask(cc, evidence_mask, x.shape[0])
        if store is None:
            store = getattr(cc, "default_store", None)
            if store is None:
                raise ValueError("No parameter store bound; pass store=...")
        store = cc.restrict_store(store)

        fn = getattr(cc, "_map_jit", None)
        if fn is None:
            fn = jax.jit(_build_routing_run(cc, "max"))
            cc._map_jit = fn
        vals, asgs = fn(store, x, mask)  # (O, K, B), (O, K, B, D)
        return asgs[0, 0], vals[0, 0]


def _evidence_to_mask(cc: JaxCircuit, evidence_mask, batch: int) -> jnp.ndarray:
    """Normalize an evidence specification — boolean array (B, D)/(D,), a
    Scope, or a sequence of Scopes of length 1 or B — to a (B, D) mask."""
    if isinstance(evidence_mask, (jnp.ndarray, np.ndarray)):
        mask = jnp.asarray(evidence_mask)
        if mask.dtype != jnp.bool_:
            raise ValueError(f"Expected a boolean mask, found dtype {mask.dtype}")
        if mask.ndim == 1:
            mask = jnp.broadcast_to(mask[None], (batch, mask.shape[0]))
    else:
        mask = jnp.asarray(IntegrateQuery.scopes_to_mask(cc, evidence_mask))
    if mask.shape[0] == 1 and batch != 1:
        mask = jnp.broadcast_to(mask, (batch, mask.shape[1]))
    if mask.shape[0] != batch:
        raise ValueError(
            f"The evidence mask covers {mask.shape[0]} samples, expected {batch}"
        )
    return mask


def _build_routing_run(cc: JaxCircuit, kind: str):
    """The shared bottom-up routing pass behind :class:`MAPQuery`
    (``kind="max"``) and conditional sampling (``kind="sample"``).

    Every layer carries a ``(values (F, K, B), assignments (F, K, B, D))``
    pair upward: values are log-space layer outputs with observed variables
    contributing their data likelihood and free variables their mode
    (``max``) or their marginal (``sample``); sum-style layers route the
    argmax (``max``) or a posterior draw ``i ~ softmax(log w_i + val_i)``
    (``sample``) of their mixture inputs. The recursion is exactly the
    posterior factorization of a smooth decomposable circuit, which is what
    makes the single upward pass correct for conditional sampling.
    """
    from cirkit_tpu.backend.jax.layers import (
        JaxConstantInputLayer,
        JaxHadamardLayer,
        JaxKroneckerLayer,
        JaxSumLayer,
    )
    from cirkit_tpu.backend.jax.optimized import (
        JaxCPTLayer,
        JaxTensorDotLayer,
        JaxTuckerLayer,
    )
    from cirkit_tpu.backend.jax.utils import safelog

    num_vars = max(cc.scope) + 1
    name = "MAP" if kind == "max" else "Conditional sampling"

    def _route(w, val, asg, key):
        """Route through a (F, O, M) weight: val (F, M, B), asg
        (F, M, B, D) -> (F, O, B), (F, O, B, D)."""
        scores = safelog(w)[:, :, :, None] + val[:, None, :, :]  # (F, O, M, B)
        if kind == "max":
            idx = jnp.argmax(scores, axis=2)  # (F, O, B)
            out_val = jnp.max(scores, axis=2)
        else:
            idx = jax.random.categorical(key, scores, axis=2)
            out_val = jax.scipy.special.logsumexp(scores, axis=2)
        f_idx = jnp.arange(asg.shape[0])[:, None, None]
        b_idx = jnp.arange(asg.shape[2])[None, None, :]
        return out_val, asg[f_idx, idx, b_idx]

    def _combine(val, asg):
        """Kronecker-combine arity inputs row-major: (F, H, K, B) ->
        (F, K^H, B) by addition (disjoint scopes)."""
        v, a = val[:, 0], asg[:, 0]
        for h in range(1, val.shape[1]):
            f, _, b = v.shape
            v = (v[:, :, None, :] + val[:, h][:, None, :, :]).reshape(f, -1, b)
            a = (a[:, :, None] + asg[:, h][:, None]).reshape(f, -1, b, num_vars)
        return v, a

    def _route_tensordot(layer, w, val, asg, key):
        """Route through one Monarch half: input unit i = (j, q) row-major
        over (Kj, Kq); output unit o = (q, k) row-major over (Kq, Kk) with
        ``out[q*Kk+k] = over_j w[k, j] . in[j*Kq+q]`` (see
        JaxTensorDotLayer.forward). Each (k, q) output mixes over j only, so
        the two chained halves realize the Kronecker-factored sum's mixture
        as nested independent choices — max and ancestral draws both
        factorize exactly."""
        f, m, bsz = val.shape
        kk, kj = w.shape[1:]
        kq = m // kj
        v = val.reshape(f, kj, kq, bsz)
        scores = safelog(w)[:, :, :, None, None] + v[:, None, :, :, :]  # (F,Kk,Kj,Kq,B)
        if kind == "max":
            idx = jnp.argmax(scores, axis=2)  # (F, Kk, Kq, B)
            out_val = jnp.max(scores, axis=2)
        else:
            idx = jax.random.categorical(key, scores, axis=2)
            out_val = jax.scipy.special.logsumexp(scores, axis=2)
        child = idx * kq + jnp.arange(kq)[None, None, :, None]  # flat input index
        f_idx = jnp.arange(f)[:, None, None, None]
        b_idx = jnp.arange(bsz)[None, None, None, :]
        picked = asg[f_idx, child, b_idx]  # (F, Kk, Kq, B, D)
        out_val = jnp.transpose(out_val, (0, 2, 1, 3)).reshape(f, kq * kk, bsz)
        out_asg = jnp.transpose(picked, (0, 2, 1, 3, 4)).reshape(f, kq * kk, bsz, num_vars)
        return out_val, out_asg

    def _run(st, xx, mk, key=None):
        keys = iter(jax.random.split(key, 2 * len(cc.layers))) if key is not None else None

        def layer_fn(layer: JaxLayer, s, xin):
            lk = next(keys) if keys is not None else None
            if isinstance(layer, JaxConstantInputLayer):
                raise NotImplementedError(
                    f"{name} is not supported for {type(layer).__name__}"
                )
            if isinstance(layer, JaxInputLayer):
                if layer.num_variables != 1:
                    raise NotImplementedError(
                        f"{name} of multivariate input layers is not supported"
                    )
                obs_val = jnp.transpose(layer(s, xin), (0, 2, 1))  # (F, K, B)
                b = obs_val.shape[2]
                if kind == "max":
                    free_val, free_arg = layer.mpe(s)  # (F, K)
                    free_val = free_val[:, :, None]
                    free_arg = free_arg.astype(obs_val.dtype)[:, :, None]
                else:
                    # free variables: marginalized in the values, drawn from
                    # the unit's local distribution in the assignments (the
                    # latent path carries all dependence on the evidence)
                    free_val = layer.integrate(s)[:, :, None]  # (F, K, 1)
                    free_arg = layer.sample(s, lk, b).astype(obs_val.dtype)  # (F, K, B)
                xi = xin[..., 0].astype(obs_val.dtype)  # (F, B)
                m = jnp.transpose(mk[:, layer.scope_idx[:, 0]], (1, 0))[:, None, :]
                val = jnp.where(m, obs_val, free_val)
                arg = jnp.where(m, xi[:, None, :], free_arg)  # (F, K, B)
                one_hot = jax.nn.one_hot(
                    layer.scope_idx[:, 0], num_vars, dtype=obs_val.dtype
                )  # (F, D)
                return val, arg[..., None] * one_hot[:, None, None, :]
            val, asg = xin  # (F, H, K, B), (F, H, K, B, D)
            if isinstance(layer, JaxHadamardLayer):
                return val.sum(axis=1), asg.sum(axis=1)
            if isinstance(layer, JaxKroneckerLayer):
                return _combine(val, asg)
            if isinstance(layer, JaxTuckerLayer):
                v, a = _combine(val, asg)
                return _route(layer.weight(s), v, a, lk)
            if isinstance(layer, JaxCPTLayer):
                return _route(layer.weight(s), val.sum(axis=1), asg.sum(axis=1), lk)
            if isinstance(layer, JaxSumLayer):
                f, h, k, b = val.shape
                return _route(
                    layer.weight(s),
                    val.reshape(f, h * k, b),
                    asg.reshape(f, h * k, b, num_vars),
                    lk,
                )
            if isinstance(layer, JaxTensorDotLayer):
                return _route_tensordot(layer, layer.weight(s), val[:, 0], asg[:, 0], lk)
            raise NotImplementedError(
                f"{name} is not supported for {type(layer).__name__}"
            )

        return cc.evaluate_raw(st, xx, module_fn=layer_fn)

    return _run
