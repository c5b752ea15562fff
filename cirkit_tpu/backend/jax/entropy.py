"""Exact Shannon entropy of (deterministic) circuit distributions.

An extension beyond the reference, whose query surface is integration and
sampling only (ref: ``cirkit/backend/torch/queries.py:19-275``). For a
smooth, decomposable, **deterministic** circuit (every sum's children have
disjoint supports — e.g. compiled logic/SDD circuits, decision-diagram
style models) the entropy of the normalized distribution computes exactly
in ONE bottom-up pass (Vergari et al., "A Compositional Atlas of Tractable
Circuit Operations", NeurIPS 2021):

- leaf unit: closed-form entropy of the normalized unit distribution;
- product: entropies add (children have disjoint scopes);
- deterministic sum: ``H_o = sum_m pi_m H_m - sum_m pi_m log pi_m`` with
  ``pi_m = w_om Z_m / Z_o`` the normalized mixture posterior.

On a NON-deterministic circuit the same recursion returns the joint
entropy of (latent parse, x) — ``H(x) + H(parse | x) >= H(x)`` — i.e. a
sound **upper bound** (exact entropy of non-deterministic circuits is
#P-hard). The docstrings and tests state both regimes.

The pass carries a per-unit ``(log Z, H)`` pair through the evaluation
plan in ``(F, B, K)`` layout; every mixture reduction is a guarded
exp-weighted matmul (no ``(F, B, O, M)`` score materialization), so the
conditional form scales to the flagship like IntegrateQuery does. With
evidence, observed leaves contribute ``(log p(x_v), 0)`` and the result is
the per-sample **posterior entropy** ``H(X_free | x_obs)`` — "how unsure
is the model about the rest" — sharing semantics with
:class:`cirkit_tpu.backend.jax.queries.ExpectationQuery`'s variances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cirkit_tpu.backend.jax.circuit import JaxCircuit
from cirkit_tpu.backend.jax.layers import (
    JaxConstantInputLayer,
    JaxHadamardLayer,
    JaxInputLayer,
    JaxKroneckerLayer,
    JaxSumLayer,
)
from cirkit_tpu.backend.jax.optimized import (
    JaxCPTLayer,
    JaxTensorDotLayer,
    JaxTuckerLayer,
)
from cirkit_tpu.backend.jax.parameters import Store
from cirkit_tpu.backend.jax.queries import Query, _evidence_to_mask, _tucker_comb
from cirkit_tpu.backend.jax.utils import safelog


class EntropyQuery(Query):
    """Shannon entropy (nats) of the circuit's normalized distribution.

    Exact on deterministic circuits; the latent upper bound
    ``H(x) + H(parse | x)`` otherwise (see the module docstring). With
    ``x``/``evidence_mask`` it returns per-sample posterior entropies
    ``H(X_free | x_obs)`` under the same evidence conventions as the other
    queries (True = observed; Scope specs accepted)."""

    def __init__(self, circuit: JaxCircuit) -> None:
        from cirkit_tpu.backend.jax.semiring import LSESumSemiring

        if not (circuit.properties.smooth and circuit.properties.decomposable):
            raise ValueError(
                f"The circuit must be smooth and decomposable, "
                f"but found {circuit.properties}"
            )
        if circuit.semiring is not LSESumSemiring:
            raise ValueError(
                "EntropyQuery requires a circuit compiled under the "
                f"'lse-sum' semiring, found {circuit.semiring.__name__}"
            )
        self._circuit = circuit

    def __call__(
        self,
        x: jnp.ndarray | np.ndarray | None = None,
        *,
        evidence_mask=None,
        store: Store | None = None,
        return_log_partition: bool = False,
    ):
        """Without ``x``: the (O, K) entropy of each root head. With
        ``x`` (B, D) and ``evidence_mask``: the (B, O, K) posterior
        entropy per sample. ``return_log_partition=True`` additionally
        returns the matching log-normalizer ``log Z`` (the evidence
        log-likelihood of the unnormalized measure), same shape."""
        cc = self._circuit
        num_vars = max(cc.scope) + 1
        unconditional = x is None
        if unconditional:
            if evidence_mask is not None:
                raise ValueError("evidence_mask requires x")
            x = jnp.zeros((1, num_vars), jnp.float32)
            mask = jnp.zeros((1, num_vars), bool)
        else:
            x = jnp.asarray(x)
            if evidence_mask is None:
                raise ValueError("x requires an evidence_mask")
            mask = _evidence_to_mask(cc, evidence_mask, x.shape[0])
            if mask.shape[1] != num_vars:
                raise ValueError(
                    f"The circuit scope has {num_vars} variables, but the "
                    f"mask covers {mask.shape[1]}"
                )
        if store is None:
            store = getattr(cc, "default_store", None)
            if store is None:
                raise ValueError("No parameter store bound; pass store=...")
        store = cc.restrict_store(store)
        fn = getattr(cc, "_entropy_jit", None)
        if fn is None:
            fn = cc._entropy_jit = jax.jit(_build_entropy_run(cc))
        hh, lz = fn(store, x, mask)
        if unconditional:
            hh, lz = hh[0], lz[0]
        return (hh, lz) if return_log_partition else hh


def _mix(lz, hh, w):
    """One deterministic-sum reduction: composite ``(log Z_m, H_m)`` pairs
    (F, B, M) x weight rows (F, O, M) -> output pairs (F, B, O).

    ``log Z_o = lse_m(log w_om + lz_m)`` and
    ``H_o = sum_m pi_m H_m - sum_m pi_m log pi_m`` with
    ``log pi_m = log w_om + lz_m - log Z_o``. Every ``sum_m pi_m (...)``
    term is an exp-weighted matmul over M (MXU, HIGHEST precision) — the
    (F, B, O, M) score tensor is never materialized:
    ``sum_m pi_m log pi_m = (sum_m w~ e_m lz_m + sum_m (w~ log w~)_m e_m)
    / A_o - log A_o`` after the per-(f, b) max shift, where ``e = exp(lz -
    shift)`` and ``A_o = sum_m w_om e_m``."""
    hp = jax.lax.Precision.HIGHEST
    lw = safelog(w)
    shift = jnp.max(lz, axis=2, keepdims=True)
    shift = jnp.clip(shift, jnp.finfo(lz.dtype).min, jnp.finfo(lz.dtype).max)
    e = jnp.exp(lz - shift)  # (F, B, M), zeros where lz = -inf
    # guard every 0 * (-inf) product
    elz = jnp.where(e > 0, e * lz, 0.0)
    eh = e * hh
    wlw = jnp.where(w > 0, w * lw, 0.0)
    a = jnp.einsum("fbm,fom->fbo", e, w, precision=hp)  # Z_o / exp(shift)
    lzo = safelog(a) + shift  # (F, B, O)
    sh = jnp.einsum("fbm,fom->fbo", eh, w, precision=hp)
    slz = jnp.einsum("fbm,fom->fbo", elz, w, precision=hp)
    slw = jnp.einsum("fbm,fom->fbo", e, wlw, precision=hp)
    safe_a = jnp.maximum(a, jnp.finfo(a.dtype).tiny)
    # pi_m = w_om e_m / A_o, so  sum_m pi_m log pi_m
    #   = (slw + slz) / A - lzo   (log pi = log w + lz - lzo; sum pi = 1)
    # H_o = sh/A - [(slw + slz)/A - lzo] = (sh - slw - slz)/A + lzo
    ho = jnp.where(a > 0, (sh - slw - slz) / safe_a + lzo, 0.0)
    return lzo, ho


def _build_entropy_run(cc: JaxCircuit):
    entries = cc._entries

    def _gather(entry, vals):
        cat = (
            vals[entry.in_ids[0]]
            if len(entry.in_ids) == 1
            else jnp.concatenate([vals[i] for i in entry.in_ids], axis=0)
        )
        return cat[:, None] if entry.fold_idx is None else cat[entry.fold_idx]

    def _run(st, xx, mk):
        pairs: list[tuple[jnp.ndarray, jnp.ndarray]] = []
        for entry in entries:
            layer = entry.layer
            if isinstance(layer, JaxConstantInputLayer):
                raise NotImplementedError(
                    f"EntropyQuery is not supported for {type(layer).__name__}"
                )
            if isinstance(layer, JaxInputLayer):
                if layer.num_variables != 1:
                    raise NotImplementedError(
                        "Entropy of multivariate input layers is not supported"
                    )
                si = layer.scope_idx
                xin = jnp.transpose(xx[:, si], (1, 0, 2))  # (F, B, 1)
                obs = layer(st, xin)  # (F, B, K) log-likelihoods
                mrow = jnp.transpose(mk[:, si[:, 0]], (1, 0))[:, :, None]  # (F, B, 1)
                lz = jnp.where(mrow, obs, layer.integrate(st)[:, None, :])
                hh = jnp.where(
                    mrow,
                    jnp.zeros_like(obs),
                    layer.unit_entropy(st)[:, None, :],
                )
                pairs.append((lz, hh))
                continue

            lzs = _gather(entry, [p[0] for p in pairs])  # (F, H, B, K)
            hhs = _gather(entry, [p[1] for p in pairs])
            if isinstance(layer, JaxHadamardLayer):
                pairs.append((lzs.sum(axis=1), hhs.sum(axis=1)))
                continue
            if isinstance(layer, JaxKroneckerLayer):
                pairs.append((_tucker_comb(lzs), _tucker_comb(hhs)))
                continue
            if isinstance(layer, JaxTuckerLayer):
                lz, hh = _tucker_comb(lzs), _tucker_comb(hhs)
                pairs.append(_mix(lz, hh, layer.weight(st)))
                continue
            if isinstance(layer, JaxCPTLayer):
                pairs.append(_mix(lzs.sum(axis=1), hhs.sum(axis=1), layer.weight(st)))
                continue
            if isinstance(layer, JaxSumLayer):
                f, h, b, k = lzs.shape
                lz = jnp.transpose(lzs, (0, 2, 1, 3)).reshape(f, b, h * k)
                hh = jnp.transpose(hhs, (0, 2, 1, 3)).reshape(f, b, h * k)
                pairs.append(_mix(lz, hh, layer.weight(st)))
                continue
            if isinstance(layer, JaxTensorDotLayer):
                w = layer.weight(st)  # (F, Kk, Kj)
                f, _, b, m = lzs.shape
                kk, kj = w.shape[1:]
                kq = m // kj
                # child composite index is j*Kq + q: per q-block the output
                # (q, kout) mixes over j with weight row w[kout, :]
                lzr = lzs[:, 0].reshape(f, b, kj, kq)
                hhr = hhs[:, 0].reshape(f, b, kj, kq)
                outs = []
                for q in range(kq):
                    outs.append(_mix(lzr[:, :, :, q], hhr[:, :, :, q], w))
                lz = jnp.stack([o[0] for o in outs], axis=2).reshape(f, b, -1)
                hh = jnp.stack([o[1] for o in outs], axis=2).reshape(f, b, -1)
                pairs.append((lz, hh))
                continue
            raise NotImplementedError(
                f"EntropyQuery is not supported for {type(layer).__name__}"
            )

        lz_all = [p[0] for p in pairs]
        hh_all = [p[1] for p in pairs]
        out_lz = (
            lz_all[cc._outputs.out_ids[0]]
            if len(cc._outputs.out_ids) == 1
            else jnp.concatenate([lz_all[i] for i in cc._outputs.out_ids], axis=0)
        )
        out_hh = (
            hh_all[cc._outputs.out_ids[0]]
            if len(cc._outputs.out_ids) == 1
            else jnp.concatenate([hh_all[i] for i in cc._outputs.out_ids], axis=0)
        )
        if cc._outputs.fold_idx is not None:
            out_lz = out_lz[cc._outputs.fold_idx]
            out_hh = out_hh[cc._outputs.fold_idx]
        # (O, B, K) -> (B, O, K)
        return jnp.transpose(out_hh, (1, 0, 2)), jnp.transpose(out_lz, (1, 0, 2))

    return _run
