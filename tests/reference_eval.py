"""A brute-force numpy evaluator for symbolic circuits.

Test-only oracle: evaluates a symbolic circuit directly (in linear space,
float64) without any compilation, so compiled outputs can be checked against
enumeration over all worlds (the reference's ground-truth strategy, see
``tests/backend/torch/test_compile_circuit.py:27-50``).
"""

from __future__ import annotations

import itertools
import math

import numpy as np

from cirkit_tpu.symbolic import circuit as sym_circuit
from cirkit_tpu.symbolic import layers as sym_layers
from cirkit_tpu.symbolic import parameters as symp


def eval_parameter(p: symp.Parameter) -> np.ndarray:
    """Evaluate a symbolic parameter graph with numpy."""
    values: dict[symp.ParameterNode, np.ndarray] = {}
    for node in p.topological_ordering():
        ins = [values[n] for n in p.node_inputs(node)]
        values[node] = _eval_parameter_node(node, ins)
    return values[p.output]


def _eval_parameter_node(node: symp.ParameterNode, ins: list[np.ndarray]) -> np.ndarray:
    if isinstance(node, symp.ConstantParameter):
        return np.broadcast_to(np.asarray(node.value, dtype=np.float64), node.shape)
    if isinstance(node, symp.TensorParameter):
        init = node.initializer
        from cirkit_tpu.symbolic.initializers import ConstantTensorInitializer

        if not isinstance(init, ConstantTensorInitializer):
            raise ValueError("The oracle only evaluates constant-initialized tensors")
        value = np.asarray(init.value)
        return np.broadcast_to(value, node.shape).astype(value.dtype)
    if isinstance(node, symp.ReferenceParameter):
        return _eval_parameter_node(node.deref(), [])
    if isinstance(node, symp.IndexParameter):
        return np.take(ins[0], node.indices, axis=node.axis)
    if isinstance(node, symp.SumParameter):
        return ins[0] + ins[1]
    if isinstance(node, symp.HadamardParameter):
        return ins[0] * ins[1]
    if isinstance(node, symp.KroneckerParameter):
        return np.kron(ins[0], ins[1])
    if isinstance(node, symp.OuterProductParameter) or isinstance(
        node, symp.OuterSumParameter
    ):
        a, b = ins
        ax = node.axis
        a1 = np.expand_dims(a, ax + 1)
        b1 = np.expand_dims(b, ax)
        out = a1 * b1 if isinstance(node, symp.OuterProductParameter) else a1 + b1
        return out.reshape(node.shape)
    if isinstance(node, symp.ExpParameter):
        return np.exp(ins[0])
    if isinstance(node, symp.LogParameter):
        return np.log(ins[0])
    if isinstance(node, symp.SquareParameter):
        return np.square(ins[0])
    if isinstance(node, symp.SoftplusParameter):
        return np.logaddexp(0.0, ins[0])
    if isinstance(node, symp.ScaledSigmoidParameter):
        sig = 1.0 / (1.0 + np.exp(-ins[0]))
        return sig * (node.vmax - node.vmin) + node.vmin
    if isinstance(node, symp.SigmoidParameter):
        return 1.0 / (1.0 + np.exp(-ins[0]))
    if isinstance(node, symp.ClampParameter):
        return np.clip(ins[0], node.vmin, node.vmax)
    if isinstance(node, symp.ConjugateParameter):
        return np.conj(ins[0])
    if isinstance(node, symp.ReduceSumParameter):
        return ins[0].sum(axis=node.axis)
    if isinstance(node, symp.ReduceProductParameter):
        return ins[0].prod(axis=node.axis)
    if isinstance(node, symp.ReduceLSEParameter):
        m = ins[0].max(axis=node.axis, keepdims=True)
        return (np.log(np.exp(ins[0] - m).sum(axis=node.axis)) + m.squeeze(node.axis))
    if isinstance(node, symp.SoftmaxParameter):
        m = ins[0].max(axis=node.axis, keepdims=True)
        e = np.exp(ins[0] - m)
        return e / e.sum(axis=node.axis, keepdims=True)
    if isinstance(node, symp.LogSoftmaxParameter):
        m = ins[0].max(axis=node.axis, keepdims=True)
        e = ins[0] - m
        return e - np.log(np.exp(e).sum(axis=node.axis, keepdims=True))
    if isinstance(node, symp.MixingWeightParameter):
        k, h = node.in_shape
        out = np.zeros((k, k * h), dtype=ins[0].dtype)
        for j in range(h):
            out[:, j * k : (j + 1) * k][np.arange(k), np.arange(k)] = ins[0][:, j]
        return out
    if isinstance(node, symp.GaussianProductMean):
        m1, s1, m2, s2 = ins
        v1, v2 = s1**2, s2**2
        mean = (np.outer(m1, v2) + np.outer(v1, m2)) / (v1[:, None] + v2[None, :])
        return mean.reshape(-1)
    if isinstance(node, symp.GaussianProductStddev):
        s1, s2 = ins
        v1, v2 = s1**2, s2**2
        var = (v1[:, None] * v2[None, :]) / (v1[:, None] + v2[None, :])
        return np.sqrt(var).reshape(-1)
    if isinstance(node, symp.GaussianProductLogPartition):
        m1, s1, m2, s2 = ins
        v1, v2 = s1**2, s2**2
        var = v1[:, None] + v2[None, :]
        logz = (
            -0.5 * ((m1[:, None] - m2[None, :]) ** 2) / var
            - 0.5 * np.log(2.0 * np.pi * var)
        )
        return logz.reshape(-1)
    if isinstance(node, symp.PolynomialProduct):
        c1, c2 = ins
        k1, d1 = c1.shape
        k2, d2 = c2.shape
        out = np.zeros((k1 * k2, d1 + d2 - 1), dtype=np.result_type(c1, c2))
        for i in range(k1):
            for j in range(k2):
                out[i * k2 + j] = np.convolve(c1[i], c2[j])
        return out
    if isinstance(node, symp.PolynomialDifferential):
        c = ins[0]
        for _ in range(node.order):
            if c.shape[1] <= 1:
                c = np.zeros((c.shape[0], 1), dtype=c.dtype)
                break
            c = c[:, 1:] * np.arange(1, c.shape[1])
        return c
    raise NotImplementedError(f"No oracle rule for {type(node).__name__}")


def eval_input_layer(sl: sym_layers.InputLayer, x: np.ndarray) -> np.ndarray:
    """Evaluate an input layer on assignments x of shape (B, D) -> (B, K)."""
    if isinstance(sl, sym_layers.EvidenceLayer):
        obs = eval_parameter(sl.observation)
        return np.repeat(
            eval_input_layer(sl.layer, obs[None, :]), x.shape[0], axis=0
        )
    if isinstance(sl, sym_layers.ConstantValueLayer):
        v = eval_parameter(sl.value)
        v = np.exp(v) if sl.log_space else v
        return np.broadcast_to(v[None, :], (x.shape[0], sl.num_output_units))
    if isinstance(sl, sym_layers.CategoricalLayer):
        xi = x[:, 0].astype(int)
        if sl.probs is not None:
            return eval_parameter(sl.probs)[:, xi].T
        return np.exp(eval_parameter(sl.logits))[:, xi].T
    if isinstance(sl, sym_layers.EmbeddingLayer):
        xi = x[:, 0].astype(int)
        return eval_parameter(sl.weight)[:, xi].T
    if isinstance(sl, sym_layers.BinomialLayer):
        xi = x[:, 0].astype(int)
        n = sl.total_count
        comb = np.array([math.comb(n, k) for k in range(n + 1)], dtype=np.float64)
        if sl.probs is not None:
            p = eval_parameter(sl.probs)
            logits = np.log(p) - np.log1p(-p)
        else:
            logits = eval_parameter(sl.logits)
        # unnormalized when parameterized by logits, normalized via sigmoid
        p = 1.0 / (1.0 + np.exp(-logits))
        pmf = comb[None, :] * p[:, None] ** np.arange(n + 1) * (1 - p[:, None]) ** (
            n - np.arange(n + 1)
        )
        return pmf[:, xi].T
    if isinstance(sl, sym_layers.GaussianLayer):
        xi = x[:, 0].astype(np.float64)
        mean = eval_parameter(sl.mean)
        std = eval_parameter(sl.stddev)
        log_pdf = (
            -0.5 * ((xi[:, None] - mean[None, :]) / std[None, :]) ** 2
            - np.log(std[None, :])
            - 0.5 * np.log(2 * np.pi)
        )
        if sl.log_partition is not None:
            log_pdf = log_pdf + eval_parameter(sl.log_partition)[None, :]
        return np.exp(log_pdf)
    if isinstance(sl, sym_layers.PolynomialLayer):
        xi = x[:, 0].astype(np.float64)
        coeff = eval_parameter(sl.coeff)  # (K, deg+1), ascending powers
        out = np.zeros((x.shape[0], sl.num_output_units), dtype=coeff.dtype)
        for d in range(coeff.shape[1] - 1, -1, -1):
            out = out * xi[:, None] + coeff[None, :, d]
        return out
    raise NotImplementedError(f"No oracle rule for {type(sl).__name__}")


def eval_circuit(sc: sym_circuit.Circuit, x: np.ndarray) -> np.ndarray:
    """Evaluate the circuit on (B, D) assignments -> (B, O, K) linear values."""
    values: dict[sym_layers.Layer, np.ndarray] = {}
    for sl in sc.topological_ordering():
        if isinstance(sl, sym_layers.InputLayer):
            cols = sorted(sl.scope)
            values[sl] = eval_input_layer(sl, x[:, cols] if cols else x[:, :0])
            continue
        ins = [values[i] for i in sc.layer_inputs(sl)]
        if isinstance(sl, sym_layers.HadamardLayer):
            out = ins[0]
            for other in ins[1:]:
                out = out * other
            values[sl] = out
        elif isinstance(sl, sym_layers.KroneckerLayer):
            out = ins[0]
            for other in ins[1:]:
                out = (out[:, :, None] * other[:, None, :]).reshape(x.shape[0], -1)
            values[sl] = out
        elif isinstance(sl, sym_layers.SumLayer):
            w = eval_parameter(sl.weight)
            cat = np.concatenate(ins, axis=1)
            values[sl] = cat @ w.T
        else:
            raise NotImplementedError(f"No oracle rule for {type(sl).__name__}")
    return np.stack([values[sl] for sl in sc.outputs], axis=1)


def enumerate_worlds(num_variables: int, num_states: int) -> np.ndarray:
    """All assignments over num_variables discrete variables: (S^D, D)."""
    worlds = list(itertools.product(range(num_states), repeat=num_variables))
    return np.array(worlds, dtype=np.int64)


def partition_function(sc: sym_circuit.Circuit, num_states: int) -> np.ndarray:
    """Exhaustive-sum partition function of a discrete circuit: (O, K)."""
    worlds = enumerate_worlds(sc.num_variables, num_states)
    return eval_circuit(sc, worlds).sum(axis=0)


def max_eval_circuit(
    sc: sym_circuit.Circuit,
    x: np.ndarray,
    *,
    marginalized: set[int] | None = None,
    num_states: int | None = None,
) -> np.ndarray:
    """Best-parse (max-product) values on (B, D) assignments -> (B, O, K):
    sum layers take the max over their weighted inputs instead of summing.
    The ground truth for MAPQuery (max over worlds of this = the MPE).

    With ``marginalized`` (a set of variable ids, requires ``num_states``),
    those variables' input layers contribute their exhaustive state sum
    instead of a point evaluation — the marginal-MAP oracle."""
    values: dict[sym_layers.Layer, np.ndarray] = {}
    for sl in sc.topological_ordering():
        if isinstance(sl, sym_layers.InputLayer):
            cols = sorted(sl.scope)
            if marginalized and cols and set(cols) & marginalized:
                # the states-sum path handles univariate layers fully
                # inside the marginalized set; partial overlap would
                # silently mis-marginalize
                assert set(cols) <= marginalized and len(cols) == 1, (
                    f"oracle supports only univariate fully-marginalized "
                    f"leaves, got scope {cols} vs marginalized {marginalized}"
                )
                states = np.arange(num_states, dtype=np.int64)[:, None]
                tot = eval_input_layer(sl, states).sum(axis=0, keepdims=True)
                values[sl] = np.broadcast_to(tot, (x.shape[0], tot.shape[1]))
            else:
                values[sl] = eval_input_layer(sl, x[:, cols] if cols else x[:, :0])
            continue
        ins = [values[i] for i in sc.layer_inputs(sl)]
        if isinstance(sl, sym_layers.HadamardLayer):
            out = ins[0]
            for other in ins[1:]:
                out = out * other
            values[sl] = out
        elif isinstance(sl, sym_layers.KroneckerLayer):
            out = ins[0]
            for other in ins[1:]:
                out = (out[:, :, None] * other[:, None, :]).reshape(x.shape[0], -1)
            values[sl] = out
        elif isinstance(sl, sym_layers.SumLayer):
            w = eval_parameter(sl.weight)
            cat = np.concatenate(ins, axis=1)
            values[sl] = (cat[:, None, :] * w[None]).max(axis=2)
        else:
            raise NotImplementedError(f"No max oracle rule for {type(sl).__name__}")
    return np.stack([values[sl] for sl in sc.outputs], axis=1)


def topk_parses_by_enumeration(
    sc: sym_circuit.Circuit,
    num_states: int,
    t: int,
    *,
    observed: np.ndarray | None = None,
    root_unit: int = 0,
) -> tuple[np.ndarray, list[tuple[tuple[int, int], ...]]]:
    """The ``t`` best latent parses of root output 0 / unit ``root_unit``,
    by *explicit enumeration of every parse* (no k-best truncation): each
    unit's full parse list — (log score, assignment as a sorted tuple of
    (var, state)) — is materialized, so keep circuits tiny. ``observed``
    (entries >= 0) pins variables. Returns (scores (t,), assignments),
    scores descending, padded with -inf/() when fewer parses exist."""

    def _cross(lists):
        out = lists[0]
        for other in lists[1:]:
            out = [
                (sa + sb, aa + ab) for sa, aa in out for sb, ab in other
            ]
        return out

    def _logw(x: float) -> float:
        return float(np.log(x)) if x > 0 else -np.inf

    parses: dict[sym_layers.Layer, list] = {}
    for sl in sc.topological_ordering():
        if isinstance(sl, sym_layers.InputLayer):
            cols = sorted(sl.scope)
            assert len(cols) == 1, "oracle supports univariate leaves only"
            v = cols[0]
            if observed is not None and observed[v] >= 0:
                states = [int(observed[v])]
            else:
                states = list(range(num_states))
            vals = eval_input_layer(sl, np.asarray(states)[:, None])  # (S, K)
            parses[sl] = [
                [(_logw(vals[si, k]), ((v, s),)) for si, s in enumerate(states)]
                for k in range(vals.shape[1])
            ]
            continue
        ins = [parses[i] for i in sc.layer_inputs(sl)]
        if isinstance(sl, sym_layers.HadamardLayer):
            parses[sl] = [
                _cross([op[k] for op in ins]) for k in range(len(ins[0]))
            ]
        elif isinstance(sl, sym_layers.KroneckerLayer):
            cur = ins[0]
            for op in ins[1:]:
                cur = [_cross([a, b]) for a in cur for b in op]
            parses[sl] = cur
        elif isinstance(sl, sym_layers.SumLayer):
            w = eval_parameter(sl.weight)  # (O, total input units)
            cat = [ul for op in ins for ul in op]
            parses[sl] = [
                [
                    (_logw(w[o, j]) + s, a)
                    for j, plist in enumerate(cat)
                    for s, a in plist
                ]
                for o in range(w.shape[0])
            ]
        else:
            raise NotImplementedError(f"No parse oracle for {type(sl).__name__}")
    lst = sorted(parses[sc.outputs[0]][root_unit], key=lambda p: -p[0])[:t]
    while len(lst) < t:
        lst.append((-np.inf, ()))
    scores = np.array([s for s, _ in lst], dtype=np.float64)
    asgs = [tuple(sorted(a)) for _, a in lst]
    return scores, asgs


def mpe_by_enumeration(
    sc: sym_circuit.Circuit, num_states: int, observed: np.ndarray | None = None
) -> tuple[np.ndarray, float]:
    """Exhaustive MPE of a discrete single-output circuit: the world with
    the largest best-parse value (restricted to worlds matching the
    ``observed`` row — entries >= 0 are pinned)."""
    worlds = enumerate_worlds(sc.num_variables, num_states)
    if observed is not None:
        keep = ((worlds == observed[None]) | (observed[None] < 0)).all(axis=1)
        worlds = worlds[keep]
    vals = max_eval_circuit(sc, worlds)[:, 0, 0]
    best = int(np.argmax(vals))
    return worlds[best], float(vals[best])
