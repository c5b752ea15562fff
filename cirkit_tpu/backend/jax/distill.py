"""Tree distillation: project a trained circuit onto its optimal Chow-Liu
tree.

An extension beyond the reference, closing a loop its pieces cannot: the
reference's Chow-Liu algorithm (``cirkit/templates/region_graph/algorithms/
chow_liu.py``) estimates mutual information from *data*; here the exact MI
matrix and the exact pairwise conditionals are read off the *model*
(:func:`cirkit_tpu.backend.jax.queries.mutual_information` and the same
anchored-marginals machinery), so the returned tree is the exact
I-projection of the circuit distribution onto directed trees — by the
Chow-Liu theorem the KL-optimal tree approximation:

    KL(p || q_tree) = -H(p) + sum_v H(x_v) - sum_(u,v in tree) I(x_u; x_v)

maximized by the maximum-MI spanning tree with p's own conditionals.
Distillation gives a small, fast, *deterministic* surrogate (exact
:class:`EntropyQuery`, linear-time exact MAP) of an arbitrarily large
circuit — model compression orthogonal to :func:`prune_circuit`'s
structural pruning.

The distilled circuit encodes ``p(x_root) prod_v p(x_v | x_pa(v))`` in the
standard indicator construction: per tree node an indicator categorical
leaf (one unit per state, constant), a Hadamard with the children's
messages, and a sum layer whose weight row t is ``p(x_v = . | x_pa = t)``
(learnable plain constants — ``fit_em``-eligible for data fine-tuning,
while the indicator leaves compile to true constants EM never touches).
"""

from __future__ import annotations

import numpy as np

from cirkit_tpu.backend.jax.circuit import JaxCircuit
from cirkit_tpu.backend.jax.parameters import Store
from cirkit_tpu.backend.jax.pruning import _const
from cirkit_tpu.backend.jax.queries import (
    ExpectationQuery,
    _variable_supports,
    mutual_information,
)
from cirkit_tpu.symbolic.circuit import Circuit
from cirkit_tpu.symbolic.layers import CategoricalLayer, HadamardLayer, SumLayer
from cirkit_tpu.symbolic.parameters import ConstantParameter, Parameter
from cirkit_tpu.utils.scope import Scope


def _prim(mi: np.ndarray, root: int) -> np.ndarray:
    """Prim's maximum spanning tree over the symmetric MI matrix: the
    parent array of the tree rooted at ``root`` (parent[root] = -1).
    Deterministic (ties break toward the lowest-index variable)."""
    d = mi.shape[0]
    parent = np.full(d, -1, dtype=np.int64)
    in_tree = np.zeros(d, dtype=bool)
    in_tree[root] = True
    best = mi[root].copy()
    best_from = np.full(d, root, dtype=np.int64)
    for _ in range(d - 1):
        cand = np.where(in_tree, -np.inf, best)
        nxt = int(np.argmax(cand))
        parent[nxt] = int(best_from[nxt])
        in_tree[nxt] = True
        upd = ~in_tree & (mi[nxt] > best)
        best = np.where(upd, mi[nxt], best)
        best_from = np.where(upd, nxt, best_from)
    return parent


def distill_tree(
    circuit: JaxCircuit,
    *,
    store: Store | None = None,
    root: int = 0,
    output: int = 0,
    unit: int = 0,
) -> tuple[Circuit, dict]:
    """Distill a compiled circuit into its KL-optimal Chow-Liu tree.

    Returns ``(tree circuit, report)``: a symbolic circuit encoding
    ``p(x_root) prod_v p(x_v | x_pa(v))`` with the model's own exact
    marginals/conditionals, structured by the maximum spanning tree of the
    model's exact pairwise mutual information. The report carries the
    rooted ``edges``, the captured dependence ``mi_objective``
    (``sum_edges I`` — by the Chow-Liu identity, maximizing it minimizes
    ``KL(p || q_tree)``), and the per-variable entropies.

    Cost: one batched marginals backward per variable for the MI matrix,
    plus one per distinct tree parent for the conditional tables
    (~2 D calls of batch = support size). Finite-support leaves only.
    The tree is smooth, decomposable, and deterministic — entropy /
    log-count queries on it are exact — and its sum weights are plain
    learnable constants, so ``fit_em`` can fine-tune it on data while the
    indicator leaves stay fixed (they compile to constants, not slots).
    """
    supports = _variable_supports(circuit)
    num_vars = supports.shape[0]
    covered = [v for v in range(num_vars) if supports[v] != -2]
    if not 0 <= root < num_vars or supports[root] == -2:
        raise ValueError(f"Root variable {root} is outside the circuit scope")
    if (supports[covered] == -1).any():
        bad = covered[int(np.argmax(supports[covered] == -1))]
        raise NotImplementedError(
            f"Tree distillation needs finite-support leaves; variable {bad} "
            "has a continuous input layer"
        )
    if len(covered) < 2:
        raise ValueError("Tree distillation needs at least two variables")

    q = ExpectationQuery(circuit)
    mi = np.asarray(
        mutual_information(
            circuit, store=store, variables=covered, output=output, unit=unit
        ),
        dtype=np.float64,
    )  # (k, k) over `covered`
    pos = {v: i for i, v in enumerate(covered)}
    parent_pos = _prim(mi, pos[root])
    parent = np.full(num_vars, -1, dtype=np.int64)
    for i, v in enumerate(covered):
        parent[v] = covered[int(parent_pos[i])] if parent_pos[i] >= 0 else -1
    children: dict[int, list[int]] = {v: [] for v in covered}
    for v in covered:
        if parent[v] >= 0:
            children[int(parent[v])].append(v)

    import jax.numpy as jnp

    marg = np.asarray(
        q.marginals(
            jnp.zeros((1, num_vars), jnp.int32),
            evidence_mask=jnp.zeros((1, num_vars), bool),
            store=store, output=output, unit=unit,
        )[0],
        dtype=np.float64,
    )  # (D, S)

    # exact conditional tables p(x_c = s | x_p = t), one anchored
    # marginals call per distinct parent (batch = parent support)
    cond_w: dict[int, np.ndarray] = {}
    for p, cs in children.items():
        if not cs:
            continue
        s_p = int(supports[p])
        xs = np.zeros((s_p, num_vars), dtype=np.int32)
        xs[:, p] = np.arange(s_p)
        mk = np.zeros((s_p, num_vars), dtype=bool)
        mk[:, p] = True
        full = q.marginals(
            jnp.asarray(xs), evidence_mask=jnp.asarray(mk),
            store=store, output=output, unit=unit,
        )  # (S_p, D, S) on device
        # pull only the children's columns: the full table is ~hundreds of
        # MB at image scale, and a per-parent device->host pull of it
        # dominates everything. One take program per distinct child count.
        tab = np.asarray(
            jnp.take(full, jnp.asarray(np.asarray(cs, np.int32)), axis=1),
            dtype=np.float64,
        )  # (S_p, len(cs), S)
        for ci, c in enumerate(cs):
            w = tab[:, ci, : int(supports[c])].copy()
            # impossible parent states (p(x_p = t) = 0) backward to NaN:
            # any valid row works — use the unconditional marginal
            bad = ~np.isfinite(w).all(axis=1) | (w.sum(axis=1) <= 0)
            w[bad] = marg[c, : int(supports[c])]
            w = np.clip(w, 0.0, None)
            cond_w[c] = w / w.sum(axis=1, keepdims=True)

    # ---- build the indicator tree circuit (children before parents) -----
    layers: list = []
    in_map: dict = {}
    msg: dict[int, SumLayer] = {}
    order: list[int] = []
    stack = [root]
    while stack:  # preorder, then reversed = postorder (children first)
        v = stack.pop()
        order.append(v)
        stack.extend(children[v])
    for v in reversed(order):
        s_v = int(supports[v])
        leaf = CategoricalLayer(
            Scope([v]), s_v, num_categories=s_v,
            probs=Parameter.from_input(
                ConstantParameter(s_v, s_v, value=np.eye(s_v))
            ),
        )
        layers.append(leaf)
        if children[v]:
            had = HadamardLayer(s_v, arity=1 + len(children[v]))
            layers.append(had)
            in_map[had] = [leaf] + [msg[c] for c in children[v]]
            inner = had
        else:
            inner = leaf
        if v == root:
            w = marg[root, :s_v][None, :]  # (1, S_root)
        else:
            w = cond_w[v]  # (S_p, S_v)
        sum_l = SumLayer(s_v, w.shape[0], weight=_const(w))
        layers.append(sum_l)
        in_map[sum_l] = [inner]
        msg[v] = sum_l

    tree = Circuit(layers, in_map, [msg[root]])
    edges = [(int(parent[v]), v) for v in covered if parent[v] >= 0]
    report = {
        "root": root,
        "edges": edges,
        "mi_objective": float(sum(mi[pos[p], pos[c]] for p, c in edges)),
        "entropies": np.array(np.diag(mi)),
        "units": sum(sl.num_output_units for sl in layers),
    }
    return tree, report
