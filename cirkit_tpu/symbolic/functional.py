"""Circuit operators: the tractable-operator suite over symbolic circuits.

Rebuild of ``cirkit/symbolic/functional.py:31-651``. Every operator produces
a *new* symbolic circuit whose parameters are shared with the operands via
ReferenceParameters, and records provenance so that the pipeline can compile
operand circuits first and share parameter-store slots.
"""

from __future__ import annotations

import heapq
import itertools
from collections.abc import Sequence
from numbers import Number

import numpy as np

from cirkit_tpu.symbolic.circuit import (
    Circuit,
    CircuitBlock,
    CircuitOperation,
    CircuitOperator,
    StructuralPropertyError,
    are_compatible,
)
from cirkit_tpu.symbolic.layers import (
    EvidenceLayer,
    InputLayer,
    KroneckerLayer,
    Layer,
    LayerOperator,
    ProductLayer,
    SumLayer,
)
from cirkit_tpu.symbolic.initializers import DirichletInitializer, NormalInitializer
from cirkit_tpu.symbolic.parameters import (
    ConstantParameter,
    MixingWeightParameter,
    Parameter,
    ParameterFactory,
    SoftmaxParameter,
    TensorParameter,
    mixing_weight_factory,
)
from cirkit_tpu.symbolic.registry import OPERATOR_REGISTRY, OperatorRegistry
from cirkit_tpu.utils.scope import Scope


def _ambient_registry(registry: OperatorRegistry | None) -> OperatorRegistry:
    return OPERATOR_REGISTRY.get() if registry is None else registry


def _copy_blocks(
    scs: Sequence[Circuit],
) -> tuple[
    list[CircuitBlock],
    dict[CircuitBlock, list[CircuitBlock]],
    list[list[CircuitBlock]],
]:
    """Copy every operand's layers as parameter-SHARING blocks (copyref —
    the new circuit references the operands' parameters, it does not
    re-allocate them): ``(blocks, in_blocks, per-operand output blocks)``."""
    blocks: list[CircuitBlock] = []
    in_blocks: dict[CircuitBlock, list[CircuitBlock]] = {}
    outputs: list[list[CircuitBlock]] = []
    for sc in scs:
        block_of: dict[Layer, CircuitBlock] = {}
        for sl in sc.topological_ordering():
            b = CircuitBlock.from_layer(sl.copyref())
            blocks.append(b)
            in_blocks[b] = [block_of[sli] for sli in sc.layer_inputs(sl)]
            block_of[sl] = b
        outputs.append([block_of[sl] for sl in sc.outputs])
    return blocks, in_blocks, outputs


def concatenate(
    scs: Sequence[Circuit], *, registry: OperatorRegistry | None = None
) -> Circuit:
    """Concatenate circuits: a circuit whose outputs are all operand outputs.
    No structural property is required."""
    blocks, in_blocks, outputs = _copy_blocks(scs)
    return Circuit.from_operation(
        blocks,
        in_blocks,
        [b for out in outputs for b in out],
        operation=CircuitOperation(CircuitOperator.CONCATENATE, tuple(scs)),
    )


def mixture(
    scs: Sequence[Circuit],
    *,
    weights: Sequence[Number] | np.ndarray | None = None,
    weight_factory: ParameterFactory | None = None,
    em_ready: bool = False,
    registry: OperatorRegistry | None = None,
) -> Circuit:
    """A mixture (weighted model average) of same-scope circuits: copies
    every operand and adds one mixing :class:`SumLayer` over their roots.
    The ensemble combinator — train k circuits independently (different
    templates, seeds, or bagged data), then serve one circuit whose density
    is ``sum_i w_i p_i(x)``; every query (marginals, MAP, sampling,
    expectations) applies to the ensemble directly. An extension: the
    reference has no circuit-combination surface beyond concatenate
    (ref ``symbolic/functional.py:31``, outputs stacked, never mixed).

    Requirements: at least two circuits over identical scopes, each with a
    single output layer, all roots with the same number of output units K
    (K=1 for densities; K>1 mixes unit-wise through a block-diagonal
    Einsum-Networks-style mixing weight).

    ``weights``: fixed nonnegative mixture coefficients (length-n, stored
    as a frozen :class:`ConstantParameter`; the mixture is normalized when
    the operands are normalized and the weights sum to 1). Default:
    learnable softmax coefficients, so :func:`cirkit_tpu.parallel.fit`
    can tune the blend — pass ``fit(..., freeze="shared")`` to train the
    blend ALONE (stacking; components stay as trained), or omit it to
    fine-tune the components jointly through the shared pointer slots. ``weight_factory`` overrides the (K, n)
    coefficient parameterization; ``em_ready=True`` swaps the softmax
    default for plain Dirichlet-initialized coefficients so
    :func:`cirkit_tpu.parallel.fit_em` can train the blend (the classic
    EM-over-mixture-weights setting — components built with
    ``em_ready=True`` templates then train jointly)."""
    scs = list(scs)
    if len(scs) < 2:
        raise ValueError(f"A mixture needs at least two circuits, found {len(scs)}")
    scope = scs[0].scope
    for i, sc in enumerate(scs):
        if sc.scope != scope:
            raise ValueError(
                f"All mixture components must share one scope; circuit {i} "
                f"has {sc.scope} != {scope}"
            )
        if len(sc.outputs) != 1:
            raise ValueError(
                f"Each mixture component must have a single output layer; "
                f"circuit {i} has {len(sc.outputs)}"
            )
    k = scs[0].outputs[0].num_output_units
    for i, sc in enumerate(scs):
        if sc.outputs[0].num_output_units != k:
            raise ValueError(
                "All mixture components must have the same number of root "
                f"units; circuit {i} has {sc.outputs[0].num_output_units} != {k}"
            )
    n = len(scs)

    blocks, in_blocks, outputs = _copy_blocks(scs)
    root_blocks = [out[0] for out in outputs]

    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
        if w.shape != (n,):
            raise ValueError(f"weights must have shape ({n},), found {w.shape}")
        if np.any(w < 0) or not np.all(np.isfinite(w)):
            raise ValueError("Mixture weights must be finite and nonnegative")
        coeff = Parameter.from_input(
            ConstantParameter(k, n, value=np.broadcast_to(w, (k, n)).copy())
        )
        weight = Parameter.from_unary(MixingWeightParameter((k, n)), coeff)
    else:
        def _softmax_coeffs(cshape):
            return Parameter.from_unary(
                SoftmaxParameter(cshape),
                TensorParameter(*cshape, initializer=NormalInitializer()),
            )

        def _plain_dirichlet_coeffs(cshape):
            return Parameter.from_input(
                TensorParameter(*cshape, initializer=DirichletInitializer())
            )

        if weight_factory is not None:
            pf = weight_factory
        elif em_ready:
            pf = _plain_dirichlet_coeffs
        else:
            pf = _softmax_coeffs
        weight = mixing_weight_factory((k, n * k), param_factory=pf)

    mix = SumLayer(k, k, arity=n, weight=weight)
    mb = CircuitBlock.from_layer(mix)
    blocks.append(mb)
    in_blocks[mb] = root_blocks
    return Circuit.from_operation(
        blocks,
        in_blocks,
        [mb],
        operation=CircuitOperation(CircuitOperator.MIXTURE, tuple(scs)),
    )


def evidence(
    sc: Circuit,
    obs: dict[int, Number | tuple[Number, ...]],
    *,
    registry: OperatorRegistry | None = None,
) -> Circuit:
    """Pin some variables to an observation: affected input layers become
    EvidenceLayers over a constant observation parameter."""
    scope = Scope(obs.keys())
    if not scope:
        raise ValueError("There are no variables to observe")
    if not scope <= sc.scope:
        raise ValueError("The observed variables must be a subset of the circuit scope")

    blocks: list[CircuitBlock] = []
    in_blocks: dict[CircuitBlock, list[CircuitBlock]] = {}
    block_of: dict[Layer, CircuitBlock] = {}

    for sl in sc.topological_ordering():
        if isinstance(sl, InputLayer) and sl.scope & scope:
            if not sl.scope <= scope:
                raise NotImplementedError(
                    "Only complete evidence of multivariate input layers is supported"
                )
            values = np.array([obs[v] for v in sorted(sl.scope)])
            obs_param = Parameter.from_input(
                ConstantParameter(len(sl.scope), value=values)
            )
            b = CircuitBlock.from_layer(EvidenceLayer(sl.copyref(), observation=obs_param))
        else:
            b = CircuitBlock.from_layer(sl.copyref())
            in_blocks[b] = [block_of[sli] for sli in sc.layer_inputs(sl)]
        blocks.append(b)
        block_of[sl] = b

    return Circuit.from_operation(
        blocks,
        in_blocks,
        [block_of[sl] for sl in sc.outputs],
        operation=CircuitOperation(CircuitOperator.EVIDENCE, (sc,), {"scope": scope}),
    )


def integrate(
    sc: Circuit,
    scope: Scope | None = None,
    *,
    registry: OperatorRegistry | None = None,
) -> Circuit:
    """Integrate (marginalize) a smooth decomposable circuit over a scope:
    affected input layers are replaced via per-type INTEGRATION rules."""
    if not sc.is_smooth or not sc.is_decomposable:
        raise StructuralPropertyError(
            "Only smooth and decomposable circuits can be efficiently integrated"
        )
    if scope is None:
        scope = sc.scope
    if not scope:
        raise ValueError("There are no variables to integrate over")
    if not scope <= sc.scope:
        raise ValueError("The integration scope must be a subset of the circuit scope")
    registry = _ambient_registry(registry)

    blocks: list[CircuitBlock] = []
    in_blocks: dict[CircuitBlock, list[CircuitBlock]] = {}
    block_of: dict[Layer, CircuitBlock] = {}

    for sl in sc.topological_ordering():
        if isinstance(sl, InputLayer) and sl.scope & scope:
            rule = registry.retrieve_rule(LayerOperator.INTEGRATION, type(sl))
            b = rule(sl, scope=scope)
        else:
            b = CircuitBlock.from_layer(sl.copyref())
            in_blocks[b] = [block_of[sli] for sli in sc.layer_inputs(sl)]
        blocks.append(b)
        block_of[sl] = b

    return Circuit.from_operation(
        blocks,
        in_blocks,
        [block_of[sl] for sl in sc.outputs],
        operation=CircuitOperation(CircuitOperator.INTEGRATION, (sc,), {"scope": scope}),
    )


def multiply(sc1: Circuit, sc2: Circuit, *, registry: OperatorRegistry | None = None) -> Circuit:
    """Multiply two compatible circuits: pairwise layer products driven by the
    MULTIPLICATION rule registry; disjoint-scope pairs get a fresh Kronecker
    layer (ref: ``symbolic/functional.py:259-415``)."""
    if sc1.scope != sc2.scope:
        if sc1.scope & sc2.scope:
            # partial overlap needs compatibility restricted to the shared
            # scope plus private-part splicing — like the reference, only
            # same-scope (ref functional.py:295-296) is supported there;
            # fully DISJOINT scopes are an extension: independent models
            # combine into p(x) q(y) over the union scope
            raise NotImplementedError(
                "Only products of circuits over the same scope or over "
                "disjoint scopes are supported"
            )
        for sc in (sc1, sc2):
            if not (sc.is_smooth and sc.is_decomposable):
                raise StructuralPropertyError(
                    "Only smooth and decomposable circuits can be multiplied"
                )
    elif not are_compatible(sc1, sc2):
        raise StructuralPropertyError("Only compatible circuits can be multiplied")
    registry = _ambient_registry(registry)

    prod_block: dict[tuple[Layer, Layer], CircuitBlock] = {}
    blocks: list[CircuitBlock] = []
    in_blocks: dict[CircuitBlock, list[CircuitBlock]] = {}
    splice_block: dict[tuple[int, Layer], CircuitBlock] = {}

    def _splice(sc: Circuit, root: Layer) -> CircuitBlock:
        """Copy a sub-circuit once per (operand, layer): repeated disjoint
        pairs (multi-output operands, DAG-shared sub-circuits) reuse the
        copies instead of duplicating the layer DAG per pair."""
        key = (id(sc), root)
        cached = splice_block.get(key)
        if cached is not None:
            return cached
        for l in sc.subgraph(root).topological_ordering():
            lk = (id(sc), l)
            if lk in splice_block:
                continue
            b = CircuitBlock.from_layer(l.copyref())
            blocks.append(b)
            in_blocks[b] = [
                splice_block[(id(sc), li)] for li in sc.layer_inputs(l)
            ]
            splice_block[lk] = b
        return splice_block[key]

    stack: list[tuple[Layer, Layer]] = list(itertools.product(sc1.outputs, sc2.outputs))
    while stack:
        pair = stack[-1]
        if pair in prod_block:
            stack.pop()
            continue
        l1, l2 = pair

        # Disjoint scopes: splice in copies of both sub-circuits and combine
        # their roots with a fresh Kronecker product layer. KroneckerLayer
        # assumes equal-width operands, hence the unit-count restriction
        # (documented in docs/api/symbolic.md).
        if not sc1.layer_scope(l1) & sc2.layer_scope(l2):
            if l1.num_output_units != l2.num_output_units:
                raise NotImplementedError(
                    "Disjoint-scope layers can only be multiplied when they have equal size"
                )
            root_blocks = [_splice(sc1, l1), _splice(sc2, l2)]
            kb = CircuitBlock.from_layer(KroneckerLayer(l1.num_output_units, arity=2))
            blocks.append(kb)
            in_blocks[kb] = root_blocks
            prod_block[pair] = kb
            stack.pop()
            continue

        # Overlapping scopes: recurse into matched input pairs first.
        if isinstance(l1, InputLayer):
            children: list[tuple[Layer, Layer]] = []
        elif isinstance(l1, SumLayer):
            children = list(itertools.product(sc1.layer_inputs(l1), sc2.layer_inputs(l2)))
        elif isinstance(l1, ProductLayer):
            ins1 = list(sc1.layer_inputs(l1))
            ins2 = list(sc2.layer_inputs(l2))
            if len(ins1) != len(ins2):
                raise NotImplementedError(
                    "Only products of equal-arity product layers are supported"
                )
            # Pair children by SCOPE in l1's own child order (decomposability
            # makes child scopes disjoint, so the match is a bijection). The
            # wiring must not be re-sorted by a TOTAL scope order: a
            # Kronecker layer's unit digits follow its own child order, and
            # the parent sum weights above were laid out against it. (The
            # reference "sorts" with Scope's subset PARTIAL order, ref
            # functional.py:380-382 — a stable no-op for disjoint sibling
            # scopes, i.e. positional own-order pairing — and its
            # order-sensitive compatibility check rejects operands whose
            # product layers enumerate the same partition in different
            # orders. We match by scope and fix the Kronecker digit order
            # below, so mixed-order operands multiply correctly — pinned in
            # tests/symbolic/test_operators.py::
            # test_multiply_kronecker_child_order.)
            scope_to_j = {sc2.layer_scope(c): j for j, c in enumerate(ins2)}
            sigma = [scope_to_j.get(sc1.layer_scope(c)) for c in ins1]
            if any(j is None for j in sigma):
                raise StructuralPropertyError(
                    "Product layers with mismatched child scope partitions "
                    f"cannot be multiplied: {[tuple(sc1.layer_scope(c)) for c in ins1]} "
                    f"vs {[tuple(sc2.layer_scope(c)) for c in ins2]}"
                )
            children = [(c1, ins2[j]) for c1, j in zip(ins1, sigma)]
        else:
            raise TypeError(f"Unexpected layer type {type(l1).__name__}")

        missing = [p for p in children if p not in prod_block]
        if missing:
            stack.extend(missing)
            continue

        rule = registry.retrieve_rule(LayerOperator.MULTIPLICATION, type(l1), type(l2))
        b = rule(l1, l2)
        blocks.append(b)
        in_blocks[b] = [prod_block[p] for p in children]
        if isinstance(l1, KroneckerLayer) and sigma != list(range(len(sigma))):
            # Pair blocks are wired in l1's own child order, so the rule's
            # interleave permutation leaves the l2-side digits in l1-aligned
            # order (digit j carries l2 child sigma[j]); post-compose a
            # constant permutation restoring l2's own digit order so the
            # composite unit index is (i1 own, i2 own) — the layout the
            # kron'd parent sum weights assume.
            h = l1.arity
            k1, k2 = l1.num_input_units, l2.num_input_units
            k1h, k2h = k1**h, k2**h
            d = np.stack(np.unravel_index(np.arange(k2h), (k2,) * h))
            i2_al = np.ravel_multi_index(tuple(d[sigma, :]), (k2,) * h)
            mp = (np.arange(k1h)[:, None] * k2h + i2_al[None, :]).ravel()
            ko = k1h * k2h
            fix_sl = SumLayer(
                ko,
                ko,
                weight=Parameter.from_input(
                    ConstantParameter(ko, ko, value=np.eye(ko)[mp])
                ),
            )
            fb = CircuitBlock.from_layer(fix_sl)
            blocks.append(fb)
            in_blocks[fb] = [b]
            b = fb
        prod_block[pair] = b
        stack.pop()

    output_blocks = [
        prod_block[(l1, l2)] for l1, l2 in itertools.product(sc1.outputs, sc2.outputs)
    ]
    return Circuit.from_operation(
        blocks,
        in_blocks,
        output_blocks,
        operation=CircuitOperation(CircuitOperator.MULTIPLICATION, (sc1, sc2)),
    )


def differentiate(
    sc: Circuit, order: int = 1, *, registry: OperatorRegistry | None = None
) -> Circuit:
    """Differentiate a smooth decomposable circuit wrt each variable in its
    scope: sum rule through sum layers, product rule through product layers
    (ref: ``symbolic/functional.py:429-591``). The resulting circuit has, per
    original output, one output per scope variable plus a copy of the output."""
    if not sc.is_smooth or not sc.is_decomposable:
        raise StructuralPropertyError(
            "Only smooth and decomposable circuits can be efficiently differentiated"
        )
    if order <= 0:
        raise ValueError("The order of differentiation must be positive")
    registry = _ambient_registry(registry)

    # For each layer, a list of blocks: the diff wrt each scope variable in
    # ascending id order, followed by a plain copy of the layer at [-1].
    diffs: dict[Layer, list[CircuitBlock]] = {}
    in_blocks: dict[CircuitBlock, Sequence[CircuitBlock]] = {}

    for sl in sc.topological_ordering():
        sl_ins = sc.layer_inputs(sl)
        if isinstance(sl, InputLayer):
            rule = registry.retrieve_rule(LayerOperator.DIFFERENTIATION, type(sl))
            blocks = [rule(sl, var_idx=i, order=order) for i in range(len(sl.scope))]
        elif isinstance(sl, SumLayer):
            # d/dv (W @ x) = W @ dx/dv: one copy of the sum per variable,
            # wired to the matching diffs of every input.
            per_var_inputs = zip(*(diffs[sli][:-1] for sli in sl_ins))
            blocks = []
            for var_inputs in per_var_inputs:
                b = CircuitBlock.from_layer(sl.copyref())
                in_blocks[b] = list(var_inputs)
                blocks.append(b)
        elif isinstance(sl, ProductLayer):
            # Product rule under decomposability: the diff wrt v (in input
            # j's scope) replaces input j with its diff and keeps the rest.
            per_input: list[list[tuple[int, CircuitBlock, list[CircuitBlock]]]] = []
            for j, cur in enumerate(sl_ins):
                entries = []
                for var, dcur in zip(sorted(sc.layer_scope(cur)), diffs[cur][:-1]):
                    b = CircuitBlock.from_layer(sl.copyref())
                    wired = [
                        dcur if i == j else diffs[other][-1]
                        for i, other in enumerate(sl_ins)
                    ]
                    entries.append((var, b, wired))
                per_input.append(entries)
            merged = list(heapq.merge(*per_input, key=lambda e: e[0]))
            blocks = []
            for _, b, wired in merged:
                in_blocks[b] = wired
                blocks.append(b)
        else:
            raise TypeError(f"Unexpected layer type {type(sl).__name__}")

        copy_b = CircuitBlock.from_layer(sl.copyref())
        in_blocks[copy_b] = [diffs[sli][-1] for sli in sl_ins]
        blocks.append(copy_b)
        diffs[sl] = blocks

    all_blocks = [b for bs in diffs.values() for b in bs]
    output_blocks = [b for sl in sc.outputs for b in diffs[sl]]
    return Circuit.from_operation(
        all_blocks,
        in_blocks,
        output_blocks,
        operation=CircuitOperation(
            CircuitOperator.DIFFERENTIATION, (sc,), {"order": order}
        ),
    )


def conjugate(sc: Circuit, *, registry: OperatorRegistry | None = None) -> Circuit:
    """Complex-conjugate a circuit: product layers pass through, sum/input
    layers are conjugated via CONJUGATION rules."""
    registry = _ambient_registry(registry)

    blocks: list[CircuitBlock] = []
    in_blocks: dict[CircuitBlock, list[CircuitBlock]] = {}
    block_of: dict[Layer, CircuitBlock] = {}

    for sl in sc.topological_ordering():
        if isinstance(sl, ProductLayer):
            b = CircuitBlock.from_layer(sl)
        else:
            if not isinstance(sl, (InputLayer, SumLayer)):
                raise TypeError(f"Unexpected layer type {type(sl).__name__}")
            rule = registry.retrieve_rule(LayerOperator.CONJUGATION, type(sl))
            b = rule(sl)
        blocks.append(b)
        block_of[sl] = b
        in_blocks[b] = [block_of[sli] for sli in sc.layer_inputs(sl)]

    return Circuit.from_operation(
        blocks,
        in_blocks,
        [block_of[sl] for sl in sc.outputs],
        operation=CircuitOperation(CircuitOperator.CONJUGATION, (sc,)),
    )
