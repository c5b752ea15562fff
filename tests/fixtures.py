"""Hand-wired symbolic PCs with constant parameters, used as ground-truth
fixtures across the test suite (analogue of the reference's
``tests/symbolic/test_utils.py`` builders)."""

from __future__ import annotations

import numpy as np

from cirkit_tpu.symbolic import (
    CategoricalLayer,
    Circuit,
    ConstantTensorInitializer,
    GaussianLayer,
    HadamardLayer,
    KroneckerLayer,
    Parameter,
    SoftmaxParameter,
    SumLayer,
    TensorParameter,
)
from cirkit_tpu.utils import Scope

RNG = np.random.default_rng(42)


def const_param(value: np.ndarray, learnable: bool = True) -> Parameter:
    value = np.asarray(value, dtype=np.float64)
    return Parameter.from_input(
        TensorParameter(
            *value.shape, initializer=ConstantTensorInitializer(value), learnable=learnable
        )
    )


def softmax_param(raw: np.ndarray) -> Parameter:
    raw = np.asarray(raw, dtype=np.float64)
    return Parameter.from_unary(
        SoftmaxParameter(raw.shape, axis=-1),
        TensorParameter(*raw.shape, initializer=ConstantTensorInitializer(raw)),
    )


def build_bivariate_categorical_pc(
    num_units: int = 2,
    num_categories: int = 3,
    *,
    product: str = "hadamard",
    use_softmax: bool = False,
    use_logits: bool = False,
    rng: np.random.Generator | None = None,
) -> Circuit:
    """Two categorical inputs -> product -> sum(1 output). Monotonic."""
    rng = RNG if rng is None else rng
    layers = []
    for v in range(2):
        raw = rng.uniform(0.1, 1.0, size=(num_units, num_categories))
        if use_logits:
            sl = CategoricalLayer(
                Scope([v]), num_units, num_categories=num_categories,
                logits=const_param(np.log(raw)),
            )
        elif use_softmax:
            sl = CategoricalLayer(
                Scope([v]), num_units, num_categories=num_categories,
                probs=softmax_param(np.log(raw)),
            )
        else:
            probs = raw / raw.sum(axis=1, keepdims=True)
            sl = CategoricalLayer(
                Scope([v]), num_units, num_categories=num_categories,
                probs=const_param(probs),
            )
        layers.append(sl)
    if product == "hadamard":
        prod = HadamardLayer(num_units, arity=2)
        k = num_units
    else:
        prod = KroneckerLayer(num_units, arity=2)
        k = num_units**2
    sum_w = rng.uniform(0.1, 1.0, size=(1, k))
    out = SumLayer(k, 1, weight=const_param(sum_w))
    return Circuit(layers + [prod, out], {prod: layers, out: [prod]}, [out])


def build_multivariate_categorical_pc(
    num_variables: int = 4,
    num_units: int = 3,
    num_categories: int = 2,
    *,
    rng: np.random.Generator | None = None,
) -> Circuit:
    """A deeper structured-decomposable PC: a balanced binary vtree of
    Hadamard products with dense sum layers in between."""
    rng = RNG if rng is None else rng

    def leaf(v: int) -> CategoricalLayer:
        raw = rng.uniform(0.1, 1.0, size=(num_units, num_categories))
        probs = raw / raw.sum(axis=1, keepdims=True)
        return CategoricalLayer(
            Scope([v]), num_units, num_categories=num_categories, probs=const_param(probs)
        )

    layers: list = []
    in_layers: dict = {}

    def build(lo: int, hi: int):
        if hi - lo == 1:
            sl = leaf(lo)
            layers.append(sl)
            return sl
        mid = (lo + hi) // 2
        left, right = build(lo, mid), build(mid, hi)
        prod = HadamardLayer(num_units, arity=2)
        layers.append(prod)
        in_layers[prod] = [left, right]
        ko = 1 if (lo, hi) == (0, num_variables) else num_units
        s = SumLayer(num_units, ko, weight=const_param(rng.uniform(0.1, 1.0, (ko, num_units))))
        layers.append(s)
        in_layers[s] = [prod]
        return s

    root = build(0, num_variables)
    return Circuit(layers, in_layers, [root])


def build_bivariate_gaussian_pc(
    num_units: int = 2, *, rng: np.random.Generator | None = None
) -> Circuit:
    """Two Gaussian inputs -> Hadamard -> sum(1 output) with convex weights."""
    rng = RNG if rng is None else rng
    layers = []
    for v in range(2):
        mean = rng.normal(size=(num_units,))
        std = rng.uniform(0.5, 1.5, size=(num_units,))
        layers.append(
            GaussianLayer(
                Scope([v]), num_units, mean=const_param(mean), stddev=const_param(std)
            )
        )
    prod = HadamardLayer(num_units, arity=2)
    w = rng.uniform(0.1, 1.0, size=(1, num_units))
    w = w / w.sum()
    out = SumLayer(num_units, 1, weight=const_param(w))
    return Circuit(layers + [prod, out], {prod: layers, out: [prod]}, [out])


def build_mixing_categorical_pc(num_units=2, mix_arity=2, num_categories=3, seed=0):
    """A bivariate categorical PC whose root is an arity>=1 MIXING sum over
    ``mix_arity`` parallel Hadamard decompositions of the same (0, 1)
    partition — the smallest self-compatible circuit with a high-arity sum.
    Products of such circuits exercise the kron-weight column permutation in
    ``multiply_sum_layers`` (the reference gets this wrong)."""
    rng = np.random.default_rng(seed)
    leaves, hads = [], []
    for _ in range(mix_arity):
        pair = []
        for v in range(2):
            raw = rng.uniform(0.1, 1.0, size=(num_units, num_categories))
            pair.append(
                CategoricalLayer(
                    Scope([v]), num_units, num_categories=num_categories,
                    probs=const_param(raw / raw.sum(axis=1, keepdims=True)),
                )
            )
        leaves.extend(pair)
        hads.append(HadamardLayer(num_units, arity=2))
    out = SumLayer(
        num_units, 1, arity=mix_arity,
        weight=const_param(rng.uniform(0.1, 1.0, (1, mix_arity * num_units))),
    )
    in_layers = {h: leaves[2 * i : 2 * i + 2] for i, h in enumerate(hads)}
    in_layers[out] = hads
    return Circuit(leaves + hads + [out], in_layers, [out])


def build_pc_over(vars_, num_units=3, num_categories=3, seed=0):
    """A small categorical PC over arbitrary variable ids (mixture of
    per-variable categorical products) — used by the disjoint-scope
    product tests."""

    rng = np.random.default_rng(seed)
    leaves = []
    for v in vars_:
        raw = rng.uniform(0.1, 1.0, size=(num_units, num_categories))
        leaves.append(
            CategoricalLayer(
                Scope([v]), num_units, num_categories=num_categories,
                probs=const_param(raw / raw.sum(axis=1, keepdims=True)),
            )
        )
    prod = HadamardLayer(num_units, arity=len(vars_))
    root = SumLayer(
        num_units, 1, weight=const_param(rng.uniform(0.1, 1.0, (1, num_units)))
    )
    return Circuit(leaves + [prod, root], {prod: leaves, root: [prod]}, [root])
