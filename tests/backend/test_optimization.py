"""Optimization-pass tests: fused/shattered circuits must produce identical
outputs and actually contain the optimized layers (ref:
``cirkit/backend/torch/optimization/``)."""

import numpy as np
import pytest

from cirkit_tpu.backend.jax.optimized import JaxCPTLayer, JaxTensorDotLayer, JaxTuckerLayer
from cirkit_tpu.pipeline import PipelineContext

from tests.fixtures import build_bivariate_categorical_pc, build_multivariate_categorical_pc
from tests.reference_eval import enumerate_worlds, eval_circuit

GRID = [(f, s) for f in (False, True) for s in ("sum-product", "lse-sum")]


def _layer_types(cc):
    return [type(l).__name__ for l in cc.layers]


@pytest.mark.parametrize("fold,semiring", GRID)
@pytest.mark.parametrize("sum_product", ["cp", "cp-t", "tucker"])
@pytest.mark.slow
def test_optimized_image_circuit_matches_unoptimized(fold, semiring, sum_product):
    from cirkit_tpu.models import image_data

    sc = image_data(
        (1, 4, 4),
        "quad-tree-2",
        input_layer="categorical",
        num_input_units=3,
        sum_product_layer=sum_product,
        num_sum_units=3,
    )
    ctx_o = PipelineContext(semiring=semiring, fold=fold, optimize=True, seed=3)
    ctx_u = PipelineContext(semiring=semiring, fold=fold, optimize=False, seed=3)
    cc_o = ctx_o.compile(sc)
    cc_u = ctx_u.compile(sc)
    x = np.random.default_rng(0).integers(0, 256, size=(8, 16))
    np.testing.assert_allclose(
        np.asarray(cc_o(x)), np.asarray(cc_u(x)), rtol=1e-8, atol=1e-10
    )
    names = _layer_types(cc_o)
    if sum_product == "tucker":
        assert any(n == "JaxTuckerLayer" for n in names)
    if sum_product == "cp-t":
        assert any(n == "JaxCPTLayer" for n in names)


@pytest.mark.parametrize("semiring", ["sum-product", "lse-sum"])
def test_sum_collapse(semiring):
    """Two stacked arity-1 sums fuse into one with matmul'd weights."""
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, SumLayer
    from cirkit_tpu.utils import Scope
    from tests.fixtures import const_param

    rng = np.random.default_rng(30)
    probs = rng.uniform(0.1, 1.0, (3, 2))
    x0 = CategoricalLayer(
        Scope([0]), 3, num_categories=2, probs=const_param(probs / probs.sum(1, keepdims=True))
    )
    s1 = SumLayer(3, 4, weight=const_param(rng.uniform(0.1, 1.0, (4, 3))))
    s2 = SumLayer(4, 2, weight=const_param(rng.uniform(0.1, 1.0, (2, 4))))
    sc = Circuit([x0, s1, s2], {s1: [x0], s2: [s1]}, [s2])

    ctx = PipelineContext(semiring=semiring, fold=True, optimize=True)
    cc = ctx.compile(sc)
    assert sum(n == "JaxSumLayer" for n in _layer_types(cc)) == 1
    worlds = enumerate_worlds(1, 2)
    got = np.asarray(cc(worlds))[:, 0]
    want = eval_circuit(sc, worlds)[:, 0]
    if semiring == "lse-sum":
        want = np.log(want)
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize("fold", [False, True])
def test_tensordot_shatter_on_product_circuit(fold):
    """Multiplying two circuits gives sum layers with Kronecker-factored
    weights; the shatter rule splits them into tensor-dot pairs."""
    import cirkit_tpu.symbolic.functional as SF

    sc1 = build_multivariate_categorical_pc(rng=np.random.default_rng(31))
    sc2 = build_multivariate_categorical_pc(rng=np.random.default_rng(32))
    psc = SF.multiply(sc1, sc2)
    ctx = PipelineContext(semiring="lse-sum", fold=fold, optimize=True)
    cc = ctx.compile(psc)
    assert any(isinstance(l, JaxTensorDotLayer) for l in cc.layers)
    worlds = enumerate_worlds(4, 2)
    got = np.asarray(cc(worlds))[:, 0, 0]
    want = np.log(
        eval_circuit(sc1, worlds)[:, 0, 0] * eval_circuit(sc2, worlds)[:, 0, 0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_log_softmax_fusion_in_product_logits():
    """Multiplying softmax-parameterized categoricals creates log(softmax(w))
    chains that fuse into log_softmax."""
    import cirkit_tpu.symbolic.functional as SF
    from cirkit_tpu.backend.jax.parameters import JaxLogSoftmaxParameter

    sc1 = build_bivariate_categorical_pc(use_softmax=True, rng=np.random.default_rng(33))
    sc2 = build_bivariate_categorical_pc(use_softmax=True, rng=np.random.default_rng(34))
    psc = SF.multiply(sc1, sc2)
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(psc)
    has_fused = any(
        isinstance(node, JaxLogSoftmaxParameter)
        for layer in cc.layers
        for p in layer.params.values()
        for node in p.nodes
    )
    assert has_fused
    worlds = enumerate_worlds(2, 3)
    got = np.asarray(cc(worlds))[:, 0, 0]
    want = np.log(
        eval_circuit(sc1, worlds)[:, 0, 0] * eval_circuit(sc2, worlds)[:, 0, 0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_outer_product_reduce_einsum_fusion():
    """Integrating a product of embedding circuits yields
    reduce-sum(outer-product(w1, w2)) values that fuse into one einsum."""
    import cirkit_tpu.symbolic.functional as SF
    from cirkit_tpu.backend.jax.parameters import JaxEinsumParameter
    from cirkit_tpu.symbolic import Circuit, EmbeddingLayer, HadamardLayer, SumLayer
    from cirkit_tpu.utils import Scope
    from tests.fixtures import const_param

    rng = np.random.default_rng(35)

    def build():
        embs = [
            EmbeddingLayer(
                Scope([v]), 2, num_states=3, weight=const_param(rng.uniform(0.1, 1, (2, 3)))
            )
            for v in range(2)
        ]
        h = HadamardLayer(2, arity=2)
        s = SumLayer(2, 1, weight=const_param(rng.uniform(0.1, 1, (1, 2))))
        return Circuit(embs + [h, s], {h: embs, s: [h]}, [s])

    sc1, sc2 = build(), build()
    psc = SF.multiply(sc1, sc2)
    ipsc = SF.integrate(psc)
    ctx = PipelineContext(semiring="sum-product", fold=True, optimize=True)
    ctx.compile(psc)
    cc = ctx.compile(ipsc)
    has_einsum = any(
        isinstance(node, JaxEinsumParameter)
        for layer in cc.layers
        for p in layer.params.values()
        for node in p.nodes
    )
    assert has_einsum
    worlds = enumerate_worlds(2, 3)
    want = (eval_circuit(sc1, worlds)[:, 0, 0] * eval_circuit(sc2, worlds)[:, 0, 0]).sum()
    got = float(np.asarray(cc(batch_size=1))[0, 0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_user_registered_layer_optimization_rule():
    """A user-registered fusion rule fires without touching package code and
    takes precedence over the default rule for the same shape of pattern
    (ref: ``backend/torch/optimization/registry.py:1-50``)."""
    from cirkit_tpu.backend.jax.optimization import LayerOptPattern
    from cirkit_tpu.backend.jax.layers import JaxHadamardLayer, JaxSumLayer
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, HadamardLayer, SumLayer
    from cirkit_tpu.utils import Scope
    from tests.fixtures import const_param

    class MarkedCPTLayer(JaxCPTLayer):
        """Same semantics as the stock CP-T layer, distinct type."""

    def apply_marked_candecomp(compiler, match):
        dense, hadamard = match.entries
        return (
            MarkedCPTLayer(
                hadamard.num_input_units,
                dense.num_output_units,
                hadamard.arity,
                weight=dense.weight,
                semiring=compiler.semiring,
            ),
        )

    rng = np.random.default_rng(36)
    probs = rng.uniform(0.1, 1.0, (2, 3, 2))
    ins = [
        CategoricalLayer(
            Scope([v]), 3, num_categories=2,
            probs=const_param(probs[v] / probs[v].sum(1, keepdims=True)),
        )
        for v in range(2)
    ]
    h = HadamardLayer(3, arity=2)
    s = SumLayer(3, 2, weight=const_param(rng.uniform(0.1, 1.0, (2, 3))))
    sc = Circuit(ins + [h, s], {h: ins, s: [h]}, [s])

    pattern = LayerOptPattern(
        entries=(JaxSumLayer, JaxHadamardLayer), configs=({"arity": 1}, {})
    )
    ctx = PipelineContext(semiring="sum-product", fold=True, optimize=True)
    ctx.add_layer_optimization_rule(pattern, apply_marked_candecomp)
    cc = ctx.compile(sc)
    assert any(type(l) is MarkedCPTLayer for l in cc.layers)

    worlds = enumerate_worlds(2, 2)
    got = np.asarray(cc(worlds))[:, 0]
    want = eval_circuit(sc, worlds)[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_user_registered_parameter_optimization_rule():
    """A user parameter-graph rewrite fires: exp(log(w)) collapses to w."""
    from cirkit_tpu.backend.jax import parameters as jp
    from cirkit_tpu.backend.jax.optimization import ParameterOptPattern
    from cirkit_tpu.symbolic import CategoricalLayer, Circuit, SumLayer
    from cirkit_tpu.symbolic.parameters import (
        ExpParameter, LogParameter, Parameter, TensorParameter,
    )
    from cirkit_tpu.symbolic.initializers import ConstantTensorInitializer
    from cirkit_tpu.utils import Scope

    rng = np.random.default_rng(37)
    w = rng.uniform(0.1, 1.0, (2, 3))
    leaf = TensorParameter(2, 3, initializer=ConstantTensorInitializer(w))
    weight = Parameter.from_unary(
        ExpParameter(leaf.shape), Parameter.from_unary(LogParameter(leaf.shape), leaf)
    )
    probs = rng.uniform(0.1, 1.0, (3, 2))
    from tests.fixtures import const_param

    x0 = CategoricalLayer(
        Scope([0]), 3, num_categories=2,
        probs=const_param(probs / probs.sum(1, keepdims=True)),
    )
    s = SumLayer(3, 2, weight=weight)
    sc = Circuit([x0, s], {s: [x0]}, [s])

    pattern = ParameterOptPattern(entries=(jp.JaxExpParameter, jp.JaxLogParameter))

    def apply_exp_log_identity(compiler, match):
        log_node = match.entries[1]
        return (jp.JaxClampParameter(log_node.in_shapes[0], vmin=None, vmax=None),)

    ctx = PipelineContext(semiring="sum-product", fold=True, optimize=True)
    ctx.add_parameter_optimization_rule(pattern, apply_exp_log_identity)
    cc = ctx.compile(sc)
    kinds = {
        type(node).__name__
        for layer in cc.layers
        for p in layer.params.values()
        for node in p.nodes
    }
    assert "JaxExpParameter" not in kinds and "JaxLogParameter" not in kinds

    worlds = enumerate_worlds(1, 2)
    got = np.asarray(cc(worlds))[:, 0]
    want = eval_circuit(sc, worlds)[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-9)
