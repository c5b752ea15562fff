"""Serialization + plotting tests: store round-trips preserve compiled
outputs across fold/optimize/semiring (ref:
``tests/backend/torch/test_serialization.py:17-32``), region-graph JSON
round-trips, and graphviz plotting smoke."""

import numpy as np
import pytest

from cirkit_tpu.models import image_data
from cirkit_tpu.models.region_graph import QuadTree, RegionGraph
from cirkit_tpu.models.region_graph.io import plot_region_graph
from cirkit_tpu.pipeline import PipelineContext
from cirkit_tpu.symbolic.io import plot_circuit
from cirkit_tpu.utils.checkpoint import load_store, save_store


def _small_circuit(fold, optimize, semiring):
    sc = image_data(
        (1, 4, 4),
        "quad-tree-2",
        input_layer="categorical",
        num_input_units=3,
        sum_product_layer="cp",
        num_sum_units=3,
    )
    ctx = PipelineContext(semiring=semiring, fold=fold, optimize=optimize)
    return sc, ctx, ctx.compile(sc)


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("optimize", [False, True])
@pytest.mark.parametrize("semiring", ["sum-product", "lse-sum"])
@pytest.mark.slow
def test_store_roundtrip_preserves_outputs(tmp_path, fold, optimize, semiring):
    _, ctx, cc = _small_circuit(fold, optimize, semiring)
    x = np.random.default_rng(0).integers(0, 256, size=(7, 16))
    before = np.asarray(cc(x))
    save_store(tmp_path / "ckpt.npz", dict(ctx.parameters))
    restored = load_store(tmp_path / "ckpt.npz")
    after = np.asarray(cc.jit_evaluate(restored, x))
    np.testing.assert_allclose(before, after, rtol=1e-12, atol=1e-12)


def test_store_roundtrip_nested_pytree(tmp_path):
    import jax.numpy as jnp

    tree = {
        "a": {"x": jnp.arange(3.0), "y": jnp.ones((2, 2))},
        "b": [jnp.zeros(2), {"c": jnp.full((1,), 7.0)}],
    }
    save_store(tmp_path / "t.npz", tree)
    got = load_store(tmp_path / "t.npz")
    np.testing.assert_array_equal(got["a"]["x"], [0, 1, 2])
    np.testing.assert_array_equal(got["b"][1]["c"], [7.0])
    assert isinstance(got["b"], list) and len(got["b"]) == 2


def test_store_roundtrip_optimizer_state_with_like(tmp_path):
    """A checkpointed optax optimizer state restores to its exact treedef
    (namedtuples, not lists) via load_store(..., like=...) and can be passed
    straight back to optimizer.update (ADVICE round 1)."""
    import jax
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, opt_state = optimizer.update(grads, opt_state, params)

    save_store(tmp_path / "opt.npz", {"params": params, "opt": opt_state})
    restored = load_store(
        tmp_path / "opt.npz", like={"params": params, "opt": optimizer.init(params)}
    )
    assert jax.tree_util.tree_structure(restored["opt"]) == jax.tree_util.tree_structure(
        opt_state
    )
    # the restored state is usable by optimizer.update without error
    updates, _ = optimizer.update(grads, restored["opt"], restored["params"])
    got = jax.tree_util.tree_leaves(restored["opt"])
    want = jax.tree_util.tree_leaves(opt_state)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-12)
    assert jax.tree_util.tree_structure(updates) == jax.tree_util.tree_structure(params)

    with pytest.raises(KeyError, match="no entry"):
        load_store(tmp_path / "opt.npz", like={"params": params, "missing": params})


def test_store_roundtrip_bf16_optimizer_state(tmp_path):
    """bfloat16 leaves (adam_lowmem moments) are not npz-native: they save
    widened to float32 and restore back to bf16 via the ``like`` dtypes,
    bit-exactly (bf16 -> f32 is lossless)."""
    import jax
    import jax.numpy as jnp

    from cirkit_tpu.parallel import adam_lowmem

    params = {"w": jnp.linspace(-1, 1, 16, dtype=jnp.float32)}
    opt = adam_lowmem(1e-2)
    state = opt.init(params)
    _, state = opt.update({"w": jnp.ones((16,), jnp.float32)}, state, params)

    save_store(tmp_path / "lm.npz", state)
    restored = load_store(tmp_path / "lm.npz", like=opt.init(params))
    assert restored.mu["w"].dtype == jnp.bfloat16
    assert int(restored.count) == 1
    np.testing.assert_array_equal(
        np.asarray(restored.nu["w"], np.float32), np.asarray(state.nu["w"], np.float32)
    )
    # the restored state drives the next update without error
    opt.update({"w": jnp.ones((16,), jnp.float32)}, restored, params)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from cirkit_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tree = {"w": jnp.arange(6.0).reshape(2, 3), "opt": {"mu": jnp.zeros(4)}}
    save_checkpoint(tmp_path / "orbax_ckpt", tree)
    got = load_checkpoint(tmp_path / "orbax_ckpt")
    np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(tree["w"]))
    np.testing.assert_array_equal(np.asarray(got["opt"]["mu"]), np.zeros(4))


def test_region_graph_json_roundtrip(tmp_path):
    rg = QuadTree((1, 4, 4))
    path = tmp_path / "rg.json"
    rg.dump(str(path))
    rg2 = RegionGraph.load(str(path))
    assert len(list(rg2.nodes)) == len(list(rg.nodes))
    assert rg2.is_structured_decomposable == rg.is_structured_decomposable


def test_plot_circuit_and_region_graph(tmp_path):
    graphviz = pytest.importorskip("graphviz")
    sc, _, _ = _small_circuit(True, False, "lse-sum")
    dot = plot_circuit(sc)
    assert isinstance(dot, graphviz.Digraph)
    src = dot.source
    assert "+" in src and "⊙" in src
    rg = QuadTree((1, 4, 4))
    dot2 = plot_region_graph(rg)
    assert isinstance(dot2, graphviz.Digraph)
    # file rendering needs the graphviz binary; skip silently if missing
    try:
        plot_circuit(sc, out_path=tmp_path / "circuit.svg")
        assert (tmp_path / "circuit.svg").exists()
    except graphviz.ExecutableNotFound:
        pass


def test_symbolic_circuit_roundtrip_learned_structures(tmp_path):
    """save_circuit/load_circuit persist structures no template rebuilds:
    a LearnSPN circuit and a pruned circuit reload and compile to the
    same distribution."""
    import itertools

    from cirkit_tpu.backend.jax.pruning import prune_circuit
    from cirkit_tpu.models import learn_spn
    from cirkit_tpu.utils.checkpoint import load_circuit, save_circuit

    rng = np.random.default_rng(5)
    data = rng.integers(0, 3, size=(300, 4))
    sc = learn_spn(data, input_type="categorical", min_instances=50, seed=0)
    save_circuit(tmp_path / "spn.ckt", sc)
    sc2 = load_circuit(tmp_path / "spn.ckt")
    worlds = np.array(list(itertools.product(range(3), repeat=4)))
    a = np.asarray(PipelineContext(semiring="lse-sum", fold=True).compile(sc)(worlds))
    b = np.asarray(PipelineContext(semiring="lse-sum", fold=True).compile(sc2)(worlds))
    np.testing.assert_allclose(a, b, rtol=1e-12)

    ctx = PipelineContext(semiring="lse-sum", fold=True)
    ctx.compile(sc)
    pruned, _ = prune_circuit(sc, ctx=ctx, threshold=1e-4)
    save_circuit(tmp_path / "pruned.ckt", pruned)
    pruned2 = load_circuit(tmp_path / "pruned.ckt")
    c = np.asarray(PipelineContext(semiring="lse-sum", fold=True).compile(pruned)(worlds))
    d = np.asarray(PipelineContext(semiring="lse-sum", fold=True).compile(pruned2)(worlds))
    np.testing.assert_allclose(c, d, rtol=1e-12)

    with pytest.raises(ValueError, match="not a cirkit-tpu circuit"):
        save_store(tmp_path / "x.npz", {"a": np.zeros(2)})
        load_circuit(tmp_path / "x.npz")


def test_symbolic_circuit_roundtrip_partial_overlap_product(tmp_path):
    """save_circuit/load_circuit persist an operator-derived partial-overlap
    product: the one-hot broadcast selection sums and distribute layers the
    multiply introduces reload and compile to the same distribution."""
    import itertools

    import cirkit_tpu.symbolic.functional as SF
    from cirkit_tpu.utils.checkpoint import load_circuit, save_circuit
    from tests.reference_eval import eval_circuit
    from tests.test_fuzz_circuits import _restrict_tree, _tree_pc

    tree = ((0, 1), (2, (3, 4)))
    sc1 = _tree_pc(_restrict_tree(tree, {0, 1, 2, 3}), 2, 31, 41)
    sc2 = _tree_pc(_restrict_tree(tree, {2, 3, 4}), 3, 51, 61)
    psc = SF.multiply(sc1, sc2)
    worlds = np.array(list(itertools.product(range(2), repeat=5)), dtype=np.int64)
    want = eval_circuit(psc, worlds)[:, 0, 0]

    save_circuit(tmp_path / "prod.ckt", psc)
    re = load_circuit(tmp_path / "prod.ckt")
    got = eval_circuit(re, worlds)[:, 0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(re)
    got2 = np.exp(np.asarray(cc(ctx.parameters, worlds))[:, 0, 0])
    np.testing.assert_allclose(got2, want, rtol=1e-9)


def test_full_persistence_flow_template_circuit(tmp_path):
    """The circuit + trained-store persistence flow: slot allocation is
    deterministic per compile order, so a reloaded circuit compiled FIRST
    in a fresh context resolves the saved store's slots."""
    from cirkit_tpu.utils.checkpoint import load_circuit, save_circuit

    sc, ctx, cc = _small_circuit(True, True, "lse-sum")
    x = np.random.default_rng(1).integers(0, 256, size=(5, 16))
    before = np.asarray(cc(x))
    save_circuit(tmp_path / "c.ckt", sc)
    save_store(tmp_path / "s.npz", dict(ctx.parameters))

    sc2 = load_circuit(tmp_path / "c.ckt")
    ctx2 = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc2 = ctx2.compile(sc2)
    store2 = load_store(tmp_path / "s.npz")
    after = np.asarray(cc2.jit_evaluate(cc2.restrict_store(store2), x))
    np.testing.assert_allclose(before, after, rtol=1e-12, atol=1e-12)
