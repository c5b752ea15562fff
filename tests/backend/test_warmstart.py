"""AOT warm-start bundles: save/load roundtrip equivalence, device-drawn
init reproducibility, and the manifest fingerprint gate.

The reference has no warm-start analogue — it re-traces and re-compiles the
torch modules on every process (ref: cirkit/pipeline.py); BASELINE.md's
compile row (~5.4-5.7 s) is the number the warm path exists to beat.
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax import warmstart
from cirkit_tpu.backend.jax.warmstart import (
    WarmStartError,
    load_bundle,
    save_bundle,
)
from cirkit_tpu.models import image_data
from cirkit_tpu.pipeline import PipelineContext


def _circuit(seed=7):
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True, seed=seed)
    sc = image_data(
        (1, 4, 4), "quad-tree-4", input_layer="categorical",
        num_input_units=4, sum_product_layer="cp", num_sum_units=4,
    )
    return ctx, ctx.compile(sc)


@pytest.fixture(scope="module")
def bundle_dir(tmp_path_factory):
    """One saved bundle shared across the module (AOT compile is the slow
    part; every test below only reads the artifact)."""
    ctx, cc = _circuit()
    path = tmp_path_factory.mktemp("warm") / "bundle"
    manifest = save_bundle(
        path, cc, store=dict(ctx.parameters), batch=8, with_integrate=True,
        extra_programs={
            "double": (lambda a: a * 2.0, (jnp.zeros((3,), jnp.float32),))
        },
    )
    return path, ctx, cc, manifest


def test_roundtrip_evaluate_matches_direct(bundle_dir):
    path, ctx, cc, manifest = bundle_dir
    b = load_bundle(path)
    store = cc.restrict_store(ctx.parameters)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (8, 16), dtype=np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(b.evaluate(store, x)), np.asarray(cc.evaluate(store, x)),
        rtol=1e-6,
    )


def test_bundled_integrate_matches_masked_evaluate(bundle_dir):
    path, ctx, cc, _ = bundle_dir
    from cirkit_tpu.backend.jax.queries import masked_evaluate

    b = load_bundle(path)
    store = cc.restrict_store(ctx.parameters)
    x = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (8, 16), dtype=np.int32)
    )
    mask = np.zeros((8, 16), dtype=bool)
    mask[:, ::2] = True
    np.testing.assert_allclose(
        np.asarray(b.integrate(store, x, jnp.asarray(mask))),
        np.asarray(masked_evaluate(cc, store, x, jnp.asarray(mask))),
        rtol=1e-6,
    )


def test_init_reproducible_and_spec_complete(bundle_dir):
    path, ctx, cc, manifest = bundle_dir
    b = load_bundle(path)
    s1, s2, s3 = b.init(0), b.init(0), b.init(1)
    spec = manifest["store_spec"]
    assert set(s1) == set(spec)
    for k, v in s1.items():
        assert list(v.shape) == spec[k]["shape"] and str(v.dtype) == spec[k]["dtype"]
        np.testing.assert_array_equal(np.asarray(v), np.asarray(s2[k]))
    assert any(
        not np.array_equal(np.asarray(s1[k]), np.asarray(s3[k])) for k in s1
    ), "different seeds must draw different stores"
    # a bundle-drawn store is a working store for the real circuit
    x = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (8, 16), dtype=np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(b.evaluate(s1, x)), np.asarray(cc.evaluate(s1, x)), rtol=1e-6
    )


def test_extra_programs_exposed(bundle_dir):
    path, *_ = bundle_dir
    b = load_bundle(path)
    np.testing.assert_allclose(
        np.asarray(b.double(jnp.asarray([1.0, 2.0, 3.0], jnp.float32))),
        [2.0, 4.0, 6.0],
    )


def test_bundled_train_step_matches_direct(tmp_path):
    """A full data-parallel training step — optimizer-state pytrees and all
    — rides extra_programs: warm TRAINING start, not just serving."""
    import optax

    from cirkit_tpu.parallel.training import data_parallel_step, split_trainable

    ctx, cc = _circuit(seed=21)
    optimizer = optax.adam(0.05)
    trainable, frozen = split_trainable(cc, dict(ctx.parameters))
    trainable = {k: jnp.asarray(v) for k, v in trainable.items()}
    opt_state = optimizer.init(trainable)
    step = data_parallel_step(cc, optimizer)
    x = jnp.asarray(
        np.random.default_rng(5).integers(0, 256, (8, 16), dtype=np.int32)
    )

    path = tmp_path / "train_bundle"
    save_bundle(
        path, cc, store=dict(ctx.parameters), batch=8,
        extra_programs={"train_step": (step, (trainable, frozen, opt_state, x))},
    )
    b = load_bundle(path)
    # the step donates its parameter buffers: hand each call its own copies
    fresh = lambda: (  # noqa: E731
        {k: jnp.array(v) for k, v in trainable.items()},
        optimizer.init({k: jnp.array(v) for k, v in trainable.items()}),
    )
    tr0, st0 = fresh()
    tr_b, st_b, loss_b = b.train_step(tr0, frozen, st0, x)
    tr1, st1 = fresh()
    tr_d, st_d, loss_d = step(tr1, frozen, st1, x)
    np.testing.assert_allclose(float(loss_b), float(loss_d), rtol=1e-7)
    for k in tr_d:
        np.testing.assert_array_equal(np.asarray(tr_b[k]), np.asarray(tr_d[k]))


def test_missing_bundle_raises(tmp_path):
    with pytest.raises(WarmStartError, match="No warm-start bundle"):
        load_bundle(tmp_path / "nope")


def test_operator_derived_circuit_rejected_at_save(tmp_path):
    """multiply(sc, sc) evaluates through pointer slots owned by the source
    circuit; a bundle's init() could never rebuild its store — save must
    fail loudly, not produce a broken artifact."""
    sc = image_data(
        (1, 4, 4), "quad-tree-4", input_layer="categorical",
        num_input_units=2, sum_product_layer="cp", num_sum_units=2,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=1)
    cc = ctx.compile(sc)
    cc_sq = ctx.multiply(cc, cc)
    if not set(cc_sq.used_slots) - set(cc_sq.slots):
        pytest.skip("compiler inlined the product parameters; nothing to gate")
    with pytest.raises(WarmStartError, match="operator-derived"):
        save_bundle(tmp_path / "sq", cc_sq, store=dict(ctx.parameters), batch=4)


def test_corrupt_program_raises(bundle_dir, tmp_path):
    """A truncated executable file fails the manifest's sha256 with a clear
    error instead of a pickle exception deep in deserialization."""
    path, *_ = bundle_dir
    clone = tmp_path / "corrupt"
    clone.mkdir()
    for f in Path(path).iterdir():
        (clone / f.name).write_bytes(f.read_bytes())
    exe = clone / "evaluate.jaxexec.pkl"
    exe.write_bytes(exe.read_bytes()[:-100])
    with pytest.raises(WarmStartError, match="corrupt"):
        load_bundle(clone)


def test_fingerprint_mismatch_raises(bundle_dir, tmp_path):
    path, *_ = bundle_dir
    clone = tmp_path / "stale"
    clone.mkdir()
    for f in Path(path).iterdir():
        (clone / f.name).write_bytes(f.read_bytes())
    m = json.loads((clone / "manifest.json").read_text())
    m["jax"] = "0.0.0"
    (clone / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(WarmStartError, match="jax mismatch"):
        load_bundle(clone)


def test_package_version_mismatch_raises(bundle_dir, tmp_path):
    """Executables bake in cirkit-tpu routing semantics (the 0.1.1
    sum-collapsed MAP fix): a bundle saved by a different package version —
    or by one predating the version field — must be rejected so stale
    programs never serve a fixed package."""
    path, *_ = bundle_dir
    for stale in ("0.0.9", None):
        clone = tmp_path / f"pkg-{stale}"
        clone.mkdir()
        for f in Path(path).iterdir():
            (clone / f.name).write_bytes(f.read_bytes())
        m = json.loads((clone / "manifest.json").read_text())
        assert "cirkit_tpu" in m  # the save path records it
        if stale is None:
            del m["cirkit_tpu"]  # pre-0.1.1 bundle: no field at all
        else:
            m["cirkit_tpu"] = stale
        (clone / "manifest.json").write_text(json.dumps(m))
        with pytest.raises(WarmStartError, match="cirkit_tpu mismatch"):
            load_bundle(clone)


def test_const_slots_ship_in_npz(tmp_path):
    """Frozen (constant-initialized) slots ride the npz, not the init
    program, and reload bit-exact. A logic WMC circuit's indicator weights
    are all constant, so its whole store is const slots."""
    from cirkit_tpu.models.logic import (
        ConjunctionNode,
        DisjunctionNode,
        LiteralNode,
        LogicalCircuit,
    )

    x0, x1 = LiteralNode(0), LiteralNode(1)
    c = ConjunctionNode()
    root = DisjunctionNode()
    lc = LogicalCircuit([x0, x1, c, root], {c: [x0, x1], root: [c]}, [root])
    sc = lc.build_circuit()
    ctx = PipelineContext(semiring="lse-sum", fold=True, seed=3)
    cc = ctx.compile(sc)
    path = tmp_path / "bundle"
    manifest = save_bundle(path, cc, store=dict(ctx.parameters), batch=4)
    assert manifest["const_slots"] and not manifest["random_slots"]
    b = load_bundle(path)
    store = b.init(0)
    ref = cc.restrict_store(ctx.parameters)
    for s in manifest["const_slots"]:
        np.testing.assert_array_equal(np.asarray(store[s]), np.asarray(ref[s]))
    x = jnp.asarray(
        np.random.default_rng(3).integers(0, 2, (4, 2), dtype=np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(b.evaluate(store, x)), np.asarray(cc.evaluate(ref, x)),
        rtol=1e-6,
    )
