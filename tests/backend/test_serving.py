"""bf16-resident weight stores: slot detection, fast-grade forward accuracy
through the Pallas kernels (interpret mode) and the XLA fallback, and query
compatibility."""

import jax.numpy as jnp
import numpy as np
import pytest

from cirkit_tpu.backend.jax import bf16_weight_store, weight_slots
from cirkit_tpu.models import image_data
from cirkit_tpu.pipeline import PipelineContext


def _circuit(sp, optimize=True, seed=4):
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=optimize, seed=seed)
    sc = image_data(
        (1, 4, 4), "quad-graph", input_layer="categorical",
        num_input_units=4, sum_product_layer=sp, num_sum_units=4,
    )
    return ctx, ctx.compile(sc)


@pytest.mark.parametrize("force_pallas", [False, True])
@pytest.mark.parametrize("sp", ["cp", "tucker"])
def test_bf16_weight_store_fast_grade_forward(sp, force_pallas, monkeypatch):
    if force_pallas:
        monkeypatch.setenv("CIRKIT_TPU_FORCE_PALLAS", "1")
    ctx, cc = _circuit(sp)
    store32 = {k: jnp.asarray(v, jnp.float32) for k, v in cc.restrict_store(ctx.parameters).items()}
    storebf = bf16_weight_store(cc, store32)
    slots = weight_slots(cc)
    assert slots and all(storebf[s].dtype == jnp.bfloat16 for s in slots)
    # non-weight slots keep their dtype
    assert all(storebf[k].dtype == v.dtype for k, v in store32.items() if k not in slots)

    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(16, 16), dtype=np.int32))
    a = np.asarray(cc.evaluate(store32, x))
    b = np.asarray(cc.evaluate(storebf, x))
    assert np.isfinite(b).all()
    # round-to-nearest bf16 weight grade (documented fast-mode bound)
    np.testing.assert_allclose(b, a, atol=2e-2)


def test_bf16_weight_store_queries_run(monkeypatch):
    monkeypatch.setenv("CIRKIT_TPU_FORCE_PALLAS", "1")
    import jax

    from cirkit_tpu.backend.jax import IntegrateQuery, MAPQuery

    ctx, cc = _circuit("cp")
    store = bf16_weight_store(
        cc, {k: jnp.asarray(v, jnp.float32) for k, v in cc.restrict_store(ctx.parameters).items()}
    )
    x = jnp.asarray(np.random.default_rng(1).integers(0, 256, size=(4, 16), dtype=np.int32))
    mask = np.zeros((4, 16), dtype=bool)
    mask[:, :8] = True
    marg = IntegrateQuery(cc)(x, integrate_vars=jnp.asarray(mask), store=store)
    assert np.isfinite(np.asarray(marg)).all()
    asg, val = MAPQuery(cc)(x, evidence_mask=jnp.asarray(~mask), store=store)
    assert np.isfinite(np.asarray(val)).all()
