"""Low-memory Adam: unbiased stochastic rounding, parity with optax, and the
EMA-stall failure mode it exists to avoid."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cirkit_tpu.parallel.optimizers import LowMemAdamState, _sr_to_bf16, adam_lowmem


def _sr_many(x, n, seed):
    """n independent stochastic roundings of the scalar x (via 4-wide rows)."""
    bits = jax.random.bits(jax.random.PRNGKey(seed), (n, 4), jnp.uint32)
    return jax.vmap(lambda r: _sr_to_bf16(jnp.full((4,), x), r))(bits).astype(jnp.float32)


def test_sr_cast_rounds_to_neighbors_and_is_unbiased():
    # bf16 spacing in [1, 2) is 2^-7; pick x 30% of the way up the gap
    x = jnp.float32(1.0 + 0.3 * 2.0**-7)
    lo, hi = 1.0, 1.0 + 2.0**-7
    outs = _sr_many(x, 4096, seed=0)
    assert set(np.unique(np.asarray(outs))) <= {lo, hi}
    # P(round up) = 0.3 -> mean converges to x (se ~ spacing*0.46/sqrt(4n))
    np.testing.assert_allclose(float(jnp.mean(outs)), float(x), atol=1e-4)


def test_sr_cast_unbiased_for_negative_values():
    x = -jnp.float32(3.0) * (1.0 + 0.7 * 2.0**-8)
    outs = _sr_many(x, 4096, seed=1)
    np.testing.assert_allclose(float(jnp.mean(outs)), float(x), rtol=5e-5)


def test_f32_state_matches_optax_adam_exactly():
    """state_dtype=float32 skips the rounding: trajectories equal optax."""

    def run(opt):
        params = {"w": jnp.array([1.0, -2.0, 0.5], jnp.float32)}
        state = opt.init(params)
        for t in range(25):
            grads = {"w": jnp.array([0.1 * (t + 1), -0.3, 2.0], jnp.float32)}
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        return params["w"]

    ours = run(adam_lowmem(1e-2, state_dtype=jnp.float32))
    ref = run(optax.adam(1e-2))
    # op-ordering differences keep this at f32 rounding level, not exact bits
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bf16_moments_track_ema_where_plain_rounding_stalls():
    """Constant gradient g: nu must converge toward g^2. Deterministic bf16
    EMA stalls near zero because (1-b2)*g^2 increments vanish against warm
    nu; the stochastically rounded moments keep tracking."""
    g = jnp.full((256,), 0.125, jnp.float32)
    opt = adam_lowmem(1e-3, b2=0.999)
    params = {"w": jnp.zeros((256,), jnp.float32)}
    state = opt.init(params)
    steps = 3000
    for _ in range(steps):
        updates, state = opt.update({"w": g}, state, params)
    nu = np.asarray(state.nu["w"].astype(jnp.float32))
    expected = float(g[0]) ** 2 * (1 - 0.999**steps)  # ~0.0148
    # SR noise averages out over 256 independent lanes
    np.testing.assert_allclose(nu.mean(), expected, rtol=0.05)

    # the deterministic-rounding counterfactual really does stall
    nu_det = jnp.zeros((), jnp.bfloat16)
    for _ in range(200):
        nu_det = (0.999 * nu_det.astype(jnp.float32) + 1e-3 * g[0] ** 2).astype(jnp.bfloat16)
    stalled = float(nu_det.astype(jnp.float32))
    assert stalled < 0.5 * expected * (1 - 0.999**200) / (1 - 0.999**steps) or stalled < 0.005


def test_bf16_adam_trajectory_close_to_f32_adam():
    """On a quadratic, the bf16-state trajectory stays within a few percent
    of exact Adam."""

    def run(opt, steps=200):
        params = jnp.array(np.linspace(-2, 2, 64), jnp.float32)
        target = jnp.array(np.linspace(1, -1, 64), jnp.float32)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            grads = params - target
            updates, state = opt.update(grads, state, params)
            return optax.apply_updates(params, updates), state

        for _ in range(steps):
            params, state = step(params, state)
        return np.asarray(params)

    ours = run(adam_lowmem(5e-2))
    ref = run(optax.adam(5e-2))
    np.testing.assert_allclose(ours, ref, atol=0.03)


def test_state_dtype_is_bfloat16_and_zero1_shardable():
    from jax.sharding import PartitionSpec as P

    from cirkit_tpu.parallel import default_mesh
    from cirkit_tpu.parallel.training import zero1_state_shardings

    params = {"w": jnp.zeros((8, 4), jnp.float32), "b": jnp.zeros((3,), jnp.float32)}
    opt = adam_lowmem(1e-3)
    state = opt.init(params)
    assert state.mu["w"].dtype == jnp.bfloat16
    assert state.nu["b"].dtype == jnp.bfloat16

    shardings = zero1_state_shardings(state, default_mesh(8))
    assert shardings.mu["w"].spec == P("data")  # fold axis divides the mesh
    assert shardings.count.spec == P()


@pytest.mark.slow
def test_fit_trains_with_lowmem_adam():
    from cirkit_tpu.models import image_data
    from cirkit_tpu.parallel import fit
    from cirkit_tpu.pipeline import PipelineContext

    ctx = PipelineContext(semiring="lse-sum", fold=True)
    sc = image_data(
        (1, 4, 4), "quad-tree-2", input_layer="categorical",
        num_input_units=4, sum_product_layer="cp", num_sum_units=4,
    )
    cc = ctx.compile(sc)
    data = np.random.default_rng(0).integers(0, 256, size=(256, 16))
    _, losses = fit(
        cc, data, num_epochs=4, batch_size=64,
        optimizer=adam_lowmem(5e-2), key=jax.random.PRNGKey(0),
    )
    assert losses[-1] < losses[0]
