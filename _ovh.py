import jax, jax.numpy as jnp, numpy as np, time, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cirkit_tpu.ops import lse_einsum as L

def timeit2(name, f, *a, iters=50):
    r = f(*a); _=float(jnp.sum(r))
    t0=time.perf_counter()
    for _i in range(iters): r=f(*a)
    _=float(jnp.sum(r))
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)

K = O = 64
rng = np.random.default_rng(0)
for F in [2, 8, 42, 196, 784]:
    x1 = jnp.asarray(rng.normal(size=(F,128,K)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(F,128,K)), jnp.float32)
    th = jnp.asarray(rng.normal(size=(F,O,K*K)), jnp.float32)
    timeit2(f"tucker_sm F={F}", jax.jit(L.lse_tucker2_softmax), x1, x2, th)
# an XLA no-op chain for dispatch reference
timeit2("xla-tiny", jax.jit(lambda a: a*2+1), jnp.ones((8,8)))
