import jax, jax.numpy as jnp, numpy as np, time, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cirkit_tpu.ops import lse_einsum as L

F, B, K, O = 784, 128, 64, 64
rng = np.random.default_rng(0)
x1 = jnp.asarray(rng.normal(size=(F,B,K)), jnp.float32)
x2 = jnp.asarray(rng.normal(size=(F,B,K)), jnp.float32)
th = jnp.asarray(rng.normal(size=(F,O,K*K)), jnp.float32)
cfg = L._Cfg(bt=128, nbt=1, interpret=False, fast=False, softmax=True, tucker=True)

def timeit2(name, f, *a, iters=40):
    r = f(*a); _=float(jnp.sum(r))
    best = float("inf")
    for _round in range(3):
        t0=time.perf_counter()
        for _i in range(iters): r=f(*a)
        _=float(jnp.sum(r))
        best = min(best, (time.perf_counter()-t0)/iters)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)

def spec3(bt,k,nd3=True):
    return pl.BlockSpec((1,bt,k), (lambda fi,bi:(fi,bi,0)) if nd3 else (lambda fi:(fi,0,0)), memory_space=pltpu.VMEM)

# A: current op
timeit2("A current", jax.jit(L.lse_tucker2_softmax), x1, x2, th)

# B: no cost_estimate
def runB(a,b,c):
    return pl.pallas_call(functools.partial(L._fwd_kernel, cfg), grid=(F,1),
        in_specs=[spec3(B,K),spec3(B,K),pl.BlockSpec((1,O,K*K), lambda f,b:(f,0,0), memory_space=pltpu.VMEM)],
        out_specs=spec3(B,O),
        out_shape=jax.ShapeDtypeStruct((F,B,O), jnp.float32))(a,b,c)
timeit2("B no-cost-est", jax.jit(runB), x1, x2, th)

# C: 1-D grid
def runC(a,b,c):
    return pl.pallas_call(functools.partial(L._fwd_kernel, cfg), grid=(F,),
        in_specs=[spec3(B,K,False),spec3(B,K,False),pl.BlockSpec((1,O,K*K), lambda f:(f,0,0), memory_space=pltpu.VMEM)],
        out_specs=spec3(B,O,False),
        out_shape=jax.ShapeDtypeStruct((F,B,O), jnp.float32))(a,b,c)
timeit2("C 1d-grid", jax.jit(runC), x1, x2, th)
