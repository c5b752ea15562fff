import jax, jax.numpy as jnp, numpy as np, time, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cirkit_tpu.ops import lse_einsum as L

F, B, K, O = 784, 128, 64, 64
rng = np.random.default_rng(0)
x1 = jnp.asarray(rng.normal(size=(F,B,K)), jnp.float32)
x2 = jnp.asarray(rng.normal(size=(F,B,K)), jnp.float32)
th = jnp.asarray(rng.normal(size=(F,O,K*K)), jnp.float32)

def timeit2(name, f, *a, iters=40):
    try:
        r = f(*a); _=float(jnp.sum(r))
        t0=time.perf_counter()
        for _i in range(iters): r=f(*a)
        s = float(jnp.sum(r))
        dt=(time.perf_counter()-t0)/iters
        print(f"{name}: {dt*1e3:.2f} ms (sum={s:.1f})", flush=True)
    except Exception as e:
        print(name, "FAIL:", str(e).split(chr(10))[0][:120], flush=True)

def spec3(bt,k): return pl.BlockSpec((1,bt,k), lambda f,b:(f,b,0), memory_space=pltpu.VMEM)
wspec = pl.BlockSpec((1,O,K*K), lambda f,b:(f,0,0), memory_space=pltpu.VMEM)
def run(kern):
    f = lambda a,b,c: pl.pallas_call(kern, grid=(F,1),
        in_specs=[spec3(B,K),spec3(B,K),wspec], out_specs=spec3(B,O),
        out_shape=jax.ShapeDtypeStruct((F,B,O), jnp.float32))(a,b,c)
    return jax.jit(f)

cfg = L._Cfg(bt=128, nbt=1, interpret=False, fast=False, softmax=True, tucker=True)
timeit2("V0 current", run(functools.partial(L._fwd_kernel, cfg)), x1, x2, th)

# V1: no division; subtract log(se) transposed on the output
def kV1(x1r, x2r, wr, orf):
    (e1, e2), shift = L._shifted_exp((x1r[0], x2r[0]))
    e1r = L._repeat_each(e1, K, fast=False)
    e = e1r * pltpu.repeat(e2, K, axis=1)
    t = wr[0]
    mx = jnp.max(t, axis=-1, keepdims=True)
    wexp = jnp.exp(t - mx)
    se = jnp.sum(wexp, axis=-1, keepdims=True)  # (O,1)
    y = L._dot3(e, wexp, ((1,),(1,)), fast=False)
    orf[0] = jnp.log(y) - jnp.log(se).T + shift
timeit2("V1 log-side norm", run(kV1), x1, x2, th)

# V2: single split of wexp via exp in bf16-pair (hi from exp, lo residual)
def kV2(x1r, x2r, wr, orf):
    (e1, e2), shift = L._shifted_exp((x1r[0], x2r[0]))
    e1r = L._repeat_each(e1, K, fast=False)
    e = e1r * pltpu.repeat(e2, K, axis=1)
    eh, el = L._split(e)
    t = wr[0]
    mx = jnp.max(t, axis=-1, keepdims=True)
    wexp = jnp.exp(t - mx)
    se = jnp.sum(wexp, axis=-1, keepdims=True)
    wh = wexp.astype(jnp.bfloat16)
    wl = (wexp - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    y = L._dot1(eh, wh, ((1,),(1,))) + L._dot1(eh, wl, ((1,),(1,))) + L._dot1(el, wh, ((1,),(1,)))
    orf[0] = jnp.log(y) - jnp.log(se).T + shift
timeit2("V2 v1+fewer-w-ops", run(kV2), x1, x2, th)
