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
        _=float(jnp.sum(r))
        dt=(time.perf_counter()-t0)/iters
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(name, "FAIL:", str(e).split(chr(10))[0][:100], flush=True)

def spec3(bt,k): return pl.BlockSpec((1,bt,k), lambda f,b:(f,b,0), memory_space=pltpu.VMEM)
wspec = pl.BlockSpec((1,O,K*K), lambda f,b:(f,0,0), memory_space=pltpu.VMEM)
def run(kern):
    return jax.jit(lambda a,b,c: pl.pallas_call(kern, grid=(F,1),
        in_specs=[spec3(B,K),spec3(B,K),wspec], out_specs=spec3(B,O),
        out_shape=jax.ShapeDtypeStruct((F,B,O), jnp.float32))(a,b,c))

def base(x1r, x2r, wr, orf, *, repeat=True, sdot=True, softmax=True, split=True):
    (e1, e2), shift = L._shifted_exp((x1r[0], x2r[0]))
    e1r = L._repeat_each(e1, K, fast=False) if sdot else jnp.broadcast_to(e1, (B, K)).astype(jnp.float32)
    if not sdot:
        e1r = jnp.concatenate([e1]*64, axis=1)  # fake same-shape
    e2t = pltpu.repeat(e2, K, axis=1) if repeat else e1r
    e = e1r * e2t
    w = wr[0]
    if softmax:
        w = L._softmax_rows(w)
    y = L._dot3(e, w, ((1,),(1,)), fast=not split)
    orf[0] = jnp.log(y) + shift

timeit2("A full", run(functools.partial(base)), x1, x2, th)
timeit2("B no-repeat", run(functools.partial(base, repeat=False)), x1, x2, th)
timeit2("C no-sdot(concat)", run(functools.partial(base, sdot=False)), x1, x2, th)
timeit2("D no-softmax", run(functools.partial(base, softmax=False)), x1, x2, th)
timeit2("E fast-main", run(functools.partial(base, split=False)), x1, x2, th)
timeit2("F no-sm,no-split", run(functools.partial(base, softmax=False, split=False)), x1, x2, th)
# G: bare minimum: one bf16 matmul on repeat-built e
def g(x1r, x2r, wr, orf):
    (e1, e2), shift = L._shifted_exp((x1r[0], x2r[0]))
    e = pltpu.repeat(e1, K, axis=1) * pltpu.repeat(e2, K, axis=1)
    y = L._dot1(e.astype(jnp.bfloat16), wr[0].astype(jnp.bfloat16), ((1,),(1,)))
    orf[0] = jnp.log(y) + shift
timeit2("G minimal", run(g), x1, x2, th)
