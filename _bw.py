import jax, jax.numpy as jnp, numpy as np, time
w = jnp.asarray(np.random.default_rng(0).uniform(0,1,(784,64,4096)), jnp.float32)
ones = jnp.ones((4096, 8), jnp.float32)
def timeit2(name, f, *a, iters=30, bytes_=None):
    r = f(*a); _=float(jnp.sum(r))
    t0=time.perf_counter()
    for _i in range(iters): r=f(*a)
    _=float(jnp.sum(r))
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms {bytes_/dt/1e9:.0f} GB/s", flush=True)
timeit2("sum-axis0", jax.jit(lambda w: w.sum(0)), w, bytes_=w.nbytes)
timeit2("sum-all", jax.jit(lambda w: w.sum()), w, bytes_=w.nbytes)
timeit2("dot-ones bf16", jax.jit(lambda w: jnp.einsum('foi,ik->fok', w.astype(jnp.bfloat16), ones.astype(jnp.bfloat16))), w, bytes_=w.nbytes//2)
timeit2("dot-ones f32", jax.jit(lambda w: jnp.einsum('foi,ik->fok', w, ones)), w, bytes_=w.nbytes)
wb = w.astype(jnp.bfloat16)
timeit2("sum-all bf16", jax.jit(lambda w: w.sum()), wb, bytes_=wb.nbytes)
