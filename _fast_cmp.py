import os, time
import jax, jax.numpy as jnp, numpy as np
from cirkit_tpu.models import image_data
from cirkit_tpu.pipeline import PipelineContext

def build():
    sc = image_data((1,28,28), "quad-graph", input_layer="categorical",
                    num_input_units=64, sum_product_layer="tucker", num_sum_units=64)
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    store = {k: v for k, v in ctx.parameters.items() if k in cc.used_slots}
    return cc, store

x = jnp.asarray(np.random.default_rng(0).integers(0,256,size=(128,784),dtype=np.int64))

def measure(tag, iters=60):
    cc, store = build()
    fwd = jax.jit(lambda st, xx: cc.evaluate(st, xx))
    r = fwd(store, x); _=float(jnp.sum(r))
    t0=time.perf_counter()
    for _ in range(iters): r = fwd(store, x)
    _=float(jnp.sum(r))
    print(tag, f"{(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)

measure("accurate")
os.environ["CIRKIT_TPU_FAST"] = "1"
measure("fast")
del os.environ["CIRKIT_TPU_FAST"]
os.environ["CIRKIT_TPU_DISABLE_PALLAS"] = "1"
measure("xla-fallback")
