import os
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms","cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np, optax
from jax.sharding import Mesh
import sys; sys.path.insert(0,"/root/repo")
from tests.parallel.test_tensor import _circuit, _mesh2d
from cirkit_tpu.parallel.tensor import shard_store_tp, tp_slot_specs, _plan_flags, _tp_forward_local
from cirkit_tpu.parallel.training import split_trainable
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

ctx, cc = _circuit(True)
mesh = _mesh2d()
trainable, frozen = split_trainable(cc, ctx.parameters)
x = jnp.asarray(np.random.default_rng(2).integers(0,256,size=(16,16)))
slot_specs = tp_slot_specs(cc, 2)
flags = _plan_flags(cc, slot_specs)
print("sharded slots:", sorted(slot_specs))
def loss_single(tr):
    return -jnp.mean(cc.evaluate({**tr, **frozen}, x))
l_ref, g_ref = jax.value_and_grad(loss_single)(trainable)

def spec_of(name):
    if name in slot_specs and name in cc.slots:
        return P(*([None,"model"]+[None]*(len(cc.slots[name].shape)-1)))
    return P()
def _local(tr, fr, batch):
    def loss(tr):
        ll = _tp_forward_local(cc, flags, "model", {**tr, **fr}, batch)
        return -jnp.mean(ll)
    l, g = jax.value_and_grad(loss)(tr)
    l = jax.lax.pmean(l, "data")
    g = {k: jax.lax.pmean(gv if k in slot_specs else jax.lax.psum(gv,"model"), "data") for k,gv in g.items()}
    return l, g
tr_sh, _ = shard_store_tp(cc, trainable, mesh)
fr_sh, _ = shard_store_tp(cc, frozen, mesh)
mapped = shard_map(_local, mesh=mesh,
    in_specs=({k: spec_of(k) for k in trainable},{k: spec_of(k) for k in frozen},P("data")),
    out_specs=(P(), {k: spec_of(k) for k in trainable}), check_rep=False)
l_tp, g_tp = jax.jit(mapped)(tr_sh, fr_sh, x)
print("loss ref/tp:", float(l_ref), float(l_tp))
for k in sorted(g_ref):
    a, b = np.asarray(g_tp[k]), np.asarray(g_ref[k])
    err = np.abs(a-b).max()
    print(f"{k} shape={b.shape} sharded={k in slot_specs} maxerr={err:.2e} scale={np.abs(b).max():.2e}")
a, b = np.asarray(g_tp["p52"]), np.asarray(g_ref["p52"])
print("tp[0,:3,:3]:", a[0,:3,:3].ravel())
print("ref[0,:3,:3]:", b[0,:3,:3].ravel())
print("ratio:", (a/np.where(b==0,1,b))[0,:3,:3].ravel())
nz_a, nz_b = (np.abs(a)>1e-12).mean(), (np.abs(b)>1e-12).mean()
print("frac nonzero tp/ref:", nz_a, nz_b)
