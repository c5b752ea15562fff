"""Benchmark: folded forward-evaluation throughput on the MNIST QuadGraph
circuit, the reference's headline configuration.

Baseline (BASELINE.md): the reference's best (folded+optimized) forward pass
on the MNIST QuadGraph **Tucker** K=64 circuit takes 38.6 ms for a batch of
128 on a CUDA GPU => 3316 samples/s (``notebooks/compilation-options.ipynb``).
The primary metric benches the same circuit shape; the north-star **CP**
training configuration is reported alongside.

The default runs the folded+optimized plan: the fusion rules rewrite
Kronecker+Sum chains into Tucker layers served by the fused Pallas
log-einsum-exp kernels (softmax reparameterization fused in); set
BENCH_OPTIMIZE=0 to measure the plain folded XLA plan.

Env overrides: BENCH_SUM_PRODUCT (tucker|cp|cp-t), BENCH_UNITS, BENCH_BATCH,
BENCH_ITERS, BENCH_OPTIMIZE, BENCH_SKIP_CP.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Persistent XLA compilation cache: amortizes the (remote) compiles of the
# init program and the evaluation plan across benchmark runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))

BASELINE_SAMPLES_PER_SEC = 128 / 0.0386  # reference folded+optimized fwd
BASELINE_FOLDED_SAMPLES_PER_SEC = 128 / 0.0758  # reference folded (unoptimized) fwd


def bench_config(sum_product: str, num_units: int, batch: int, iters: int, optimize: bool):
    import jax
    import jax.numpy as jnp

    from cirkit_tpu.models import image_data
    from cirkit_tpu.pipeline import PipelineContext

    t0 = time.time()
    sc = image_data(
        (1, 28, 28),
        "quad-graph",
        input_layer="categorical",
        num_input_units=num_units,
        sum_product_layer=sum_product,
        num_sum_units=num_units,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=optimize)
    cc = ctx.compile(sc)
    build_s = time.time() - t0

    store = {k: v for k, v in ctx.parameters.items() if k in cc.used_slots}
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(batch, 784), dtype=np.int64)
    )
    fwd = jax.jit(lambda st, xx: cc.evaluate(st, xx))

    t0 = time.time()
    out = jax.block_until_ready(fwd(store, x))
    compile_s = time.time() - t0
    assert np.isfinite(np.asarray(out)).all(), "Non-finite benchmark outputs"

    # Three timing rounds, keep the fastest: the remote-tunnel TPU shares
    # bandwidth with other tenants, so min-of-rounds is the stable statistic.
    # A scalar device->host pull is the only reliable sync on such platforms.
    per_batch = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fwd(store, x)
        float(jnp.sum(out))
        per_batch = min(per_batch, (time.time() - t0) / iters)
    return batch / per_batch, per_batch, build_s, compile_s


def bench_train(
    sum_product: str, num_units: int, batch: int, iters: int, optimize: bool,
    lowmem: bool = False,
):
    """North-star training throughput: full jitted MLE step (fwd + bwd +
    adam update) on the MNIST-shaped circuit. ``lowmem`` swaps optax.adam
    for the bf16-state stochastic-rounding Adam (docs/PERF.md)."""
    import jax
    import jax.numpy as jnp
    import optax

    from cirkit_tpu.models import image_data
    from cirkit_tpu.parallel.optimizers import adam_lowmem
    from cirkit_tpu.parallel.training import data_parallel_step, split_trainable
    from cirkit_tpu.pipeline import PipelineContext

    sc = image_data(
        (1, 28, 28),
        "quad-graph",
        input_layer="categorical",
        num_input_units=num_units,
        sum_product_layer=sum_product,
        num_sum_units=num_units,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=optimize)
    cc = ctx.compile(sc)
    trainable, frozen = split_trainable(cc, ctx.parameters)
    optimizer = adam_lowmem(1e-2) if lowmem else optax.adam(1e-2)
    opt_state = optimizer.init(trainable)
    step = data_parallel_step(cc, optimizer)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(batch, 784), dtype=np.int32)
    )
    trainable, opt_state, loss = step(trainable, frozen, opt_state, x)  # compile
    float(loss)
    per_step = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            trainable, opt_state, loss = step(trainable, frozen, opt_state, x)
        float(jnp.sum(loss))
        per_step = min(per_step, (time.time() - t0) / iters)
    return batch / per_step, per_step


def bench_sos(*, batch: int, iters: int, side: int = 12, units: int = 32):
    """Sum-of-squares forward throughput under the signed log semiring: a
    non-monotonic QuadTree circuit squared via multiply(conjugate(c), c),
    running as an all-real f32 program (complex64 does not compile on this
    TPU runtime; the signed semiring is the TPU-native SoS path)."""
    import jax
    import jax.numpy as jnp

    from cirkit_tpu.models import image_data
    from cirkit_tpu.models.utils import Parameterization
    from cirkit_tpu.pipeline import PipelineContext

    sc = image_data(
        (1, side, side),
        "quad-tree-2",
        input_layer="categorical",
        num_input_units=units,
        sum_product_layer="cp",
        num_sum_units=units,
        sum_weight_param=Parameterization(activation="none", initialization="normal"),
    )
    ctx = PipelineContext(semiring="signed-lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    sq = ctx.multiply(ctx.conjugate(cc), cc)
    store = sq.restrict_store(ctx.parameters)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(batch, side * side), dtype=np.int32)
    )
    fwd = jax.jit(lambda st, xx: sq.evaluate(st, xx))
    logmag, sign = fwd(store, x)
    float(jnp.sum(logmag))
    assert np.isfinite(np.asarray(logmag)).all()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fwd(store, x)
        float(jnp.sum(out[0]))
        best = min(best, (time.time() - t0) / iters)
    return batch / best, best


def _fwd_gflops_per_sample(cc) -> float:
    """Useful (single-pass) forward MACs x2 of the sum-style contractions,
    per sample — the numerator of the MFU figure. Elementwise input/product
    work is negligible next to the MXU contractions."""
    from cirkit_tpu.backend.jax.layers import JaxSumLayer
    from cirkit_tpu.backend.jax.optimized import (
        JaxCPTLayer,
        JaxTensorDotLayer,
        JaxTuckerLayer,
    )

    macs = 0
    for layer in cc.layers:
        f = layer.num_folds
        if isinstance(layer, JaxTuckerLayer):
            comp = layer.num_input_units ** layer.arity
            macs += f * (layer.num_output_units * comp + comp)
        elif isinstance(layer, JaxCPTLayer):
            macs += f * layer.num_output_units * layer.num_input_units
        elif isinstance(layer, JaxTensorDotLayer):
            kj = layer._num_contract_units
            macs += f * layer.num_output_units * kj
        elif isinstance(layer, JaxSumLayer):
            macs += f * layer.num_output_units * layer.arity * layer.num_input_units
    return 2.0 * macs / 1e9


def bench_queries(sum_product: str, num_units: int, batch: int, iters: int):
    """Flagship query throughput: IntegrateQuery (50% marginalized),
    MAPQuery (50% evidence completion), SamplingQuery (unconditional).
    Pins the docs/PERF.md numbers in the driver-run artifact."""
    import jax
    import jax.numpy as jnp

    from cirkit_tpu.backend.jax.queries import (
        ExpectationQuery,
        IntegrateQuery,
        MAPQuery,
        SamplingQuery,
    )
    from cirkit_tpu.models import image_data
    from cirkit_tpu.pipeline import PipelineContext

    sc = image_data(
        (1, 28, 28),
        "quad-graph",
        input_layer="categorical",
        num_input_units=num_units,
        sum_product_layer=sum_product,
        num_sum_units=num_units,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    store = cc.restrict_store(ctx.parameters)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, size=(batch, 784), dtype=np.int32))
    mask = jnp.asarray(rng.random((batch, 784)) < 0.5)
    key = jax.random.PRNGKey(0)

    def time_it(fn, n):
        fn()  # compile / warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(n):
                out = fn()
            jax.tree_util.tree_map(
                lambda a: float(jnp.sum(a.astype(jnp.float32))), out
            )
            best = min(best, (time.time() - t0) / n)
        return best * 1e3  # ms

    out = {}
    iq = IntegrateQuery(cc)
    out["integrate_query_ms"] = round(
        time_it(lambda: iq(x, integrate_vars=mask, store=store), iters), 2
    )
    mq = MAPQuery(cc)
    # >= 10 pipelined calls per sync: a degraded tunnel round-trip (~25 ms
    # observed) otherwise biases a ~40 ms metric by RTT/n (docs/PERF.md)
    out["map_query_ms"] = round(
        time_it(lambda: mq(x, evidence_mask=mask, store=store), max(iters // 3, 10)), 2
    )
    sq = SamplingQuery(cc)
    out["sample_query_ms"] = round(
        time_it(lambda: sq(batch, key=key, store=store)[0], 10), 1
    )
    eq = ExpectationQuery(cc)
    out["expectation_query_ms"] = round(
        time_it(lambda: eq(x, evidence_mask=mask, store=store), max(iters // 5, 3)), 2
    )
    # The r3 capability queries, regression-pinned (docs/PERF.md claims):
    # posterior marginals / cdf / quantile ride the same responsibility
    # backward; entropy is the carrier-generic bottom-up walker.
    out["marginals_query_ms"] = round(
        time_it(
            lambda: eq.marginals(x, evidence_mask=mask, store=store),
            max(iters // 5, 3),
        ),
        2,
    )
    out["cdf_query_ms"] = round(
        time_it(
            lambda: eq.cdf(x, t=127.0, evidence_mask=mask, store=store),
            max(iters // 5, 3),
        ),
        2,
    )
    out["quantile_query_ms"] = round(
        time_it(
            lambda: eq.quantile(x, q=0.5, evidence_mask=mask, store=store),
            max(iters // 5, 3),
        ),
        2,
    )
    from cirkit_tpu.backend.jax.entropy import EntropyQuery

    hq = EntropyQuery(cc)
    out["entropy_query_ms"] = round(time_it(lambda: hq(store=store), 10), 2)
    out["posterior_entropy_ms"] = round(
        time_it(
            lambda: hq(x, evidence_mask=mask, store=store), max(iters // 5, 3)
        ),
        2,
    )
    if os.environ.get("BENCH_SKIP_MI", "0") != "1":
        from cirkit_tpu.backend.jax.queries import mutual_information

        # One-time B=256 anchored-marginals compile, then per-anchor cost
        # is linear: compile on a 2-anchor call, drain/warm with a small
        # call (the first post-compile call carries residual async work and
        # read 266-341 ms/anchor in r5), then min-of-2 over 16 anchors so
        # the per-call fixed costs amortize the way real MI queries do.
        t0 = time.time()
        mutual_information(cc, store=store, variables=[0, 1])
        out["mi_compile_s"] = round(time.time() - t0, 1)
        mutual_information(cc, store=store, variables=[2, 3, 4, 5])
        best = None
        for lo in (6, 22):
            t0 = time.time()
            mi = mutual_information(cc, store=store, variables=list(range(lo, lo + 16)))
            float(jnp.sum(mi))
            dt = (time.time() - t0) / 16 * 1e3
            best = dt if best is None else min(best, dt)
        out["mi_per_anchor_ms"] = round(best, 1)
        # r5: the fused mi_row program builds anchor evidence ON DEVICE and
        # reduces in-program — per-anchor transfer is one (D,) f32 row, so
        # the metric is device-bound, not tunnel-bound (VERDICT r4 weak #2)
        out["mi_pull_bytes_per_anchor"] = 784 * 4
    return out


def bench_em(sum_product: str, num_units: int, batch: int, iters: int):
    """EM flow-step latency on the EM-ready flagship (plain Dirichlet sum
    weights + plain categorical leaf probs): the fastest training mode —
    no optimizer state traffic."""
    import jax.numpy as jnp

    from cirkit_tpu.models import image_data
    from cirkit_tpu.parallel import em_programs
    from cirkit_tpu.pipeline import PipelineContext

    sc = image_data(
        (1, 28, 28),
        "quad-graph",
        input_layer="categorical",
        num_input_units=num_units,
        sum_product_layer=sum_product,
        num_sum_units=num_units,
        em_ready=True,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    flow_step, em_update, state = em_programs(cc, ctx.parameters)
    em_p, g_p = state["em_params"], state["gauss_params"]
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(batch, 784), dtype=np.int32)
    )
    w = jnp.ones((batch,), jnp.float32)
    acc, acc_ll = state["zero_acc"](), jnp.zeros(())
    acc, acc_ll = flow_step(em_p, g_p, acc, acc_ll, x, w)  # compile
    float(acc_ll)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            acc, acc_ll = flow_step(em_p, g_p, acc, acc_ll, x, w)
        float(acc_ll)
        best = min(best, (time.time() - t0) / iters)
    em_p, g_p = em_update(em_p, g_p, acc, jnp.float32(1.0))  # sanity: runs
    float(jnp.sum(next(iter(em_p.values()))))
    return best * 1e3


def bench_serving(sum_product: str, num_units: int, iters: int):
    """Serving-scale forward: batch sweep x {f32-grade, fast bf16 + bf16
    weight store}, with samples/s and useful TFLOP/s (MFU numerator is the
    single-pass contraction math; the v5e bf16 peak is ~197 TFLOP/s)."""
    import jax
    import jax.numpy as jnp

    from cirkit_tpu.backend.jax.serving import bf16_weight_store
    from cirkit_tpu.models import image_data
    from cirkit_tpu.pipeline import PipelineContext

    batches = [int(b) for b in os.environ.get("BENCH_SERVING_BATCHES", "512,2048").split(",")]
    rows = []
    for fast in (False, True):
        if fast:
            os.environ["CIRKIT_TPU_FAST"] = "1"
        try:
            sc = image_data(
                (1, 28, 28),
                "quad-graph",
                input_layer="categorical",
                num_input_units=num_units,
                sum_product_layer=sum_product,
                num_sum_units=num_units,
            )
            ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
            cc = ctx.compile(sc)
            store = cc.restrict_store(ctx.parameters)
            if fast:
                store = bf16_weight_store(cc, store)
            gflops = _fwd_gflops_per_sample(cc)
            fwd = jax.jit(lambda st, xx: cc.evaluate(st, xx))
            for batch in batches:
                x = jnp.asarray(
                    np.random.default_rng(0).integers(
                        0, 256, size=(batch, 784), dtype=np.int32
                    )
                )
                out = fwd(store, x)
                float(jnp.sum(out))
                n = max(2, int(iters * 128 / batch))
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    for _ in range(n):
                        out = fwd(store, x)
                    float(jnp.sum(out))
                    best = min(best, (time.time() - t0) / n)
                sps = batch / best
                rows.append(
                    {
                        "mode": "bf16_fast" if fast else "f32_grade",
                        "batch": batch,
                        "samples_per_sec": round(sps, 1),
                        "batch_ms": round(best * 1e3, 2),
                        "useful_tflops": round(sps * gflops / 1e3, 2),
                    }
                )
        finally:
            os.environ.pop("CIRKIT_TPU_FAST", None)
    return rows


def bench_structure(sum_product: str, num_units: int) -> dict:
    """Structure-search timings: flagship prune_circuit end-to-end and a
    mid-size grow_prune_loop round. Pins the docs/PERF.md scale numbers.

    Profiled floor (docs/PERF.md): at flagship scale 97.5% of prune is the
    trained-weight readback at the tunnel's ~7 MB/s link bandwidth — the
    host scoring/fixpoint/rebuild is ~5 s post-vectorization — so this
    metric tracks the host algorithms only at mid-size; the flagship
    number is effectively a link-bandwidth measurement.
    """
    from cirkit_tpu.backend.jax.pruning import grow_prune_loop, prune_circuit
    from cirkit_tpu.models import image_data
    from cirkit_tpu.pipeline import PipelineContext

    out = {}
    # mid-size loop: (1, 8, 8) categorical, one grow+prune round with EM
    sc = image_data(
        (1, 8, 8), "quad-graph", input_layer="categorical",
        num_input_units=16, sum_product_layer=sum_product, num_sum_units=16,
        em_ready=True,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(512, 64), dtype=np.int32)
    t0 = time.time()
    _, _, history = grow_prune_loop(
        sc, data, ctx=ctx, rounds=1, grow_fraction=0.25, prune_fraction=0.25,
        em_epochs=2, batch_size=256,
    )
    out["grow_prune_loop_midsize_s"] = round(time.time() - t0, 1)
    out["grow_prune_loop_stages"] = len(history)

    if os.environ.get("BENCH_SKIP_FLAGSHIP_PRUNE", "0") != "1":
        sc = image_data(
            (1, 28, 28), "quad-graph", input_layer="categorical",
            num_input_units=num_units, sum_product_layer=sum_product,
            num_sum_units=num_units, em_ready=True,
        )
        ctx = PipelineContext(semiring="lse-sum", fold=True)
        ctx.compile(sc)
        readback_mb = sum(
            np.asarray(v).nbytes for v in ctx.parameters.values()
        ) / 1e6
        t0 = time.time()
        _, rep = prune_circuit(sc, ctx=ctx, fraction=0.5)
        out["prune_flagship_s"] = round(time.time() - t0, 1)
        out["prune_flagship_units"] = [rep["units_before"], rep["units_after"]]
        # bytes-moved + link-normalized floor: lets a reader separate a real
        # regression from tunnel weather (97.5% of this metric is the
        # trained-weight readback; docs/PERF.md)
        out["prune_flagship_readback_mb"] = round(readback_mb, 1)
    return out


def bench_warmstart(sum_product: str, num_units: int, batch: int) -> dict:
    """Time-to-first-batch through an AOT warm-start bundle, measured in a
    FRESH process (the whole point is skipping that process's tracing and
    XLA compiles). The in-process part saves the bundle; the subprocess
    loads it, draws the store on device, and runs + syncs one batch.

    The reference's corresponding figure is its symbolic-build + torch
    compile of this same circuit, ~5.4-5.7 s (BASELINE.md; excludes torch
    import, so the subprocess timer here likewise starts after imports).
    """
    import subprocess
    import sys
    import tempfile

    import jax
    import jax.numpy as jnp

    from cirkit_tpu.backend.jax.warmstart import save_bundle
    from cirkit_tpu.models import image_data
    from cirkit_tpu.pipeline import PipelineContext

    tmp = tempfile.mkdtemp(prefix="cirkit_warm_")
    bundle_path = os.path.join(tmp, "bundle")
    sc = image_data(
        (1, 28, 28),
        "quad-graph",
        input_layer="categorical",
        num_input_units=num_units,
        sum_product_layer=sum_product,
        num_sum_units=num_units,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    t0 = time.time()
    save_bundle(
        bundle_path, cc, store=dict(ctx.parameters), batch=batch,
        x_dtype=jnp.int32,
    )
    save_s = time.time() - t0

    # The probe is compile-free by construction: device_put transfers and a
    # numpy readback sync — any eager jnp op would cost a remote compile.
    probe = (
        "import sys, time, json\n"
        "import numpy as np\n"
        "import jax\n"
        "from cirkit_tpu.backend.jax.warmstart import load_bundle\n"
        "t0 = time.time()\n"
        f"b = load_bundle({bundle_path!r})\n"
        "load_s = time.time() - t0\n"
        "t0 = time.time()\n"
        "store = b.init(0)\n"
        "x = jax.device_put(np.random.default_rng(0).integers("
        f"0, 256, ({batch}, 784)).astype(np.int32))\n"
        "out = b.evaluate(store, x)\n"
        "s = float(np.asarray(out).sum())\n"
        "first_s = time.time() - t0\n"
        "assert np.isfinite(s), s\n"
        "print(json.dumps({'load_s': load_s, 'first_s': first_s}))\n"
    )
    # Append (never replace) PYTHONPATH: the axon TPU plugin rides on it.
    pp = os.environ.get("PYTHONPATH", "")
    repo = os.path.dirname(os.path.abspath(__file__))
    env = {**os.environ, "PYTHONPATH": f"{pp}:{repo}" if pp else repo}
    # Min-of-attempts: the tunnel has multi-second degraded windows that
    # would otherwise be attributed to the (compile-free) warm path.
    best = None
    for _ in range(3):
        out = subprocess.run(
            [sys.executable, "-c", probe],
            capture_output=True, text=True, timeout=600, env=env,
        )
        if out.returncode != 0:
            raise RuntimeError(f"warm-start probe failed:\n{out.stderr[-2000:]}")
        r = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or r["load_s"] + r["first_s"] < best["load_s"] + best["first_s"]:
            best = r
        if best["load_s"] + best["first_s"] < 3.0:
            break
    return {
        "bundle_save_s": round(save_s, 1),
        "warm_load_s": round(best["load_s"], 2),
        "warm_init_plus_first_batch_s": round(best["first_s"], 2),
        "time_to_first_batch_warm_s": round(best["load_s"] + best["first_s"], 2),
    }


def bench_qpc(sum_product: str, num_units: int, batch: int, iters: int) -> dict:
    """QPC (quadrature PC, the reference's PIC) at the flagship config:
    pc2qpc-convert the MNIST QuadGraph circuit and time a full jitted
    training step — generator nets -> materialized store -> forward ->
    backward through the nets -> adam. The reference's PIC notebook is one
    of its headline results (bpd 1.189 vs 1.255, BASELINE.md); this pins
    that the functional-generator redesign holds at flagship scale."""
    import jax
    import jax.numpy as jnp
    import optax

    from cirkit_tpu.backend.jax.pic import pc2qpc
    from cirkit_tpu.models import image_data
    from cirkit_tpu.pipeline import PipelineContext

    sc = image_data(
        (1, 28, 28), "quad-graph", input_layer="categorical",
        num_input_units=num_units, sum_product_layer=sum_product,
        num_sum_units=num_units,
    )
    ctx = PipelineContext(semiring="lse-sum", fold=True, optimize=True)
    cc = ctx.compile(sc)
    t0 = time.time()
    qpc, qp = pc2qpc(
        cc, dict(ctx.parameters), integration_method="leggauss",
        key=jax.random.PRNGKey(0), net_dim=64,
    )
    convert_s = time.time() - t0
    opt = optax.adam(5e-3)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(batch, 784), dtype=np.int32)
    )

    def step(params, opt_state, xx):
        def loss_fn(p):
            store = qp.materialize(p)
            return -jnp.mean(qpc.evaluate(store, xx)[:, 0, 0])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    params, opt_state = qp.net_params, opt.init(qp.net_params)
    t0 = time.time()
    params, opt_state, loss = jstep(params, opt_state, x)
    assert np.isfinite(float(loss)), float(loss)
    compile_s = time.time() - t0
    best = float("inf")
    n = max(iters // 4, 3)
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            params, opt_state, loss = jstep(params, opt_state, x)
        float(loss)
        best = min(best, (time.time() - t0) / n)
    return {
        "qpc_step_ms": round(best * 1e3, 2),
        "qpc_compile_s": round(compile_s + convert_s, 1),
        "qpc_samples_per_sec": round(batch / best, 1),
    }


def bench_k128(iters: int = 20) -> dict:
    """K=128 Tucker contraction at the PERF.md reference shapes (255 folds,
    O=128, M=16384, batch 128): the k1-chunked fused kernel (r5) vs the old
    materialized-composite path. Weights are drawn on device — a 2.1 GB
    host upload through the tunnel would dominate the bench wall-clock."""
    import jax
    import jax.numpy as jnp

    from cirkit_tpu.ops import lse_einsum as L

    F, B, K, O = 255, 128, 128, 128
    M = K * K
    make = jax.jit(
        lambda k: (
            jax.random.normal(k, (F, B, K)) - 3.0,
            jax.random.normal(jax.random.fold_in(k, 1), (F, B, K)) - 3.0,
            jax.random.normal(jax.random.fold_in(k, 2), (F, O, M)),
        )
    )
    x1, x2, th = make(jax.random.PRNGKey(7))
    float(jnp.sum(x1))  # materialize
    # A fresh-per-run embedded constant changes the program hash: the remote
    # compile service caches executables by program and can serve a binary
    # compiled in an unlucky window forever (measured: a cached 18.3 ms
    # artifact vs 10.9 ms from a fresh compile of the SAME program); the
    # salt costs one compile and guarantees a current-artifact measurement.
    salt = np.float32(1e-30 * (int(time.time()) % 997 + 1))

    def old_path(x1, x2, th):
        x1 = x1 + salt
        f, b, k1 = x1.shape
        k2 = x2.shape[2]
        x12 = (x1[:, :, :, None] + x2[:, :, None, :]).reshape(f, b, k1 * k2)
        return L.lse_matmul(x12, jax.nn.softmax(th, axis=-1))

    def new_path(x1, x2, th):
        out = L._dispatch_tucker_chunked(
            (x1 + salt, x2), th, softmax=True, interpret=False
        )
        assert out is not None, "chunked kernel must engage at K=128"
        return out

    res = {}
    for name, fn in (("k128_fwd_ms", new_path), ("k128_fwd_old_ms", old_path)):
        f = jax.jit(fn)
        out = f(x1, x2, th)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            for _ in range(max(iters // 4, 2)):
                out = f(x1, x2, th)
            float(jnp.sum(out))
            best = min(best, (time.time() - t0) / max(iters // 4, 2))
        res[name] = round(best * 1e3, 2)
    return res


def bench_autocache(sum_product: str, num_units: int, batch: int) -> dict:
    """Time-to-first-batch with the TRANSPARENT warm-compile cache
    (backend/jax/warmcache.py): a fresh process runs plain user code
    (image_data -> ctx.compile -> cc(x)) and the jit sites deserialize
    cached executables instead of paying remote compiles. Run 1 populates a
    fresh cache dir; run 2 is the reported number."""
    import tempfile

    probe = (
        "import os, sys, time, json\n"
        f"os.environ['CIRKIT_TPU_CACHE'] = sys.argv[1]\n"
        "t0 = time.time()\n"
        "import numpy as np\n"
        "import jax\n"
        "from cirkit_tpu.models import image_data\n"
        "from cirkit_tpu.pipeline import PipelineContext\n"
        "from cirkit_tpu.backend.jax import warmcache\n"
        "sc = image_data((1, 28, 28), 'quad-graph', input_layer='categorical',\n"
        f"    num_input_units={num_units}, sum_product_layer={sum_product!r},\n"
        f"    num_sum_units={num_units})\n"
        "ctx = PipelineContext(semiring='lse-sum', fold=True, optimize=True)\n"
        "cc = ctx.compile(sc)\n"
        f"x = np.random.default_rng(0).integers(0, 256, ({batch}, 784)).astype(np.int32)\n"
        "out = cc(x)\n"
        "s = float(np.asarray(out).sum())\n"
        "assert np.isfinite(s), s\n"
        "print(json.dumps({'wall_s': time.time() - t0, 'stats': warmcache.stats}))\n"
    )
    pp = os.environ.get("PYTHONPATH", "")
    repo = os.path.dirname(os.path.abspath(__file__))
    env = {**os.environ, "PYTHONPATH": f"{pp}:{repo}" if pp else repo}
    # main() disables the warm cache for the bench process's own cold
    # numbers; the probe subprocesses are exactly the cache measurement
    env.pop("CIRKIT_TPU_NO_CACHE", None)
    cache = tempfile.mkdtemp(prefix="cirkit_autocache_")

    def run_probe():
        out = subprocess.run(
            [sys.executable, "-c", probe, cache],
            capture_output=True, text=True, timeout=900, env=env,
        )
        if out.returncode != 0:
            raise RuntimeError(f"autocache probe failed:\n{out.stderr[-2000:]}")
        return json.loads(out.stdout.strip().splitlines()[-1])

    miss = run_probe()
    # min-of-attempts on the (cheap, compile-free) cached path: the tunnel
    # has multi-minute degraded windows that would otherwise be attributed
    # to the cache (same policy as bench_warmstart)
    best = None
    for _ in range(3):
        r = run_probe()
        if best is None or r["wall_s"] < best["wall_s"]:
            best = r
        if best["wall_s"] < 5.0:
            break
    return {
        "time_to_first_batch_cachemiss_s": round(miss["wall_s"], 2),
        "time_to_first_batch_cached_s": round(best["wall_s"], 2),
        "autocache_second_process": best["stats"],
    }


def bench_tunnel_health() -> dict:
    """Control measurements of the remote-tunnel link itself, so degraded
    windows are distinguishable from real regressions in the same JSON:
    the synced round-trip of a trivial program (~1-2 ms healthy, ~25 ms
    degraded) and the device->host bandwidth of a 32 MB pull (~7-24 MB/s
    observed). Interpretation guide in docs/PERF.md."""
    import jax
    import jax.numpy as jnp

    trivial = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(trivial(x)))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = trivial(x)
        float(jnp.sum(out))
        best = min(best, time.time() - t0)
    big = jax.jit(lambda a: a * 2.0)(jnp.ones((8 << 20,), jnp.float32))
    float(jnp.sum(big))  # materialize on device
    t0 = time.time()
    np.asarray(big)
    pull_s = time.time() - t0
    return {
        "tunnel_rtt_ms": round(best * 1e3, 2),
        "tunnel_pull_mb_s": round(32.0 / pull_s, 1),
    }


def main() -> None:
    import jax

    # The warm-compile cache is default-on for tpu/axon processes, so a
    # SECOND bench run's trace_build/jit_compile/time_to_first_batch_cold
    # numbers would silently deserialize executables cached by the first —
    # reporting warm numbers as cold. Disable it for the bench process;
    # the autocache probe section measures the cache in subprocesses with
    # their own cache dir (and strips this override from their env).
    os.environ["CIRKIT_TPU_NO_CACHE"] = "1"

    sum_product = os.environ.get("BENCH_SUM_PRODUCT", "tucker")
    num_units = int(os.environ.get("BENCH_UNITS", "64"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    optimize = os.environ.get("BENCH_OPTIMIZE", "1") == "1"

    sps, per_batch, build_s, compile_s = bench_config(
        sum_product, num_units, batch, iters, optimize
    )
    result = {
        "metric": f"mnist_quadgraph_{sum_product}_k{num_units}_folded_fwd",
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 3),
        "vs_baseline_folded_only": round(sps / BASELINE_FOLDED_SAMPLES_PER_SEC, 3),
        "batch_ms": round(per_batch * 1e3, 2),
        "trace_build_s": round(build_s, 1),
        "jit_compile_s": round(compile_s, 1),
        "time_to_first_batch_cold_s": round(build_s + compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    result.update(bench_tunnel_health())
    if os.environ.get("BENCH_SKIP_WARMSTART", "0") != "1":
        result.update(bench_warmstart(sum_product, num_units, batch))
    if os.environ.get("BENCH_SKIP_AUTOCACHE", "0") != "1":
        result.update(bench_autocache(sum_product, num_units, batch))
    if os.environ.get("BENCH_SKIP_K128", "0") != "1":
        result.update(bench_k128())
    if os.environ.get("BENCH_SKIP_QPC", "0") != "1":
        result.update(bench_qpc(sum_product, num_units, batch, iters))
    if os.environ.get("BENCH_SKIP_FAST", "0") != "1":
        # CIRKIT_TPU_FAST trades the bf16x3 kernel splits for single-pass
        # bf16 matmuls (~4e-3 worst-case relative error); read at trace time,
        # so a fresh compile inside this process picks it up.
        os.environ["CIRKIT_TPU_FAST"] = "1"
        try:
            fast_sps, fast_pb, _, _ = bench_config(
                sum_product, num_units, batch, iters, optimize
            )
            result["fast_samples_per_sec"] = round(fast_sps, 1)
            result["fast_batch_ms"] = round(fast_pb * 1e3, 2)
            result["fast_vs_baseline"] = round(fast_sps / BASELINE_SAMPLES_PER_SEC, 3)
        finally:
            del os.environ["CIRKIT_TPU_FAST"]
    if sum_product != "cp" and os.environ.get("BENCH_SKIP_CP", "0") != "1":
        cp_sps, cp_per_batch, _, _ = bench_config("cp", num_units, batch, iters, optimize)
        result["cp_samples_per_sec"] = round(cp_sps, 1)
        result["cp_batch_ms"] = round(cp_per_batch * 1e3, 2)
    if os.environ.get("BENCH_SKIP_TRAIN", "0") != "1":
        # North-star training throughput on BOTH flagship configs: the
        # reference has no trainer, so these are absolute numbers; the
        # tucker step is the headline (fwd 38.6 ms on the baseline A100,
        # so a full train step below that is already past parity).
        tr_sps, tr_ms = bench_train(sum_product, num_units, batch, max(iters // 2, 10), optimize)
        result[f"train_{sum_product}_samples_per_sec"] = round(tr_sps, 1)
        result[f"train_{sum_product}_step_ms"] = round(tr_ms * 1e3, 2)
        # bf16-state Adam: same step with half the optimizer HBM traffic
        lm_sps, lm_ms = bench_train(
            sum_product, num_units, batch, max(iters // 2, 10), optimize, lowmem=True
        )
        result[f"train_{sum_product}_lowmem_samples_per_sec"] = round(lm_sps, 1)
        result[f"train_{sum_product}_lowmem_step_ms"] = round(lm_ms * 1e3, 2)
        if sum_product != "cp":
            tr_sps, tr_ms = bench_train("cp", num_units, 256, max(iters // 2, 10), optimize)
            result["train_cp_samples_per_sec"] = round(tr_sps, 1)
            result["train_cp_step_ms"] = round(tr_ms * 1e3, 2)
    if os.environ.get("BENCH_SKIP_SOS", "0") != "1":
        sos_sps, sos_ms = bench_sos(batch=batch, iters=iters)
        result["sos_signed_samples_per_sec"] = round(sos_sps, 1)
        result["sos_signed_batch_ms"] = round(sos_ms * 1e3, 2)
    if os.environ.get("BENCH_SKIP_EM", "0") != "1":
        result["em_step_ms"] = round(
            bench_em(sum_product, num_units, batch, max(iters // 2, 10)), 2
        )
    if os.environ.get("BENCH_SKIP_QUERIES", "0") != "1":
        result.update(bench_queries(sum_product, num_units, batch, iters))
    if os.environ.get("BENCH_SKIP_SERVING", "0") != "1":
        result["serving"] = bench_serving(sum_product, num_units, iters)
    if os.environ.get("BENCH_SKIP_STRUCTURE", "0") != "1":
        result.update(bench_structure(sum_product, num_units))
        pull = result.get("tunnel_pull_mb_s")
        mb = result.get("prune_flagship_readback_mb")
        if pull and mb:
            result["prune_flagship_link_floor_s"] = round(mb / pull, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
