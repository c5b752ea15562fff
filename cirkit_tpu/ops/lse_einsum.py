"""Fused Pallas log-einsum-exp kernels for the circuit hot path.

The log-space (lse-sum) semiring evaluates every sum layer as a max-shifted
log-einsum-exp (ref: ``cirkit/backend/torch/semiring.py:383-408``): shift by
the per-row max, exponentiate, contract in linear space, log, add the shift
back. Composed from XLA ops this takes three to four full HBM round trips
over the layer input, and — because XLA cannot fuse producers into dot
operands — the softmax reparameterization of every sum weight is *also*
materialized to HBM each forward. These kernels fuse the entire pattern
into a single VMEM-resident pass:

- :func:`lse_matmul` / :func:`lse_matmul_softmax` — the dense folded
  sum-layer contraction ``(F, B, I) x (F, O, I) -> (F, B, O)``; the
  ``_softmax`` variant takes raw logits and normalizes rows **inside
  VMEM**, eliminating the softmax HBM round trip entirely.
- :func:`lse_tucker2` / :func:`lse_tucker2_softmax` — the arity-2 Tucker
  contraction ``(F, B, K1) x (F, B, K2) x (F, O, K1*K2) -> (F, B, O)``;
  the Kronecker outer product of the two inputs is formed tile-wise inside
  VMEM and never written to HBM. On the MNIST QuadGraph Tucker-K64
  circuit the two fusions together remove ~6.5 GB of intermediate HBM
  traffic per forward batch (outer products + softmax materialization).

TPU-specific numerics, measured on v5e:

- Mosaic's *default* f32 dot is a single bf16 MXU pass (~2e-3 relative
  error) and its only alternative is ``Precision.HIGHEST`` (~6 passes).
  These kernels instead use a manual two-term bf16 split (Dekker-style
  ``hi + lo``) of both operands and three MXU passes
  (``hi@hi + hi@lo + lo@hi``), giving ~1.5e-5 relative error — the bf16x3
  scheme XLA calls ``Precision.HIGH`` but which Mosaic does not expose.
- The VPU's f32 ``exp`` approximation already caps log-space accuracy at
  ~1e-4 nats per layer, so bf16x3 contractions are *not* the accuracy
  bottleneck.
- Mosaic cannot reshape a (B, K1, K2) tile into (B, K1*K2) when K2 is not
  a multiple of the 128-lane width, so the in-VMEM outer product is built
  as ``repeat_each(e1, K2) * tile(e2, K1)``: the tile is an exact
  ``pltpu.repeat`` and the element-repeat is an MXU matmul against an
  iota-built 0/1 selection matrix (exactly representable in bf16).

Every op carries a custom VJP whose backward pass is also a Pallas kernel
(gradients rebuild the shifted exponentials on-chip instead of saving
them); the softmax variants produce the logits gradient directly via the
in-kernel softmax VJP. The max-shift terms cancel exactly in the gradient,
so the backward treats the shift as a constant — the same property the
reference's autograd relies on. Division-by-zero gradients are zeroed like
the reference's ``SafeLog`` (ref: ``backend/torch/utils.py:10-30``).

Inputs that are not float32, not on TPU, or too large for VMEM fall back
to a mathematically-identical XLA composition (at ``Precision.HIGH``),
which is also the path used for float64 parity tests. Set
``CIRKIT_TPU_DISABLE_PALLAS=1`` to force the fallback everywhere, and
``CIRKIT_TPU_FAST=1`` to trade the bf16 split for single-pass bf16
matmuls (~4e-3 worst-case relative error), or ``CIRKIT_TPU_FAST=sr`` for
single-pass bf16 with **stochastic rounding** of the operands — unbiased
in expectation (measured mean error ~2e-6 vs ~5e-3 max), at ~20% more
VPU time than plain bf16 for the in-kernel random bits.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
# pallas costs >1 s to import and a process replaying cached executables
# (backend/jax/warmcache.py) never traces a kernel: defer to first use
from cirkit_tpu.utils.lazy import LazyModule

pl = LazyModule("jax.experimental.pallas", "pl", globals())
pltpu = LazyModule("jax.experimental.pallas.tpu", "pltpu", globals())

# A conservative VMEM budget (bytes) for the working set of one grid step
# (input tiles + weight tile + output tile, double-buffered by pallas).
_VMEM_BUDGET = 10 * 1024 * 1024
# The scoped-VMEM cap is ~16 MB; weight tiles and their in-kernel
# temporaries (bf16 hi/lo splits, softmax's f32 copy) are resident per
# grid cell regardless of the batch tile, so dispatchers bound that
# residency separately (with margin) before any tile-size shrinking.
_VMEM_W_RESIDENT_LIMIT = 12 * 1024 * 1024


def _w_resident_ok(o: int, i: int, *, softmax: bool = False, split_terms: float = 1.0) -> bool:
    """True when a (o, i) weight tile plus its in-kernel temporaries fits
    the per-grid-cell residency bound: the f32 tile (o*i words), its bf16
    splits (~``split_terms`` * o*i f32-equivalent words), and the f32
    softmax copy when ``softmax``."""
    words = (1.0 + split_terms + (1.0 if softmax else 0.0)) * o * i
    return 4.0 * words <= _VMEM_W_RESIDENT_LIMIT


def fallback_precision() -> jax.lax.Precision:
    """XLA dot precision for the fallback paths (bf16x3, matching kernels)."""
    return (
        jax.lax.Precision.DEFAULT
        if os.environ.get("CIRKIT_TPU_FAST")
        else jax.lax.Precision.HIGH
    )


def _fast_mode() -> str:
    """The kernel speed/accuracy mode from CIRKIT_TPU_FAST:

    - unset: bf16x3 split dots (~1.5e-5 relative, the default);
    - ``sr``: single-pass bf16 with **stochastic rounding** of the operands
      (pltpu.stochastic_round) — same speed as plain fast mode but the
      rounding is unbiased in expectation, so gradient errors dither around
      zero instead of accumulating a toward-nearest bias;
    - any other non-empty value: single-pass round-to-nearest bf16
      (~4e-3 worst-case relative).
    """
    v = os.environ.get("CIRKIT_TPU_FAST", "")
    if not v:
        return ""
    return "sr" if v.lower() == "sr" else "bf16"


def _sr_bf16(v: jnp.ndarray) -> jnp.ndarray:
    """Stochastically round an f32 operand to bf16 (in-kernel only; the
    kernel must have called pltpu.prng_seed first)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(v.shape), jnp.uint32)
    return pltpu.stochastic_round(v, bits, target_dtype=jnp.bfloat16)


def _maybe_seed(cfg, num_grid_dims: int = 2) -> None:
    """Seed the in-kernel PRNG for stochastic-rounding mode (grid-position
    dependent so every kernel instance draws distinct bits)."""
    if cfg.fast == "sr":
        pltpu.prng_seed(*(pl.program_id(i) for i in range(num_grid_dims)))


def _cfg_fast(interpret: bool) -> str:
    """The fast mode for a kernel config: stochastic rounding needs the
    hardware PRNG (pltpu.prng_seed has no interpret-mode lowering), so sr
    degrades to plain bf16 when interpreting on CPU."""
    mode = _fast_mode()
    return "bf16" if (mode == "sr" and interpret) else mode


def _fcast(v: jnp.ndarray, fast) -> jnp.ndarray:
    """The fast-mode operand cast: stochastic or round-to-nearest bf16.
    bf16-resident operands (the serving weight store) pass through."""
    if v.dtype == jnp.bfloat16:
        return v
    return _sr_bf16(v) if fast == "sr" else v.astype(jnp.bfloat16)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _clamp_max(x: jnp.ndarray) -> jnp.ndarray:
    """Trailing-axis max clamped to finite range (ref: semiring.py:392-398),
    so rows that are entirely -inf never produce NaNs via inf - inf."""
    info = jnp.finfo(x.dtype)
    m = jnp.max(x, axis=-1, keepdims=True)
    return jnp.clip(m, info.min, info.max)


def _pallas_enabled() -> bool:
    if os.environ.get("CIRKIT_TPU_DISABLE_PALLAS"):
        return False
    if os.environ.get("CIRKIT_TPU_FORCE_PALLAS"):
        return True  # testing hook: run kernels in interpreter mode off-TPU
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _interpret_default() -> bool:
    """Run kernels in interpreter mode off-TPU (used by CPU tests)."""
    return jax.devices()[0].platform not in ("tpu", "axon")


@dataclass(frozen=True)
class _Cfg:
    bt: int  # batch tile
    nbt: int  # number of batch tiles (grid dim 1)
    interpret: bool
    fast: str  # "" = bf16x3 splits, "bf16" = single pass, "sr" = stochastic
    softmax: bool  # weight operand is raw logits; normalize rows in VMEM
    tucker: bool  # two log-space inputs combined by an in-VMEM outer product


# -- in-kernel matmul helpers ------------------------------------------------- #


def _dot1(a: jnp.ndarray, b: jnp.ndarray, dims) -> jnp.ndarray:
    """Single-pass MXU matmul with f32 accumulation."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _split(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dekker-style two-term bf16 split: hi + lo == v to ~16 mantissa bits."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a: jnp.ndarray, b: jnp.ndarray, dims, *, fast: bool) -> jnp.ndarray:
    """f32-grade matmul from bf16 splits (single bf16 pass in fast mode).

    The hi/lo terms are packed into ONE doubled matmul instead of three:
    output widths like O=64 leave half the MXU lanes idle, so
    ``[ah|al] @ [bh|bl]`` costs the same cycles as one split-term matmul
    while computing all the cross terms (the discarded ``al@bl`` quadrant
    would have been idle lanes anyway) — measured ~20% faster than three
    separate half-width dots on v5e.
    """
    if fast:
        return _dot1(_fcast(a, fast), _fcast(b, fast), dims)
    (ka,), (kb,) = dims
    af, bf = 1 - ka, 1 - kb
    ah, al = _split(a)
    bh, bl = _split(b)
    m, n = a.shape[af], b.shape[bf]
    k = a.shape[ka]
    if 3 * k <= 128:
        # the contraction axis underfills the 128 MXU lanes 3x over: packing
        # [ah|al|ah] against [bh|bh|bl] along it computes ALL three split
        # terms in one pass at the cycles of the single half-filled dot
        return _dot1(
            jnp.concatenate([ah, al, ah], axis=ka),
            jnp.concatenate([bh, bh, bl], axis=kb),
            dims,
        )
    if n <= 64:
        # doubling n stays within one 128-lane tile: all three cross terms
        # cost the cycles of a single half-width dot
        d = _dot1(
            jnp.concatenate([ah, al], axis=af),
            jnp.concatenate([bh, bl], axis=bf),
            dims,
        )
        return d[:m, :n] + d[:m, n:] + d[m:, :n]
    if 2 * k <= 128:
        # K-pack the two bh terms (the contraction lanes were idle anyway):
        # two passes of m rows instead of three
        d = _dot1(
            jnp.concatenate([ah, al], axis=ka),
            jnp.concatenate([bh, bh], axis=kb),
            dims,
        )
        return d + _dot1(ah, bl, dims)
    # n already fills the lanes: doubling it would add real cycles for the
    # discarded lo@lo quadrant; pack only the two bh terms along rows
    d = _dot1(jnp.concatenate([ah, al], axis=af), bh, dims)
    return d[:m] + d[m:] + _dot1(ah, bl, dims)


def _repeat_selector(k1: int, k2: int) -> jnp.ndarray:
    """The (K1, K1*K2) 0/1 matrix with S[i, i*K2 + j] = 1: right-multiplying
    element-repeats each of the K1 columns K2 times (exact in bf16)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k1, k1 * k2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k1, k1 * k2), 1)
    return (rows == cols // k2).astype(jnp.bfloat16)


def _mod_selector(k1: int, k2: int) -> jnp.ndarray:
    """The (K1*K2, K2) 0/1 matrix with T[i*K2 + j, j] = 1: right-multiplying
    segment-sums lanes congruent mod K2 (exact in bf16)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k1 * k2, k2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k1 * k2, k2), 1)
    return (rows % k2 == cols).astype(jnp.bfloat16)


def _repeat_each(e1: jnp.ndarray, k2: int, *, fast: bool) -> jnp.ndarray:
    """(BT, K1) -> (BT, K1*K2) with column i*K2+j = e1[:, i], via selection
    matmul; the selector is exact in bf16 so a 2-term split of e1 suffices.
    When 2*K1 fits the 128 contraction lanes, the split packs along the
    contraction axis ([hi|lo] against a stacked selector) and costs a single
    BT-row pass; otherwise it packs along the rows (2*BT)."""
    k1 = e1.shape[1]
    s = _repeat_selector(k1, k2)
    if fast:
        return _dot1(_fcast(e1, fast), s, ((1,), (0,)))
    hi, lo = _split(e1)
    if 2 * k1 <= 128:
        return _dot1(
            jnp.concatenate([hi, lo], axis=1),
            jnp.concatenate([s, s], axis=0),
            ((1,), (0,)),
        )
    bt = e1.shape[0]
    d = _dot1(jnp.concatenate([hi, lo], axis=0), s, ((1,), (0,)))
    return d[:bt] + d[bt:]


def _seg_dot(p: jnp.ndarray, sel: jnp.ndarray, dims, *, fast: bool) -> jnp.ndarray:
    """Exact-selection matmul of an f32 operand against a 0/1 bf16 matrix,
    with the 2-term split packed into one matmul along p's free axis."""
    if fast:
        return _dot1(_fcast(p, fast), sel, dims)
    (kp,), _ = dims
    pf = 1 - kp
    hi, lo = _split(p)
    m = p.shape[pf]
    d = _dot1(jnp.concatenate([hi, lo], axis=pf), sel, dims)
    return d[:m] + d[m:]


def _softmax_rows(th: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable row softmax computed entirely in VMEM."""
    mx = jnp.max(th, axis=-1, keepdims=True)
    wexp = jnp.exp(th - mx)
    return wexp / jnp.sum(wexp, axis=-1, keepdims=True)


# --------------------------------------------------------------------------- #
# The shared forward / backward kernels
# --------------------------------------------------------------------------- #
# Layout conventions inside one grid step (fold f, batch tile bt):
#   single:  x (BT, I)     log-space,  w/theta (O, I)
#   tucker:  x1 (BT, K1), x2 (BT, K2) log-space, w/theta (O, K1*K2)
# Outputs: out (BT, O) log-space; gradients mirror the inputs.


def _shifted_exp(xs):
    """Per-input clamped max shift; returns (exps, total_shift)."""
    ms = [_clamp_max(x) for x in xs]
    es = [jnp.exp(x - m) for x, m in zip(xs, ms)]
    shift = ms[0]
    for m in ms[1:]:
        shift = shift + m
    return es, shift


def _fwd_kernel(cfg: _Cfg, *refs):
    _maybe_seed(cfg)
    if cfg.tucker:
        x1_ref, x2_ref, w_ref, o_ref = refs
        (e1, e2), shift = _shifted_exp((x1_ref[0], x2_ref[0]))
        e1r = _repeat_each(e1, e2.shape[1], fast=cfg.fast)
        e = e1r * pltpu.repeat(e2, e1.shape[1], axis=1)  # (BT, K1*K2)
    else:
        x_ref, w_ref, o_ref = refs
        (e,), shift = _shifted_exp((x_ref[0],))
    w = _softmax_rows(w_ref[0].astype(jnp.float32)) if cfg.softmax else w_ref[0]
    y = _dot3(e, w, ((1,), (1,)), fast=cfg.fast)  # (BT, O)
    o_ref[0] = jnp.log(y) + shift


def _bwd_kernel(cfg: _Cfg, *refs):
    _maybe_seed(cfg)
    if cfg.tucker:
        x1_ref, x2_ref, w_ref, out_ref, g_ref, dx1_ref, dx2_ref, dw_ref = refs
        xs = (x1_ref[0], x2_ref[0])
    else:
        x_ref, w_ref, out_ref, g_ref, dx_ref, dw_ref = refs
        xs = (x_ref[0],)
    bt_i = pl.program_id(1)
    es, shift = _shifted_exp(xs)
    w = _softmax_rows(w_ref[0].astype(jnp.float32)) if cfg.softmax else w_ref[0]
    # g / y with SafeLog-style zeroing of non-finite ratios.
    gy = g_ref[0] * jnp.exp(shift - out_ref[0])
    gy = jnp.where(jnp.isfinite(gy), gy, 0.0)
    s = _dot3(gy, w, ((1,), (0,)), fast=cfg.fast)  # dL/de: (BT, I)
    if cfg.tucker:
        e1, e2 = es
        k1 = e1.shape[1]
        k2 = e2.shape[1]
        e1r = _repeat_each(e1, k2, fast=cfg.fast)
        e2t = pltpu.repeat(e2, k1, axis=1)
        e = e1r * e2t
        # de1[b,i] = sum_j s[b,i*K2+j] e2[b,j]: segment-sum K2-blocks;
        # de2[b,j] = sum_i s[b,i*K2+j] e1[b,i]: segment-sum lanes mod K2.
        dx1_ref[0] = e1 * _seg_dot(s * e2t, _repeat_selector(k1, k2), ((1,), (1,)), fast=cfg.fast)
        dx2_ref[0] = e2 * _seg_dot(s * e1r, _mod_selector(k1, k2), ((1,), (0,)), fast=cfg.fast)
    else:
        (e,) = es
        dx_ref[0] = e * s
    dwt = _dot3(gy, e, ((0,), (0,)), fast=cfg.fast)  # dL/dw: (O, BT) @ (BT, I)

    @pl.when(bt_i == 0)
    def _():
        dw_ref[0] = dwt

    @pl.when(bt_i > 0)
    def _():
        dw_ref[0] += dwt

    if cfg.softmax:
        # Softmax VJP applied once the dL/dw accumulation is complete:
        # dtheta = w * (dw - sum_c w_c dw_c) per row.
        @pl.when(bt_i == cfg.nbt - 1)
        def _():
            acc = dw_ref[0]
            dw_ref[0] = w * (acc - jnp.sum(w * acc, axis=-1, keepdims=True))


# --------------------------------------------------------------------------- #
# pallas_call plumbing
# --------------------------------------------------------------------------- #


def _vspec(block, index_map):
    return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)


def _x_spec(bt, k):
    return _vspec((1, bt, k), lambda fi, bi: (fi, bi, 0))


def _w_spec(o, i):
    return _vspec((1, o, i), lambda fi, bi: (fi, 0, 0))


def _call_fwd(cfg: _Cfg, xs, w):
    f, b = xs[0].shape[:2]
    o, i = w.shape[1:]
    grid = (f, cfg.nbt)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=grid,
        in_specs=[_x_spec(cfg.bt, x.shape[2]) for x in xs] + [_w_spec(o, i)],
        out_specs=_x_spec(cfg.bt, o),
        out_shape=jax.ShapeDtypeStruct((f, b, o), xs[0].dtype),
        interpret=cfg.interpret,
    )(*xs, w)


def _call_bwd(cfg: _Cfg, xs, w, out, g):
    f, b = xs[0].shape[:2]
    o, i = w.shape[1:]
    grid = (f, cfg.nbt)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=grid,
        in_specs=[_x_spec(cfg.bt, x.shape[2]) for x in xs]
        + [_w_spec(o, i), _x_spec(cfg.bt, o), _x_spec(cfg.bt, o)],
        out_specs=[_x_spec(cfg.bt, x.shape[2]) for x in xs] + [_w_spec(o, i)],
        # dL/dw accumulates across batch tiles in f32 even for a
        # bf16-resident weight; the VJP casts back at the boundary
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in xs]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32)],
        interpret=cfg.interpret,
    )(*xs, w, out, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_p(cfg: _Cfg, xs, w):
    return _call_fwd(cfg, xs, w)


def _fused_p_fwd(cfg: _Cfg, xs, w):
    out = _call_fwd(cfg, xs, w)
    return out, (xs, w, out)


def _fused_p_bwd(cfg: _Cfg, res, g):
    xs, w, out = res
    grads = _call_bwd(cfg, xs, w, out, g)
    return tuple(grads[:-1]), grads[-1].astype(w.dtype)


_fused_p.defvjp(_fused_p_fwd, _fused_p_bwd)


def _dispatch(xs, w, *, softmax: bool, tucker: bool, interpret: bool | None):
    """Pick the Pallas kernel when shapes/dtypes/platform allow, else None."""
    if not _pallas_enabled():
        return None
    if any(x.dtype != jnp.float32 for x in xs):
        return None
    # activations must be f32; the weight may be stored bf16 (the serving
    # store): it is cast/split in VMEM anyway, and bf16 residency halves
    # the dominant HBM stream (the weights) on the flagship shapes
    if w.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    f, b = xs[0].shape[:2]
    o, i = w.shape[1:]
    # o < 8: Mosaic's bf16 path cannot lower sub-sublane output widths.
    if o < 8:
        return None
    # Hard guard on the batch-tile-INDEPENDENT weight residency: the kernel
    # keeps the weight tile plus its bf16 split temporaries (and the
    # softmax's f32 copy) resident per grid cell, which no tile shrinking
    # can reduce. In the weight-dominant regime (wide Tucker composites,
    # e.g. K=128 -> i=16K) the old estimate omitted the split temporaries
    # and Mosaic failed the compile with a scoped-vmem stack OOM instead of
    # reaching the blocked fallback.
    if not _w_resident_ok(o, i, softmax=softmax):
        return None
    # shrink the batch tile until the VMEM working set fits (large batches
    # must never fall off the fused path). This loop keeps the original,
    # empirically-calibrated budget: it slightly under-counts temporaries
    # that Mosaic overlaps, and the flagship's forward AND backward are
    # proven to compile at the tile sizes it picks — do not "improve" it
    # with paper-accurate terms without re-proving those tiles on hardware.
    bt = min(256, _round_up(b, 8))
    while True:
        work = bt * (o + sum(x.shape[2] for x in xs)) + (o + 1) * i
        if tucker:
            work += (3 * bt + xs[0].shape[2]) * i
        else:
            work += 2 * bt * i
        if 4 * work <= _VMEM_BUDGET or bt <= 8:
            break
        bt = max(8, bt // 2)
    if 4 * work > _VMEM_BUDGET:
        return None
    interpret = _interpret_default() if interpret is None else interpret
    bp = _round_up(b, bt)
    cfg = _Cfg(
        bt=bt,
        nbt=bp // bt,
        interpret=interpret,
        fast=_cfg_fast(interpret),
        softmax=softmax,
        tucker=tucker,
    )
    if bp != b:
        pad = jnp.finfo(xs[0].dtype).min
        xs = tuple(
            jnp.pad(x, ((0, 0), (0, bp - b), (0, 0)), constant_values=pad) for x in xs
        )
    out = _fused_p(cfg, xs, w)
    return out[:, :b] if bp != b else out


# --------------------------------------------------------------------------- #
# Blocked (flash-style) lse_matmul for input widths beyond the VMEM budget
# --------------------------------------------------------------------------- #
# The contraction axis is tiled; a running row-max and a rescaled accumulator
# live in VMEM across the chunk sweep (the online-softmax recurrence), so
# arbitrarily wide contractions keep single-pass HBM traffic. The forward
# additionally emits the final row max, which lets the backward rebuild the
# shifted exponentials chunk-locally: d out/d x_i = exp(x_i - out) * w_i.


@dataclass(frozen=True)
class _BCfg:
    bt: int
    nbt: int
    ic: int
    nic: int
    interpret: bool
    fast: bool


def _blocked_fwd_kernel(cfg: _BCfg, x_ref, w_ref, o_ref, m_ref, m_s):
    _maybe_seed(cfg, 3)
    ic = pl.program_id(2)
    x = x_ref[0]  # (BT, IC)
    cm = _clamp_max(x)

    @pl.when(ic == 0)
    def _():
        m_s[:] = cm
        o_ref[0] = jnp.zeros_like(o_ref[0])

    m_old = m_s[:]
    m_new = jnp.maximum(m_old, cm)
    m_s[:] = m_new
    e = jnp.exp(x - m_new)
    contrib = _dot3(e, w_ref[0], ((1,), (1,)), fast=cfg.fast)
    o_ref[0] = o_ref[0] * jnp.exp(m_old - m_new) + contrib

    @pl.when(ic == cfg.nic - 1)
    def _():
        o_ref[0] = jnp.log(o_ref[0]) + m_new
        m_ref[0] = m_new


def _blocked_bwd_kernel(cfg: _BCfg, x_ref, w_ref, out_ref, m_ref, g_ref, dx_ref, dw_ref):
    _maybe_seed(cfg, 3)
    bt_i = pl.program_id(2)
    x = x_ref[0]  # (BT, IC)
    m = m_ref[0]  # (BT, 1)
    e = jnp.exp(x - m)
    gy = g_ref[0] * jnp.exp(m - out_ref[0])
    gy = jnp.where(jnp.isfinite(gy), gy, 0.0)
    s = _dot3(gy, w_ref[0], ((1,), (0,)), fast=cfg.fast)
    dx_ref[0] = e * s
    dwt = _dot3(gy, e, ((0,), (0,)), fast=cfg.fast)

    @pl.when(bt_i == 0)
    def _():
        dw_ref[0] = dwt

    @pl.when(bt_i > 0)
    def _():
        dw_ref[0] += dwt


def _blocked_fwd_call(cfg: _BCfg, x, w):
    f, b, i = x.shape
    o = w.shape[1]
    return pl.pallas_call(
        functools.partial(_blocked_fwd_kernel, cfg),
        grid=(f, cfg.nbt, cfg.nic),
        in_specs=[
            _vspec((1, cfg.bt, cfg.ic), lambda fi, bi, ici: (fi, bi, ici)),
            _vspec((1, o, cfg.ic), lambda fi, bi, ici: (fi, 0, ici)),
        ],
        out_specs=[
            _vspec((1, cfg.bt, o), lambda fi, bi, ici: (fi, bi, 0)),
            _vspec((1, cfg.bt, 1), lambda fi, bi, ici: (fi, bi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, b, o), x.dtype),
            jax.ShapeDtypeStruct((f, b, 1), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((cfg.bt, 1), jnp.float32)],
        interpret=cfg.interpret,
    )(x, w)


def _blocked_bwd_call(cfg: _BCfg, x, w, out, m, g):
    f, b, i = x.shape
    o = w.shape[1]
    return pl.pallas_call(
        functools.partial(_blocked_bwd_kernel, cfg),
        grid=(f, cfg.nic, cfg.nbt),
        in_specs=[
            _vspec((1, cfg.bt, cfg.ic), lambda fi, ici, bi: (fi, bi, ici)),
            _vspec((1, o, cfg.ic), lambda fi, ici, bi: (fi, 0, ici)),
            _vspec((1, cfg.bt, o), lambda fi, ici, bi: (fi, bi, 0)),
            _vspec((1, cfg.bt, 1), lambda fi, ici, bi: (fi, bi, 0)),
            _vspec((1, cfg.bt, o), lambda fi, ici, bi: (fi, bi, 0)),
        ],
        out_specs=[
            _vspec((1, cfg.bt, cfg.ic), lambda fi, ici, bi: (fi, bi, ici)),
            _vspec((1, o, cfg.ic), lambda fi, ici, bi: (fi, 0, ici)),
        ],
        # dL/dw accumulates across batch tiles in f32 even for a
        # bf16-resident weight; the VJP casts back at the boundary
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
        ],
        interpret=cfg.interpret,
    )(x, w, out, m, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blocked_p(cfg: _BCfg, x, w):
    out, _ = _blocked_fwd_call(cfg, x, w)
    return out


def _blocked_p_fwd(cfg: _BCfg, x, w):
    out, m = _blocked_fwd_call(cfg, x, w)
    return out, (x, w, out, m)


def _blocked_p_bwd(cfg: _BCfg, res, g):
    x, w, out, m = res
    dx, dw = _blocked_bwd_call(cfg, x, w, out, m, g)
    return dx, dw.astype(w.dtype)


_blocked_p.defvjp(_blocked_p_fwd, _blocked_p_bwd)


def _dispatch_blocked(x, w, *, interpret: bool | None):
    """Blocked lse_matmul for contractions too wide for one VMEM block."""
    if not _pallas_enabled():
        return None
    # bf16-resident weights (the serving store) are cast/split in VMEM;
    # without this, wide bf16-store circuits rejected by the fused path
    # would fall all the way to the dense XLA composition
    if x.dtype != jnp.float32 or w.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    f, b = x.shape[:2]
    o, i = w.shape[1:]
    if o < 8:
        return None
    bt = min(256, _round_up(b, 8))
    # choose the chunk width so the double-buffered x/w tiles plus the
    # in-kernel temporaries (exp, bf16 splits) fit comfortably in VMEM
    ic = 512
    while 4 * (5 * (bt + o) * ic + 3 * bt * o) < _VMEM_BUDGET and ic < i:
        ic *= 2
    ic = min(ic, _round_up(i, 128))
    ip = _round_up(i, ic)
    if ip // ic < 2:
        return None  # the unblocked kernel covers this
    interpret = _interpret_default() if interpret is None else interpret
    bp = _round_up(b, bt)
    cfg = _BCfg(
        bt=bt, nbt=bp // bt, ic=ic, nic=ip // ic, interpret=interpret, fast=_cfg_fast(interpret)
    )
    pad = jnp.finfo(x.dtype).min
    if bp != b or ip != i:
        x = jnp.pad(x, ((0, 0), (0, bp - b), (0, ip - i)), constant_values=pad)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, ip - i)))
    out = _blocked_p(cfg, x, w)
    return out[:, :b] if bp != b else out


# --------------------------------------------------------------------------- #
# k1-chunked fused Tucker kernel (K >= 128 unit counts)
# --------------------------------------------------------------------------- #
# The plain fused Tucker kernel keeps the whole (O, K1*K2) weight tile (plus
# its bf16 split temporaries) resident per grid cell, which caps it at
# roughly K = 64 (i = 4K). Beyond that the old fallback materialized the
# (F, B, K1*K2) log-space outer sum to HBM (~2 GB per flagship K=128 batch)
# and, for softmax weights, the normalized (F, O, K1*K2) table too — two
# full extra HBM round trips. This kernel instead sweeps the weight in
# K1-CHUNKS of kc rows of the composite axis (chunk = kc*K2 columns, always
# a 128-lane multiple) and keeps single-pass HBM traffic:
#
# - the x-side max shift is GLOBAL: m1 comes in precomputed ((F, B, 1), an
#   elementwise pass over the tiny x1), m2 is computed in-kernel from the
#   resident full x2 tile, so exp values never exceed 1 and chunks add up
#   exactly like the unchunked kernel;
# - x1 is pre-reshaped to (F, nkc, B, kc) OUTSIDE the kernel (a tiny XLA
#   transpose) because Mosaic cannot DMA lane-axis blocks at non-128
#   offsets — as a 4D array each chunk is a full-minor-axis block;
# - softmax weights use the online (flash-style) recurrence over chunks:
#   running row max + rescaled running normalizer in VMEM scratch, the
#   linear accumulator in o_ref rescaled when the max grows — logits
#   stream from HBM exactly once and the normalized weights never exist;
# - the backward is the XLA composition (custom_vjp): training at K >= 128
#   is off the flagship hot path, and the chunked forward is what serving
#   and the query upward passes need.


@dataclass(frozen=True)
class _CTCfg:
    bt: int  # batch tile
    nbt: int
    kc: int  # K1 rows per chunk
    nkc: int
    interpret: bool
    fast: str
    softmax: bool


def _ct_fwd_kernel(cfg: _CTCfg, x1_ref, m1_ref, x2_ref, w_ref, o_ref, wm_s, ws_s):
    _maybe_seed(cfg, 3)
    ci = pl.program_id(2)
    x1c = x1_ref[0, 0]  # (BT, KC) — this chunk's log inputs
    m1 = m1_ref[0]  # (BT, 1) — GLOBAL row max of x1
    x2 = x2_ref[0]  # (BT, K2)
    m2 = _clamp_max(x2)
    e1c = jnp.exp(x1c - m1)  # <= 1: m1 is the global shift
    e2 = jnp.exp(x2 - m2)
    k2 = e2.shape[1]
    e1r = _repeat_each(e1c, k2, fast=cfg.fast)  # (BT, KC*K2)
    e = e1r * pltpu.repeat(e2, e1c.shape[1], axis=1)
    if cfg.softmax:
        th = w_ref[0].astype(jnp.float32)  # (O, KC*K2) raw logits
        cmax = jnp.max(th, axis=-1, keepdims=True)  # (O, 1)

        @pl.when(ci == 0)
        def _():
            wm_s[:] = jnp.full_like(wm_s, jnp.finfo(jnp.float32).min)
            ws_s[:] = jnp.zeros_like(ws_s)
            o_ref[0] = jnp.zeros_like(o_ref[0])

        m_old = wm_s[:]
        m_new = jnp.maximum(m_old, cmax)
        scale = jnp.exp(m_old - m_new)  # (O, 1)
        we = jnp.exp(th - m_new)
        ws_s[:] = ws_s[:] * scale + jnp.sum(we, axis=-1, keepdims=True)
        wm_s[:] = m_new
        contrib = _dot3(e, we, ((1,), (1,)), fast=cfg.fast)  # (BT, O)
        o_ref[0] = o_ref[0] * jnp.transpose(scale, (1, 0)) + contrib

        @pl.when(ci == cfg.nkc - 1)
        def _():
            lse = jnp.log(ws_s[:])  # (O, 1): softmax normalizer (shifted)
            o_ref[0] = (
                jnp.log(o_ref[0]) - jnp.transpose(lse, (1, 0)) + m1 + m2
            )
    else:
        w = w_ref[0]
        contrib = _dot3(e, w, ((1,), (1,)), fast=cfg.fast)

        @pl.when(ci == 0)
        def _():
            o_ref[0] = jnp.zeros_like(o_ref[0])

        o_ref[0] += contrib

        @pl.when(ci == cfg.nkc - 1)
        def _():
            o_ref[0] = jnp.log(o_ref[0]) + m1 + m2


def _ct_fwd_call(cfg: _CTCfg, x1r, m1, x2, w):
    f, nkc, b, kc = x1r.shape
    o = w.shape[1]
    k2 = x2.shape[2]
    cm = kc * k2
    return pl.pallas_call(
        functools.partial(_ct_fwd_kernel, cfg),
        grid=(f, cfg.nbt, cfg.nkc),
        in_specs=[
            _vspec((1, 1, cfg.bt, kc), lambda fi, bi, ci: (fi, ci, bi, 0)),
            _vspec((1, cfg.bt, 1), lambda fi, bi, ci: (fi, bi, 0)),
            _vspec((1, cfg.bt, k2), lambda fi, bi, ci: (fi, bi, 0)),
            _vspec((1, o, cm), lambda fi, bi, ci: (fi, 0, ci)),
        ],
        out_specs=_vspec((1, cfg.bt, o), lambda fi, bi, ci: (fi, bi, 0)),
        out_shape=jax.ShapeDtypeStruct((f, b, o), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((o, 1), jnp.float32),
            pltpu.VMEM((o, 1), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(x1r, m1, x2, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ct_p(cfg: _CTCfg, x1, x2, w):
    return _ct_fwd(cfg, x1, x2, w)


def _ct_fwd(cfg: _CTCfg, x1, x2, w):
    f, b, k1 = x1.shape
    m1 = _clamp_max(x1)
    x1r = jnp.transpose(x1.reshape(f, b, cfg.nkc, cfg.kc), (0, 2, 1, 3))
    return _ct_fwd_call(cfg, x1r, m1, x2, w)


def _ct_p_fwd(cfg: _CTCfg, x1, x2, w):
    out = _ct_fwd(cfg, x1, x2, w)
    return out, (x1, x2, w, out)


def _ct_p_bwd(cfg: _CTCfg, res, g):
    # XLA backward (bf16x3 / HIGH precision): the same math as the fused
    # backward kernels — SafeLog-style zeroing of non-finite g/y ratios,
    # max shifts treated as constants, softmax VJP applied to dL/dw.
    x1, x2, th, out = res
    f, b, k1 = x1.shape
    k2 = x2.shape[2]
    o = th.shape[1]
    m1 = _clamp_max(x1)
    m2 = _clamp_max(x2)
    e1 = jnp.exp(x1 - m1)
    e2 = jnp.exp(x2 - m2)
    if cfg.softmax:
        w = jax.nn.softmax(th.astype(jnp.float32), axis=-1)
    else:
        w = th.astype(jnp.float32) if th.dtype == jnp.bfloat16 else th
    gy = g * jnp.exp(m1 + m2 - out)
    gy = jnp.where(jnp.isfinite(gy), gy, 0.0)
    prec = fallback_precision()
    w3 = w.reshape(f, o, k1, k2)
    s3 = jnp.einsum("fbo,foij->fbij", gy, w3, precision=prec)
    dx1 = e1 * jnp.einsum("fbij,fbj->fbi", s3, e2, precision=prec)
    dx2 = e2 * jnp.einsum("fbij,fbi->fbj", s3, e1, precision=prec)
    dw = jnp.einsum(
        "fbo,fbi,fbj->foij", gy, e1, e2, precision=prec
    ).reshape(f, o, k1 * k2)
    if cfg.softmax:
        dw = w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))
    return dx1, dx2, dw.astype(th.dtype)


_ct_p.defvjp(_ct_p_fwd, _ct_p_bwd)


def _dispatch_tucker_chunked(xs, w, *, softmax: bool, interpret: bool | None):
    """The k1-chunked fused Tucker kernel for composites too wide for the
    single-tile kernel; None when shapes/dtypes/platform do not allow it."""
    if not _pallas_enabled():
        return None
    x1, x2 = xs
    if x1.dtype != jnp.float32 or x2.dtype != jnp.float32:
        return None
    if w.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    f, b, k1 = x1.shape
    k2 = x2.shape[2]
    o = w.shape[1]
    if o < 8 or w.shape[2] != k1 * k2:
        return None
    # chunk = kc rows of the K1 digit: pick the largest kc (a multiple of 8
    # dividing K1, chunk columns a 128-lane multiple) whose weight-chunk
    # residency fits; at least 2 chunks (the plain kernel covers nkc == 1)
    kc = None
    for cand in range(min(k1 // 2, 512), 7, -8):
        if k1 % cand or (cand * k2) % 128:
            continue
        if _w_resident_ok(o, cand * k2, softmax=softmax):
            kc = cand
            break
    if kc is None:
        return None
    nkc = k1 // kc
    cm = kc * k2
    bt = min(256, _round_up(b, 8))
    while True:
        # batch-tile working set; the weight chunk's split/softmax
        # temporaries are bounded separately by _w_resident_ok above
        # (mirroring the plain dispatcher's empirically-proven budget)
        work = (o + 1) * cm
        work += bt * (3 * cm + 2 * k2 + kc + o + 2)
        if 4 * work <= _VMEM_BUDGET or bt <= 8:
            break
        bt = max(8, bt // 2)
    if 4 * work > _VMEM_BUDGET:
        return None
    interpret = _interpret_default() if interpret is None else interpret
    bp = _round_up(b, bt)
    cfg = _CTCfg(
        bt=bt,
        nbt=bp // bt,
        kc=kc,
        nkc=nkc,
        interpret=interpret,
        fast=_cfg_fast(interpret),
        softmax=softmax,
    )
    if bp != b:
        pad = jnp.finfo(x1.dtype).min
        x1 = jnp.pad(x1, ((0, 0), (0, bp - b), (0, 0)), constant_values=pad)
        x2 = jnp.pad(x2, ((0, 0), (0, bp - b), (0, 0)), constant_values=pad)
    out = _ct_p(cfg, x1, x2, w)
    return out[:, :b] if bp != b else out


# --------------------------------------------------------------------------- #
# Signed log-einsum-exp (SoS / squared circuits with real parameters)
# --------------------------------------------------------------------------- #
# The signed semiring carries values as (log|f|, sign) pairs of real arrays,
# so squared circuits run entirely in f32 (complex64 programs do not even
# compile on some TPU runtimes). These kernels mirror the real lse kernels
# with the sign folded into the shifted exponentials: e = sign * exp(a - m)
# streams through the same packed bf16x3 dots, and the log|y| / sign(y)
# epilogue stays in VMEM. The sign output is piecewise constant, so its
# cotangent is dropped in the backward — matching jnp.sign's zero VJP in the
# XLA fallback (``backend/jax/semiring.py`` SignedLSESemiring).


def _s_fwd_kernel(cfg: _Cfg, *refs):
    _maybe_seed(cfg)
    if cfg.tucker:
        a1_ref, s1_ref, a2_ref, s2_ref, w_ref, oa_ref, os_ref = refs
        (e1, e2), shift = _shifted_exp((a1_ref[0], a2_ref[0]))
        e1 = e1 * s1_ref[0]
        e2 = e2 * s2_ref[0]
        e1r = _repeat_each(e1, e2.shape[1], fast=cfg.fast)
        e = e1r * pltpu.repeat(e2, e1.shape[1], axis=1)  # (BT, K1*K2)
    else:
        a_ref, s_ref, w_ref, oa_ref, os_ref = refs
        (e,), shift = _shifted_exp((a_ref[0],))
        e = e * s_ref[0]
    w = _softmax_rows(w_ref[0].astype(jnp.float32)) if cfg.softmax else w_ref[0]
    y = _dot3(e, w, ((1,), (1,)), fast=cfg.fast)
    oa_ref[0] = jnp.log(jnp.abs(y)) + shift
    os_ref[0] = jnp.sign(y)


def _s_bwd_kernel(cfg: _Cfg, *refs):
    _maybe_seed(cfg)
    if cfg.tucker:
        (a1_ref, s1_ref, a2_ref, s2_ref, w_ref, oa_ref, os_ref, g_ref,
         da1_ref, ds1_ref, da2_ref, ds2_ref, dw_ref) = refs
        es, shift = _shifted_exp((a1_ref[0], a2_ref[0]))
        signs = (s1_ref[0], s2_ref[0])
        es = tuple(e * s for e, s in zip(es, signs))
    else:
        a_ref, s_ref, w_ref, oa_ref, os_ref, g_ref, da_ref, ds_ref, dw_ref = refs
        es, shift = _shifted_exp((a_ref[0],))
        signs = (s_ref[0],)
        es = (es[0] * signs[0],)
    bt_i = pl.program_id(1)
    w = _softmax_rows(w_ref[0].astype(jnp.float32)) if cfg.softmax else w_ref[0]
    # dL/dy = g / y = g * sign(y) * exp(shift - log|y|), zeroed when not finite
    gy = g_ref[0] * os_ref[0] * jnp.exp(shift - oa_ref[0])
    gy = jnp.where(jnp.isfinite(gy), gy, 0.0)
    sdot = _dot3(gy, w, ((1,), (0,)), fast=cfg.fast)  # dL/de: (BT, I)
    if cfg.tucker:
        e1, e2 = es
        k1, k2 = e1.shape[1], e2.shape[1]
        e1r = _repeat_each(e1, k2, fast=cfg.fast)
        e2t = pltpu.repeat(e2, k1, axis=1)
        e = e1r * e2t
        d1 = _seg_dot(sdot * e2t, _repeat_selector(k1, k2), ((1,), (1,)), fast=cfg.fast)
        d2 = _seg_dot(sdot * e1r, _mod_selector(k1, k2), ((1,), (0,)), fast=cfg.fast)
        da1_ref[0] = e1 * d1
        ds1_ref[0] = e1 * signs[0] * d1  # = exp(a1 - m1) * dL/de1
        da2_ref[0] = e2 * d2
        ds2_ref[0] = e2 * signs[1] * d2
    else:
        (e,) = es
        da_ref[0] = e * sdot
        ds_ref[0] = e * signs[0] * sdot
    dwt = _dot3(gy, e, ((0,), (0,)), fast=cfg.fast)

    @pl.when(bt_i == 0)
    def _():
        dw_ref[0] = dwt

    @pl.when(bt_i > 0)
    def _():
        dw_ref[0] += dwt

    if cfg.softmax:
        @pl.when(bt_i == cfg.nbt - 1)
        def _():
            acc = dw_ref[0]
            dw_ref[0] = w * (acc - jnp.sum(w * acc, axis=-1, keepdims=True))


def _s_call_fwd(cfg: _Cfg, xs, w):
    # xs: flat (a1, s1[, a2, s2]) tuple
    f, b = xs[0].shape[:2]
    o, i = w.shape[1:]
    return pl.pallas_call(
        functools.partial(_s_fwd_kernel, cfg),
        grid=(f, cfg.nbt),
        in_specs=[_x_spec(cfg.bt, x.shape[2]) for x in xs] + [_w_spec(o, i)],
        out_specs=[_x_spec(cfg.bt, o), _x_spec(cfg.bt, o)],
        out_shape=[
            jax.ShapeDtypeStruct((f, b, o), xs[0].dtype),
            jax.ShapeDtypeStruct((f, b, o), xs[0].dtype),
        ],
        interpret=cfg.interpret,
    )(*xs, w)


def _s_call_bwd(cfg: _Cfg, xs, w, oa, os_, g):
    f, b = xs[0].shape[:2]
    o, i = w.shape[1:]
    return pl.pallas_call(
        functools.partial(_s_bwd_kernel, cfg),
        grid=(f, cfg.nbt),
        in_specs=[_x_spec(cfg.bt, x.shape[2]) for x in xs]
        + [_w_spec(o, i), _x_spec(cfg.bt, o), _x_spec(cfg.bt, o), _x_spec(cfg.bt, o)],
        out_specs=[_x_spec(cfg.bt, x.shape[2]) for x in xs] + [_w_spec(o, i)],
        # dL/dw accumulates across batch tiles in f32 even for a bf16-resident
        # weight store; the caller casts back (mirrors _call_bwd above)
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in xs]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32)],
        interpret=cfg.interpret,
    )(*xs, w, oa, os_, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sfused_p(cfg: _Cfg, xs, w):
    return _s_call_fwd(cfg, xs, w)


def _sfused_p_fwd(cfg: _Cfg, xs, w):
    oa, os_ = _s_call_fwd(cfg, xs, w)
    return (oa, os_), (xs, w, oa, os_)


def _sfused_p_bwd(cfg: _Cfg, res, gs):
    xs, w, oa, os_ = res
    g, _gs = gs  # the sign output is piecewise constant: cotangent dropped
    grads = _s_call_bwd(cfg, xs, w, oa, os_, g)
    return tuple(grads[:-1]), grads[-1].astype(w.dtype)


_sfused_p.defvjp(_sfused_p_fwd, _sfused_p_bwd)


def slse_dispatch(xs, w, *, softmax: bool, tucker: bool, interpret: bool | None = None):
    """Signed-kernel dispatch: ``xs`` is the flat (a1, s1[, a2, s2]) operand
    tuple; returns the (log|out|, sign) pair or None when the kernel does not
    apply (callers fall back to the XLA composition)."""
    if not _pallas_enabled():
        return None
    if any(x.dtype != jnp.float32 for x in xs):
        return None
    # activations must be f32; the weight may be stored bf16 (the serving
    # store): it is cast/split in VMEM anyway, and bf16 residency halves
    # the dominant HBM stream (the weights) on the flagship shapes
    if w.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    f, b = xs[0].shape[:2]
    o, i = w.shape[1:]
    if o < 8:
        return None
    if not _w_resident_ok(o, i, softmax=softmax):
        return None  # same weight-residency OOM class as _dispatch
    widths = [x.shape[2] for x in xs]
    bt = min(256, _round_up(b, 8))
    while True:
        work = bt * (2 * o + 2 * sum(widths)) + (o + 1) * i
        if tucker:
            work += (4 * bt + widths[0]) * i
        else:
            work += 2 * bt * i
        if 4 * work <= _VMEM_BUDGET or bt <= 8:
            break
        bt = max(8, bt // 2)
    if 4 * work > _VMEM_BUDGET:
        return None
    interpret = _interpret_default() if interpret is None else interpret
    bp = _round_up(b, bt)
    cfg = _Cfg(
        bt=bt, nbt=bp // bt, interpret=interpret, fast=_cfg_fast(interpret),
        softmax=softmax, tucker=tucker,
    )
    if bp != b:
        pad = jnp.finfo(xs[0].dtype).min
        padded = []
        for j, x in enumerate(xs):
            cv = pad if j % 2 == 0 else 1.0  # logmag pads to -max, sign to +1
            padded.append(jnp.pad(x, ((0, 0), (0, bp - b), (0, 0)), constant_values=cv))
        xs = tuple(padded)
    oa, os_ = _sfused_p(cfg, xs, w)
    if bp != b:
        oa, os_ = oa[:, :b], os_[:, :b]
    return oa, os_


# --------------------------------------------------------------------------- #
# In-VMEM routing choice for Tucker-2 entries (MAP argmax / posterior draw)
# --------------------------------------------------------------------------- #
# The lazy downward pass of MAP/conditional sampling (backend/jax/queries.py)
# picks, per (fold, sample), ONE composite index m of the selected output
# unit's mixture: argmax / categorical over scores[m] = log w[o*, m] +
# x1[m // K2] + x2[m % K2]. In XLA this streams three (F, M, B) tensors plus
# the Gumbel noise through HBM per entry; here everything lives in VMEM —
# the chosen weight row is extracted with an exact one-hot selection matmul
# (never a gather), the composite is formed by the same repeat tricks as the
# forward kernel, the noise comes from the hardware PRNG, and only the (F,
# B) index leaves the kernel. Routing is invariant to per-row constants, so
# softmax-parameterized weights contribute their raw logits — the softmax
# itself is never computed.
#
# Numerics: operands are max-shifted per row, then selected/repeated through
# 3-term bf16-split matmuls (hi+mid+lo ~ 24 mantissa bits, f32-grade), so
# kernel scores match the XLA path to f32 rounding. All kernel I/O is f32
# (indices < 2^24 ride f32 exactly), sidestepping Mosaic int-dtype layout
# restrictions. The sample variant needs the hardware PRNG and therefore
# does not run in CPU interpret mode (callers fall back to XLA there); the
# max variant runs everywhere.


@dataclass(frozen=True)
class _RouteCfg:
    bt: int
    nbt: int
    interpret: bool
    log_weights: bool  # True: th rows are logits/log-weights; False: linear
    sample: bool  # gumbel-perturb (hardware PRNG) instead of plain argmax


def _split3(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Three-term bf16 split: hi + mid + lo == v to ~24 mantissa bits."""
    hi = v.astype(jnp.bfloat16)
    r = v - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _sel_dot3(sel01: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(BT, O) 0/1 selector x (O, M) f32 -> (BT, M), f32-grade: three
    narrow dots (the O-contraction is tiny) over the 3-term split."""
    parts = _split3(v)
    out = _dot1(sel01, parts[0], ((1,), (0,)))
    out = out + _dot1(sel01, parts[1], ((1,), (0,)))
    return out + _dot1(sel01, parts[2], ((1,), (0,)))


def _repeat_each3(e1: jnp.ndarray, k2: int) -> jnp.ndarray:
    """f32-grade element-repeat (BT, K1) -> (BT, K1*K2) via the 0/1
    selector with a 3-term split packed along the rows."""
    k1 = e1.shape[1]
    s = _repeat_selector(k1, k2)
    bt = e1.shape[0]
    hi, mid, lo = _split3(e1)
    d = _dot1(jnp.concatenate([hi, mid, lo], axis=0), s, ((1,), (0,)))
    return d[:bt] + d[bt : 2 * bt] + d[2 * bt :]


def _route_kernel(cfg: _RouteCfg, x1_ref, x2_ref, th_ref, sel_ref, seed_ref, m_ref):
    x1, x2 = x1_ref[0], x2_ref[0]  # (BT, K1), (BT, K2) log-space f32
    th = th_ref[0].astype(jnp.float32)  # (O, M)
    sel = sel_ref[0]  # (BT, 1) f32 unit index (pre-clamped >= 0)
    k1, k2 = x1.shape[1], x2.shape[1]
    o = th.shape[0]
    # per-row max shifts keep magnitudes small so the bf16 splits stay
    # f32-grade; shifts are per-row constants and cannot change the choice
    # clamp to a large finite floor before anything hits a bf16 split: a
    # -inf operand (zero-probability value/weight) would make the split
    # residual NaN and poison the whole score row; -1e30 still loses every
    # max/draw against any finite score
    lo = jnp.float32(-1e30)
    x1 = jnp.maximum(x1 - _clamp_max(x1), lo)
    x2 = jnp.maximum(x2 - _clamp_max(x2), lo)
    # iota must be integer-typed on Mosaic; sel rides f32 (exact < 2^24)
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (x1.shape[0], o), 1)
        == sel.astype(jnp.int32)
    ).astype(jnp.bfloat16)
    if cfg.log_weights:
        # -inf logits (explicit zero mixture weights) would NaN the split
        # residual exactly like -inf child values: same floor
        selw = _sel_dot3(oh, jnp.maximum(th - _clamp_max(th), lo))
    else:
        # zero weights must stay un-routable (the XLA fallback's safelog
        # gives them -inf): floor them at -1e30, far below any legitimate
        # shifted log-weight, instead of log(tiny) ~ -87 which a deep
        # composite gap could overcome
        lw = jnp.where(
            th > 0, jnp.log(jnp.maximum(th, jnp.finfo(jnp.float32).tiny)), lo
        )
        selw = _sel_dot3(oh, jnp.maximum(lw - _clamp_max(lw), lo))
    scores = selw + _repeat_each3(x1, k2) + pltpu.repeat(x2, k1, axis=1)
    if cfg.sample:
        # Mosaic accepts at most two seed words: fold the grid position
        # into one so every kernel instance draws distinct bits
        pltpu.prng_seed(
            jnp.int32(seed_ref[0]),
            pl.program_id(0) * jnp.int32(cfg.nbt) + pl.program_id(1),
        )
        bits = pltpu.bitcast(pltpu.prng_random_bits(scores.shape), jnp.uint32)
        # uniform in [2^-24, 1): mantissa bits into [1, 2), shift down
        u = pltpu.bitcast(
            (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
        ) - (1.0 - 2.0**-24)
        scores = scores - jnp.log(-jnp.log(u))
    # argmax via max + first-match iota (jnp.argmax does not lower reliably)
    mx = jnp.max(scores, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    m_ref[0] = jnp.min(
        jnp.where(scores >= mx, iota, jnp.int32(2**24)), axis=1, keepdims=True
    ).astype(jnp.float32)


def route_tucker2(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    th: jnp.ndarray,
    sel: jnp.ndarray,
    *,
    kind: str,
    log_weights: bool,
    seed: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray | None:
    """Fused routing choice at the selected output unit of a Tucker-2 sum.

    ``x1``/``x2``: (F, B, K1)/(F, B, K2) log-space child values; ``th``:
    (F, O, K1*K2) weight rows — raw logits / log-weights when
    ``log_weights`` (per-row normalizers cannot change the choice), linear
    nonnegative weights otherwise; ``sel``: (F, B) int32 selected unit
    (entries < 0 must be pre-clamped to 0 by the caller and masked after).
    ``kind`` is ``"max"`` (argmax) or ``"sample"`` (Gumbel draw from the
    hardware PRNG, seeded by the (F, B)-independent ``seed`` scalar plus
    the grid position). Returns the (F, B) int32 composite index, or None
    when the kernel does not apply (XLA fallback).
    """
    if not _pallas_enabled():
        return None
    interpret = _interpret_default() if interpret is None else interpret
    if kind == "sample" and interpret:
        return None  # no hardware PRNG in interpret mode
    if x1.dtype != jnp.float32 or x2.dtype != jnp.float32:
        return None
    if th.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    f, b, k1 = x1.shape
    k2 = x2.shape[2]
    o, m = th.shape[1:]
    if k1 < 8 or k2 < 8 or o < 8 or m != k1 * k2 or m % 128 != 0:
        return None
    # th + its shifted f32 copy + the 3-term selection splits are resident
    # per grid cell (the weight-residency OOM class; see _w_resident_ok)
    if not _w_resident_ok(o, m, softmax=True, split_terms=1.5):
        return None
    bt = min(256, _round_up(b, 8))
    while True:
        # th + selw + repeat + scores (+ noise) resident, f32 words
        work = (o + 1) * m + bt * (4 * m + k1 + k2 + o)
        if 4 * work <= _VMEM_BUDGET or bt <= 8:
            break
        bt = max(8, bt // 2)
    if 4 * work > _VMEM_BUDGET:
        return None
    bp = _round_up(b, bt)
    cfg = _RouteCfg(
        bt=bt, nbt=bp // bt, interpret=interpret,
        log_weights=log_weights, sample=kind == "sample",
    )
    self_pad = bp != b
    sel_f = jnp.clip(sel, 0, o - 1).astype(jnp.float32)[:, :, None]
    if self_pad:
        x1 = jnp.pad(x1, ((0, 0), (0, bp - b), (0, 0)))
        x2 = jnp.pad(x2, ((0, 0), (0, bp - b), (0, 0)))
        sel_f = jnp.pad(sel_f, ((0, 0), (0, bp - b), (0, 0)))
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    out = pl.pallas_call(
        functools.partial(_route_kernel, cfg),
        grid=(f, cfg.nbt),
        in_specs=[
            _x_spec(cfg.bt, k1),
            _x_spec(cfg.bt, k2),
            _w_spec(o, m),
            _x_spec(cfg.bt, 1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=_x_spec(cfg.bt, 1),
        out_shape=jax.ShapeDtypeStruct((f, bp, 1), jnp.float32),
        interpret=cfg.interpret,
    )(x1, x2, th, sel_f, seed)
    out = out[:, :b, 0] if self_pad else out[:, :, 0]
    return out.astype(jnp.int32)


# --------------------------------------------------------------------------- #
# Tropical (max-plus) Tucker-2 forward for MAP's upward pass
# --------------------------------------------------------------------------- #
# out[b, o] = max_m (log w[o, m] + x1[b, m // K2] + x2[b, m % K2]): the
# max-product analogue of the fused forward. There is no MXU assist for a
# (max, +) contraction, so the kernel's value is keeping the (BT, M)
# composite and the per-o reductions in VMEM — the XLA formulation streams
# the (F, O, M, B) broadcast through the VPU with HBM-visible intermediates
# and dominates MAPQuery's runtime. The O-loop is unrolled at trace time
# (static), one (BT, M) add+max-reduce per output unit.


@dataclass(frozen=True)
class _TropCfg:
    bt: int
    nbt: int
    interpret: bool
    log_weights: bool


def _tropical_kernel(cfg: _TropCfg, x1_ref, x2_ref, th_ref, o_ref):
    x1, x2 = x1_ref[0], x2_ref[0]  # (BT, K1), (BT, K2)
    th = th_ref[0].astype(jnp.float32)  # (O, M)
    k1, k2 = x1.shape[1], x2.shape[1]
    m1, m2 = _clamp_max(x1), _clamp_max(x2)
    # clamp the shifted values to a large finite floor before the bf16-split
    # repeat: a -inf operand would turn the split residual into NaN; the
    # floor still loses every max against any finite score
    lo = jnp.float32(-1e30)
    x1s = jnp.maximum(x1 - m1, lo)
    x2s = jnp.maximum(x2 - m2, lo)
    if cfg.log_weights:
        lw = th - jax.scipy.special.logsumexp(th, axis=1, keepdims=True)
    else:
        lw = jnp.log(th)  # 0 -> -inf: fine, it never enters a split
    comb = _repeat_each3(x1s, k2) + pltpu.repeat(x2s, k1, axis=1)  # (BT, M)
    cols = [
        jnp.max(comb + lw[oo][None, :], axis=1, keepdims=True)
        for oo in range(th.shape[0])
    ]
    o_ref[0] = jnp.concatenate(cols, axis=1) + m1 + m2


def tropical_tucker2(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    th: jnp.ndarray,
    *,
    log_weights: bool,
    interpret: bool | None = None,
) -> jnp.ndarray | None:
    """Fused tropical Tucker-2 forward: (F, B, K1) x (F, B, K2) x
    (F, O, K1*K2) -> (F, B, O) max-product values. ``th`` holds raw softmax
    logits when ``log_weights`` (rows are log-softmax-normalized in VMEM)
    or linear nonnegative weights otherwise. Returns None when the kernel
    does not apply (XLA fallback)."""
    if not _pallas_enabled():
        return None
    if x1.dtype != jnp.float32 or x2.dtype != jnp.float32:
        return None
    if th.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    f, b, k1 = x1.shape
    k2 = x2.shape[2]
    o, m = th.shape[1:]
    if k1 < 8 or k2 < 8 or o < 8 or m != k1 * k2 or m % 128 != 0:
        return None
    if not _w_resident_ok(o, m, softmax=True, split_terms=0.0):
        return None  # th + its log-normalized f32 copy stay resident
    bt = min(256, _round_up(b, 8))
    while True:
        work = (2 * o + 2) * m + bt * (3 * m + k1 + k2 + o)
        if 4 * work <= _VMEM_BUDGET or bt <= 8:
            break
        bt = max(8, bt // 2)
    if 4 * work > _VMEM_BUDGET:
        return None
    interpret = _interpret_default() if interpret is None else interpret
    bp = _round_up(b, bt)
    cfg = _TropCfg(bt=bt, nbt=bp // bt, interpret=interpret, log_weights=log_weights)
    if bp != b:
        pad = jnp.finfo(x1.dtype).min
        x1 = jnp.pad(x1, ((0, 0), (0, bp - b), (0, 0)), constant_values=pad)
        x2 = jnp.pad(x2, ((0, 0), (0, bp - b), (0, 0)), constant_values=pad)
    out = pl.pallas_call(
        functools.partial(_tropical_kernel, cfg),
        grid=(f, cfg.nbt),
        in_specs=[_x_spec(cfg.bt, k1), _x_spec(cfg.bt, k2), _w_spec(o, m)],
        out_specs=_x_spec(cfg.bt, o),
        out_shape=jax.ShapeDtypeStruct((f, bp, o), jnp.float32),
        interpret=cfg.interpret,
    )(x1, x2, th)
    return out[:, :b] if bp != b else out


# --------------------------------------------------------------------------- #
# Complex log-einsum-exp (SoS / squared circuits)
# --------------------------------------------------------------------------- #
# Complex log-space values z = a + ib contract as exp(z) = exp(a)(cos b +
# i sin b) (ref semantics: ``backend/torch/semiring.py:411-476``). The kernel
# computes the max-shifted *linear-space* complex product y = exp(z - m) @ w^T
# in split-real form entirely in VMEM. The real/imaginary parts of each
# operand are packed along the contraction axis, so yr and yi each cost ONE
# fully-contraction-filled matmul instead of two half-filled ones. Mosaic has
# no atan2 lowering, so the csafelog epilogue (log magnitude + phase) runs
# outside the kernel — an elementwise op on the small (F, B, O) output that
# XLA fuses — and the max shift m is returned as a constant third output:
# its gradient contributions cancel exactly, as in the real kernels.


def _c_fwd_kernel(cfg: _Cfg, xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref, m_ref):
    _maybe_seed(cfg)
    xr, xi = xr_ref[0], xi_ref[0]
    m = _clamp_max(xr)
    ea = jnp.exp(xr - m)
    er = ea * jnp.cos(xi)
    ei = ea * jnp.sin(xi)
    e2 = jnp.concatenate([er, ei], axis=1)  # (BT, 2I)
    wr, wi = wr_ref[0], wi_ref[0]
    # yr = er@wr^T - ei@wi^T and yi = er@wi^T + ei@wr^T, one packed dot each
    yr_ref[0] = _dot3(e2, jnp.concatenate([wr, -wi], axis=1), ((1,), (1,)), fast=cfg.fast)
    yi_ref[0] = _dot3(e2, jnp.concatenate([wi, wr], axis=1), ((1,), (1,)), fast=cfg.fast)
    m_ref[0] = m


def _c_bwd_kernel(
    cfg: _Cfg, xr_ref, xi_ref, wr_ref, wi_ref, m_ref, gyr_ref, gyi_ref,
    dxr_ref, dxi_ref, dwr_ref, dwi_ref,
):
    _maybe_seed(cfg)
    bt_i = pl.program_id(1)
    xr, xi = xr_ref[0], xi_ref[0]
    ea = jnp.exp(xr - m_ref[0])
    er = ea * jnp.cos(xi)
    ei = ea * jnp.sin(xi)
    wr, wi = wr_ref[0], wi_ref[0]
    gyr = jnp.where(jnp.isfinite(gyr_ref[0]), gyr_ref[0], 0.0)
    gyi = jnp.where(jnp.isfinite(gyi_ref[0]), gyi_ref[0], 0.0)
    g2 = jnp.concatenate([gyr, gyi], axis=1)  # (BT, 2O)
    # dL/der = gyr@wr + gyi@wi ; dL/dei = gyi@wr - gyr@wi (contraction over O)
    der = _dot3(g2, jnp.concatenate([wr, wi], axis=0), ((1,), (0,)), fast=cfg.fast)
    dei = _dot3(g2, jnp.concatenate([-wi, wr], axis=0), ((1,), (0,)), fast=cfg.fast)
    # z = a + ib: de/da = e, der/db = -ei, dei/db = er
    dxr_ref[0] = er * der + ei * dei
    dxi_ref[0] = er * dei - ei * der
    et = jnp.concatenate([er, ei], axis=0)  # (2BT, I)
    dwrt = _dot3(jnp.concatenate([gyr, gyi], axis=0), et, ((0,), (0,)), fast=cfg.fast)
    dwit = _dot3(jnp.concatenate([gyi, -gyr], axis=0), et, ((0,), (0,)), fast=cfg.fast)

    @pl.when(bt_i == 0)
    def _():
        dwr_ref[0] = dwrt
        dwi_ref[0] = dwit

    @pl.when(bt_i > 0)
    def _():
        dwr_ref[0] += dwrt
        dwi_ref[0] += dwit


def _m_spec(bt):
    return _vspec((1, bt, 1), lambda fi, bi: (fi, bi, 0))


def _c_call_fwd(cfg: _Cfg, xr, xi, wr, wi):
    f, b = xr.shape[:2]
    o, i = wr.shape[1:]
    return pl.pallas_call(
        functools.partial(_c_fwd_kernel, cfg),
        grid=(f, cfg.nbt),
        in_specs=[_x_spec(cfg.bt, i), _x_spec(cfg.bt, i), _w_spec(o, i), _w_spec(o, i)],
        out_specs=[_x_spec(cfg.bt, o), _x_spec(cfg.bt, o), _m_spec(cfg.bt)],
        out_shape=[
            jax.ShapeDtypeStruct((f, b, o), xr.dtype),
            jax.ShapeDtypeStruct((f, b, o), xr.dtype),
            jax.ShapeDtypeStruct((f, b, 1), xr.dtype),
        ],
        interpret=cfg.interpret,
    )(xr, xi, wr, wi)


def _c_call_bwd(cfg: _Cfg, xr, xi, wr, wi, m, gyr, gyi):
    f, b = xr.shape[:2]
    o, i = wr.shape[1:]
    return pl.pallas_call(
        functools.partial(_c_bwd_kernel, cfg),
        grid=(f, cfg.nbt),
        in_specs=[
            _x_spec(cfg.bt, i), _x_spec(cfg.bt, i),
            _w_spec(o, i), _w_spec(o, i), _m_spec(cfg.bt),
            _x_spec(cfg.bt, o), _x_spec(cfg.bt, o),
        ],
        out_specs=[
            _x_spec(cfg.bt, i), _x_spec(cfg.bt, i), _w_spec(o, i), _w_spec(o, i)
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xr.shape, xr.dtype),
            jax.ShapeDtypeStruct(xi.shape, xi.dtype),
            jax.ShapeDtypeStruct(wr.shape, wr.dtype),
            jax.ShapeDtypeStruct(wi.shape, wi.dtype),
        ],
        interpret=cfg.interpret,
    )(xr, xi, wr, wi, m, gyr, gyi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _cfused_p(cfg: _Cfg, xr, xi, wr, wi):
    return _c_call_fwd(cfg, xr, xi, wr, wi)


def _cfused_p_fwd(cfg: _Cfg, xr, xi, wr, wi):
    yr, yi, m = _c_call_fwd(cfg, xr, xi, wr, wi)
    return (yr, yi, m), (xr, xi, wr, wi, m)


def _cfused_p_bwd(cfg: _Cfg, res, gs):
    xr, xi, wr, wi, m = res
    gyr, gyi, _gm = gs  # the shift output is a constant: its cotangent drops
    return _c_call_bwd(cfg, xr, xi, wr, wi, m, gyr, gyi)


_cfused_p.defvjp(_cfused_p_fwd, _cfused_p_bwd)


def clse_matmul_parts(
    x: jnp.ndarray, w: jnp.ndarray, *, interpret: bool | None = None
):
    """The fused complex lse matmul, in parts — or None off the kernel path.

    ``x``: (F, B, I) complex log-space values; ``w``: (F, O, I) complex
    linear-space weights. Returns ``(yr, yi, m)`` real arrays such that
    ``csafelog(yr + 1j*yi) + m`` equals the complex log-einsum-exp
    ``"fbi,foi->fbo"`` (the caller applies that epilogue; Mosaic cannot
    lower atan2). Returns None when the kernel does not apply (off-TPU,
    non-complex64, or VMEM overflow) — callers fall back to XLA.
    """
    if not _pallas_enabled():
        return None
    if x.dtype != jnp.complex64 or w.dtype != jnp.complex64:
        return None
    f, b = x.shape[:2]
    o, i = w.shape[1:]
    if o < 8:
        return None
    bt = min(256, _round_up(b, 8))
    while True:
        # split-real working set: x tiles + packed e/grads + two packed w copies
        work = bt * (4 * o + 6 * i + 1) + 6 * o * i
        if 4 * work <= _VMEM_BUDGET or bt <= 8:
            break
        bt = max(8, bt // 2)
    if 4 * work > _VMEM_BUDGET:
        return None
    interpret = _interpret_default() if interpret is None else interpret
    bp = _round_up(b, bt)
    cfg = _Cfg(
        bt=bt, nbt=bp // bt, interpret=interpret, fast=_cfg_fast(interpret),
        softmax=False, tucker=False,
    )
    xr, xi = jnp.real(x), jnp.imag(x)
    wr, wi = jnp.real(w), jnp.imag(w)
    if bp != b:
        pad = jnp.finfo(xr.dtype).min
        xr = jnp.pad(xr, ((0, 0), (0, bp - b), (0, 0)), constant_values=pad)
        xi = jnp.pad(xi, ((0, 0), (0, bp - b), (0, 0)))
    yr, yi, m = _cfused_p(cfg, xr, xi, wr, wi)
    if bp != b:
        yr, yi, m = yr[:, :b], yi[:, :b], m[:, :b]
    return yr, yi, m


# --------------------------------------------------------------------------- #
# Public ops
# --------------------------------------------------------------------------- #


def lse_matmul(
    x: jnp.ndarray, w: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    """Fused ``log(exp(x - max) @ w^T) + max`` over the trailing axis.

    ``x``: (F, B, I) log-space values; ``w``: (F, O, I) linear-space weights.
    Returns (F, B, O) log-space values. Equivalent to the reference sum-layer
    einsum ``"fbi,foi->fbo"`` under the lse-sum semiring.
    """
    assert x.shape[::2] == (w.shape[0], w.shape[2]), (x.shape, w.shape)
    out = _dispatch((x,), w, softmax=False, tucker=False, interpret=interpret)
    if out is None:
        out = _dispatch_blocked(x, w, interpret=interpret)
    if out is not None:
        return out
    m = _clamp_max(x)
    y = jnp.einsum("fbi,foi->fbo", jnp.exp(x - m), w, precision=fallback_precision())
    return jnp.log(y) + m


def lse_matmul_softmax(
    x: jnp.ndarray, theta: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    """:func:`lse_matmul` with ``w = softmax(theta, axis=-1)`` fused into the
    kernel — raw logits stream from HBM; the normalized weights exist only in
    VMEM (the north-star reparam-fusion requirement, SURVEY §7)."""
    assert x.shape[::2] == (theta.shape[0], theta.shape[2]), (x.shape, theta.shape)
    out = _dispatch((x,), theta, softmax=True, tucker=False, interpret=interpret)
    if out is not None:
        return out
    if theta.dtype == jnp.bfloat16:
        theta = theta.astype(jnp.float32)
    return lse_matmul(x, jax.nn.softmax(theta, axis=-1), interpret=interpret)


def lse_tucker2(
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    """Fused arity-2 Tucker contraction under the lse-sum semiring.

    ``x1``: (F, B, K1) and ``x2``: (F, B, K2) log-space inputs; ``w``:
    (F, O, K1*K2) linear-space core weight, flattened row-major over (K1, K2).
    Returns (F, B, O) log-space. Equivalent to Kronecker-then-sum (ref:
    ``layers/optimized.py:13-104``) but the outer product lives only in VMEM.
    """
    f, b, k1 = x1.shape
    k2 = x2.shape[2]
    assert x2.shape[:2] == (f, b) and w.shape[::2] == (f, k1 * k2), (
        x1.shape,
        x2.shape,
        w.shape,
    )
    out = _dispatch((x1, x2), w, softmax=False, tucker=True, interpret=interpret)
    if out is None:
        # too wide for one weight tile: the k1-chunked fused kernel keeps
        # single-pass HBM traffic (no materialized outer sum)
        out = _dispatch_tucker_chunked((x1, x2), w, softmax=False, interpret=interpret)
    if out is not None:
        return out
    if _pallas_enabled() and x1.dtype == jnp.float32:
        # Last kernel resort: materialize the (cheap) log-space outer sum
        # once and stream it through the blocked kernel.
        x12 = (x1[:, :, :, None] + x2[:, :, None, :]).reshape(f, b, k1 * k2)
        return lse_matmul(x12, w, interpret=interpret)
    m1 = _clamp_max(x1)
    m2 = _clamp_max(x2)
    w3 = w.reshape(w.shape[0], w.shape[1], k1, k2)
    y = jnp.einsum(
        "fbi,fbj,foij->fbo",
        jnp.exp(x1 - m1),
        jnp.exp(x2 - m2),
        w3,
        precision=fallback_precision(),
    )
    return jnp.log(y) + m1 + m2


def lse_tucker2_softmax(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    theta: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """:func:`lse_tucker2` with ``w = softmax(theta, axis=-1)`` fused into
    the kernel (see :func:`lse_matmul_softmax`)."""
    out = _dispatch((x1, x2), theta, softmax=True, tucker=True, interpret=interpret)
    if out is None:
        # k1-chunked kernel with the online-softmax recurrence: logits
        # stream from HBM once, the normalized table never materializes
        out = _dispatch_tucker_chunked(
            (x1, x2), theta, softmax=True, interpret=interpret
        )
    if out is not None:
        return out
    if theta.dtype == jnp.bfloat16:
        theta = theta.astype(jnp.float32)
    return lse_tucker2(x1, x2, jax.nn.softmax(theta, axis=-1), interpret=interpret)
