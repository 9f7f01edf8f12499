"""Fully-fused training step: backward softmax-VJP + Adam in one kernel.

The generic path per step moves ~13 c·s-sized buffers through HBM:
forward (2 reads of M) + backward (2 reads, 1 write of dM) + XLA-fused Adam
(read M, dM, mu, nu; write M, mu, nu). Fusing the Adam update into the
backward tile kernel removes the dM write, the dM read, and Adam's M read —
~10 c·s transfers per step, a ~25% cut at the memory roofline.

Step structure (unconstrained modes only — cells/clusters; the constrained
mode keeps the generic optax path for its F parameter):

1. rowstats kernel       → per-cell softmax stats (m, l, Σe·M[, Σ|M|, ΣM²])
2. projection kernel     → Y = PᵀA, q = wP            (1 read of M)
3. XLA epilogue          → loss terms + (dY, dq, dh) cotangents via jax.vjp
   (everything downstream of the core is (spots × k)-sized — cheap)
4. rbar kernel           → r_c = Σ_s P ⊙ dP            (1 read of M)
5. dm_adam kernel        → g = P(dP − r) [+ L1/L2 grads], then the exact
   torch/optax Adam update in-tile                     (read M, mu, nu;
                                                        write M, mu, nu)

Numerically identical to optax.adam (b1=0.9, b2=0.999, eps=1e-8 post-sqrt,
bias correction with incremented count) — asserted by tests against the
generic path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .losses import (
    LossWeights,
    MapperData,
    constrained_epilogue,
    unconstrained_epilogue,
    unconstrained_inputs,
)
from .pallas_core import (
    TC,
    TS,
    NEG_BIG,
    _cell_mask,
    _dp_tile,
    _interpret,
    _pad_k,
    _project,
    _rbar_kernel,
    _spot_mask,
)

__all__ = [
    "fused_unconstrained_step",
    "fused_unconstrained_step_adafactor",
    "fused_constrained_step",
    "init_fused_opt_state",
    "init_fused_adafactor_state",
]

BETA1, BETA2, ADAM_EPS = 0.9, 0.999, 1e-8

# Entries at or below this are padding sentinels (the sharded 2-D path plants
# NEG_BIG logits in spot-pad columns so they carry zero softmax mass). Real
# logits live within a few orders of magnitude of their init; the guard keeps
# sentinel entries out of the L1/L2 norm sums and their gradients.
PAD_GUARD = -1e20


# ---------------------------------------------------------------------------
# rowstats with optional L1/L2 norm accumulation
# ---------------------------------------------------------------------------


def _rowstats_norms_kernel(M_ref, m_ref, l_ref, u_ref, s1_ref, s2_ref, *, s_actual: int):
    j = pl.program_id(1)
    tile = M_ref[...].astype(jnp.float32)
    valid = _spot_mask(s_actual, j, tile.shape)
    tile_m = jnp.where(valid, tile, NEG_BIG)
    tile_z = jnp.where(valid & (tile > PAD_GUARD), tile, 0.0)

    tile_max = jnp.max(tile_m, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref)
        u_ref[...] = jnp.zeros_like(u_ref)
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, tile_max)
    scale = jnp.exp(m_old - m_new)
    e = jnp.where(valid, jnp.exp(tile_m - m_new), 0.0)
    l_ref[...] = l_ref[...] * scale + jnp.sum(e, axis=1, keepdims=True)
    u_ref[...] = u_ref[...] * scale + jnp.sum(e * tile_m, axis=1, keepdims=True)
    m_ref[...] = m_new
    s1_ref[...] += jnp.sum(jnp.abs(tile_z), axis=1, keepdims=True)
    s2_ref[...] += jnp.sum(tile_z * tile_z, axis=1, keepdims=True)


def _rowstats_norms(M):
    c, s = M.shape
    grid = (pl.cdiv(c, TC), pl.cdiv(s, TS))
    stat = pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_rowstats_norms_kernel, s_actual=s),
        grid=grid,
        in_specs=[pl.BlockSpec((TC, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=[stat] * 5,
        out_shape=[jax.ShapeDtypeStruct((c, 1), jnp.float32)] * 5,
        interpret=_interpret(),
    )(M)


# ---------------------------------------------------------------------------
# backward + Adam, one pass
# ---------------------------------------------------------------------------


def _pick_adam_ts(param_bytes: int = 4) -> int:
    """Spot-tile width for the Adam kernel.

    Swept on v5e at the bf16 north-star shard (scripts/adam_tile_sweep.py,
    2026-08-19): wider spot tiles (ts=3072, tc=128) beat the default by
    4.6% at the isolated-kernel level, but the full training step is
    tile-invariant (18.85-18.97 ms across ts in {768, 2048, 2560, 3072}),
    so the default stays — the step's bf16 bound is structural VPU work,
    not tile choice. ts=4096 exceeds scoped VMEM and fails to compile."""
    del param_bytes
    return TS


def _pick_adam_tc(ts: int, k: int, moment_bytes: int, compute_bytes: int,
                  param_bytes: int = 4) -> int:
    """Largest cell-tile that keeps the Adam kernel inside scoped VMEM.

    Empirical model calibrated on v5e compile reports: scoped usage ≈
    1.5 × (big block bytes) + 8.4 MB, where big blocks are M/mu/nu in+out
    tiles plus the A and dY blocks. Budget the big blocks to ≤ 4.8 MB.
    """
    per_elem = 2 * (param_bytes + 2 * moment_bytes)  # M + mu/nu, in and out
    for tc in (512, 384, 256, 128):
        big = tc * ts * per_elem + (tc + ts) * k * compute_bytes
        if big <= 4_800_000:
            return tc
    return 128


# ---------------------------------------------------------------------------
# stochastic rounding for low-precision parameter/moment storage
# ---------------------------------------------------------------------------
#
# ``rounding="stochastic"`` stores bf16 values by adding uniform random bits
# below the retained mantissa and truncating — unbiased (E[stored] = value),
# so quantization error accumulates as a zero-mean random walk instead of the
# systematic drift of round-to-nearest (the standard low-precision-training
# guard). Bits come from a counter-based hash of (step seed, tile, element):
# stateless, reproducible, and portable to interpret mode — the pltpu PRNG
# primitives (prng_seed/prng_random_bits) have no interpret lowering, which
# would exclude the whole path from the CPU test suite.


def _wang_hash(x):
    """32-bit integer hash (Wang); ~uniform bits from a counter."""
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    return x ^ (x >> 15)


def _tile_random_bits(shape, seed_u32):
    """(shape) uint32 random bits keyed by ``seed_u32`` (scalar uint32)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    elem = rows * jnp.uint32(shape[1]) + cols
    return _wang_hash(elem ^ _wang_hash(seed_u32 * jnp.uint32(0x9E3779B9)))


def _sr_cast(val_f32, dtype, seed_u32):
    """Stochastic f32 → bf16 cast: add random bits below the bf16 mantissa,
    truncate. For f32 targets this is the identity."""
    if jnp.dtype(dtype) == jnp.float32:
        return val_f32
    assert jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16), dtype
    bits = _tile_random_bits(val_f32.shape, seed_u32)
    u = jax.lax.bitcast_convert_type(val_f32, jnp.uint32)
    u = (u + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    # low mantissa bits are zero, so the f32 → bf16 cast below is exact
    return jax.lax.bitcast_convert_type(u, jnp.float32).astype(dtype)


def _grad_tile(M_tile, P, dP, r, valid, lam_l1: float, lam_l2: float):
    """The full loss gradient for one tile: softmax VJP g = P ⊙ (dP − r̄)
    plus the L1/L2 norm gradients on the raw logits. Shared by the Adam
    update, the Adafactor update, and the Adafactor grad² accumulation so
    all three see the identical gradient."""
    P = jnp.where(valid, P, 0.0)
    dP = jnp.where(valid, dP, 0.0)
    g = P * (dP - r)
    if lam_l1 != 0.0 or lam_l2 != 0.0:
        # sentinel (-1e30) pad entries take no norm gradient: their M² would
        # overflow the second moment to inf and their sign would drift the
        # sentinel
        real = M_tile > PAD_GUARD
        M_norm = jnp.where(real, M_tile, 0.0)
        if lam_l1 != 0.0:
            g = g + lam_l1 * jnp.sign(M_norm)
        if lam_l2 != 0.0:
            g = g + (2.0 * lam_l2) * M_norm
    return jnp.where(valid, g, 0.0)


def _dm_adam_kernel(
    M_ref, A_ref, dY_ref, w_ref, dq_ref, dh_ref, m_ref, l_ref, r_ref,
    mu_ref, nu_ref, sc_ref,
    Mo_ref, muo_ref, nuo_ref, mo_ref, lo_ref, uo_ref, s1o_ref, s2o_ref,
    *, c_actual: int, s_actual: int, lam_l1: float, lam_l2: float,
    with_norms: bool, sr: bool = False, with_dh: bool = True,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    P, dP, _, _ = _dp_tile(
        M_ref[...], m_ref[...], l_ref[...], A_ref[...], dY_ref[...],
        w_ref[...], dq_ref[...], dh_ref[...], i, j, c_actual, s_actual,
        with_dh=with_dh,
    )
    valid = _spot_mask(s_actual, j, P.shape) & _cell_mask(c_actual, i, P.shape)
    M_tile = M_ref[...].astype(jnp.float32)
    g = _grad_tile(M_tile, P, dP, r_ref[...], valid, lam_l1, lam_l2)

    lr = sc_ref[0, 0]
    bc1 = sc_ref[0, 1]
    bc2 = sc_ref[0, 2]

    # moments may be stored in bf16; the update math runs in f32.
    # Bias corrections divide by a SCALAR — hoist the reciprocals so the
    # tile sees multiplies; the one remaining per-element divide is Adam's
    # /(sqrt(v̂)+eps), which has no exact multiplicative form.
    mu_new = BETA1 * mu_ref[...].astype(jnp.float32) + (1.0 - BETA1) * g
    nu_new = BETA2 * nu_ref[...].astype(jnp.float32) + (1.0 - BETA2) * (g * g)
    m_hat = mu_new * (1.0 / bc1)
    v_hat = nu_new * (1.0 / bc2)
    M_new = M_tile - lr * m_hat / (jnp.sqrt(v_hat) + ADAM_EPS)
    if sr:
        # per-(step, tile, array) seed: sc_ref[0,3] carries the step count
        tile_id = jnp.uint32(i * pl.num_programs(1) + j)
        base = _wang_hash(
            sc_ref[0, 3].astype(jnp.int32).astype(jnp.uint32)
            ^ (tile_id * jnp.uint32(0x85EBCA6B))
        )
        M_stored = _sr_cast(M_new, Mo_ref.dtype, base ^ jnp.uint32(1))
        Mo_ref[...] = M_stored
        muo_ref[...] = _sr_cast(mu_new, muo_ref.dtype, base ^ jnp.uint32(2))
        nuo_ref[...] = _sr_cast(nu_new, nuo_ref.dtype, base ^ jnp.uint32(3))
    else:
        M_stored = M_new.astype(Mo_ref.dtype)
        Mo_ref[...] = M_stored
        muo_ref[...] = mu_new.astype(muo_ref.dtype)
        nuo_ref[...] = nu_new.astype(nuo_ref.dtype)

    _emit_next_stats(
        M_stored, j, s_actual, mo_ref, lo_ref, uo_ref, s1o_ref, s2o_ref,
        with_norms=with_norms,
    )


def _emit_next_stats(M_stored, j, s_actual, mo_ref, lo_ref, uo_ref,
                     s1o_ref, s2o_ref, *, with_norms: bool):
    """Fused rowstats of M_new for the NEXT step (saves a full pass over M):
    same online max/sumexp accumulation as the standalone rowstats kernel,
    over the spot-tile (inner) grid dimension. Stats come from the STORED
    value so that with bf16 parameter storage the next step's softmax
    normalization matches what it will actually read back. Shared by the
    Adam and Adafactor update kernels."""
    M_next = M_stored.astype(jnp.float32)
    spot_valid = _spot_mask(s_actual, j, M_next.shape)
    tile_m = jnp.where(spot_valid, M_next, NEG_BIG)
    tile_max = jnp.max(tile_m, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init_stats():
        mo_ref[...] = jnp.full_like(mo_ref, NEG_BIG)
        lo_ref[...] = jnp.zeros_like(lo_ref)
        uo_ref[...] = jnp.zeros_like(uo_ref)
        if with_norms:
            s1o_ref[...] = jnp.zeros_like(s1o_ref)
            s2o_ref[...] = jnp.zeros_like(s2o_ref)

    m_old = mo_ref[...]
    m_run = jnp.maximum(m_old, tile_max)
    scale = jnp.exp(m_old - m_run)
    e = jnp.where(spot_valid, jnp.exp(tile_m - m_run), 0.0)
    lo_ref[...] = lo_ref[...] * scale + jnp.sum(e, axis=1, keepdims=True)
    uo_ref[...] = uo_ref[...] * scale + jnp.sum(e * tile_m, axis=1, keepdims=True)
    mo_ref[...] = m_run
    if with_norms:
        tile_z = jnp.where(spot_valid & (M_next > PAD_GUARD), M_next, 0.0)
        s1o_ref[...] += jnp.sum(jnp.abs(tile_z), axis=1, keepdims=True)
        s2o_ref[...] += jnp.sum(tile_z * tile_z, axis=1, keepdims=True)


def _dm_adam(M, A, w, m, l, dY, dq, dh, r, mu, nu, scalars, lam_l1, lam_l2,
             with_norms: bool, sr: bool = False, with_dh: bool = True,
             ts: int = None, tc: int = None):
    """Backward + Adam + next-step rowstats, one streamed pass.

    Returns (M_new, mu_new, nu_new, m', l', u'[, s1', s2']) where the primed
    values are the softmax stats (and optional L1/L2 norms) of M_new, so the
    next step skips its standalone rowstats pass entirely.

    ``ts``/``tc`` override the spot/cell tile sizes (the tile-sweep probe
    uses them; production callers take the calibrated defaults).
    """
    c, s = M.shape
    k = A.shape[1]
    if ts is None:
        ts = _pick_adam_ts(M.dtype.itemsize)
    if tc is None:
        tc = _pick_adam_tc(ts, k, mu.dtype.itemsize, A.dtype.itemsize,
                           M.dtype.itemsize)
    grid = (pl.cdiv(c, tc), pl.cdiv(s, ts))

    big = lambda i, j: (i, j)  # noqa: E731
    cell_stat = pl.BlockSpec((tc, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tc, ts), big, memory_space=pltpu.VMEM),              # M
        pl.BlockSpec((tc, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),   # A
        pl.BlockSpec((ts, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),   # dY
        cell_stat,                                                          # w
        pl.BlockSpec((1, ts), lambda i, j: (0, j), memory_space=pltpu.VMEM),   # dq
        cell_stat,                                                          # dh
        cell_stat,                                                          # m
        cell_stat,                                                          # l
        cell_stat,                                                          # r
        pl.BlockSpec((tc, ts), big, memory_space=pltpu.VMEM),              # mu
        pl.BlockSpec((tc, ts), big, memory_space=pltpu.VMEM),              # nu
        pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),  # scalars
    ]
    n_stats = 5 if with_norms else 3
    out_specs = [
        pl.BlockSpec((tc, ts), big, memory_space=pltpu.VMEM),
        pl.BlockSpec((tc, ts), big, memory_space=pltpu.VMEM),
        pl.BlockSpec((tc, ts), big, memory_space=pltpu.VMEM),
    ] + [cell_stat] * n_stats
    out_shape = [
        jax.ShapeDtypeStruct((c, s), M.dtype),
        jax.ShapeDtypeStruct((c, s), mu.dtype),
        jax.ShapeDtypeStruct((c, s), nu.dtype),
    ] + [jax.ShapeDtypeStruct((c, 1), jnp.float32)] * n_stats

    def kernel(*refs):
        ins = refs[:12]
        outs = refs[12:]
        if with_norms:
            _dm_adam_kernel(
                *ins, *outs,
                c_actual=c, s_actual=s, lam_l1=float(lam_l1),
                lam_l2=float(lam_l2), with_norms=True, sr=sr, with_dh=with_dh,
            )
        else:
            _dm_adam_kernel(
                *ins, *outs, None, None,
                c_actual=c, s_actual=s, lam_l1=float(lam_l1),
                lam_l2=float(lam_l2), with_norms=False, sr=sr, with_dh=with_dh,
            )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={0: 0, 9: 1, 10: 2},
        interpret=_interpret(),
    )(
        M, A, dY, w.reshape(-1, 1), dq.reshape(1, -1), dh.reshape(-1, 1),
        m, l, r, mu, nu, scalars,
    )


def _rbar(M, A, w, m, l, dY, dq, dh, with_dh: bool = True):
    c, s = M.shape
    k = A.shape[1]
    cell_stat = pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((TC, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TS, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        cell_stat,
        pl.BlockSpec((1, TS), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        cell_stat,
        cell_stat,
        cell_stat,
    ]
    grid = (pl.cdiv(c, TC), pl.cdiv(s, TS))
    return pl.pallas_call(
        partial(_rbar_kernel, c_actual=c, s_actual=s, with_dh=with_dh),
        grid=grid,
        in_specs=in_specs,
        out_specs=[cell_stat],
        out_shape=[jax.ShapeDtypeStruct((c, 1), jnp.float32)],
        interpret=_interpret(),
    )(M, A, dY, w.reshape(-1, 1), dq.reshape(1, -1), dh.reshape(-1, 1), m, l)[0]


# ---------------------------------------------------------------------------
# Adafactor: factored second moment (Shazeer & Stern 2018), fused
# ---------------------------------------------------------------------------
#
# ``optimizer="adafactor"`` replaces Adam's two (cells × spots) moment
# matrices with one (cells,) and one (spots,) vector — the TPU-native
# memory-frugal option Adafactor was designed to be. Per step the fused path
# moves 5 passes of M (projection, rbar, grad² accumulation, update
# read+write) and ~zero optimizer-state bytes, versus Adam's 4 M passes + 8
# moment passes — fewer bytes, but the two extra backward-style passes
# repay the exp/dP recompute that Adam's single fused kernel amortizes, so
# the step measures ~15% SLOWER on a quiet v5e. The win is optimizer-state
# RESIDENCY: c + s instead of 2·c·s (~2.7× the single-chip cell capacity at
# bf16 parameters). Semantics match ``optax.adafactor(learning_rate=lr,
# min_dim_size_to_factor=2, multiply_by_parameter_scale=False,
# clipping_threshold=None, momentum=None)`` exactly (asserted by tests);
# factor statistics are carried in f32 regardless of param_dtype.

ADAFACTOR_EPS = 1e-30  # optax's epsilon on grad² before the row/col means
ADAFACTOR_DECAY = 0.8  # optax's power-schedule exponent: 1 − (t+1)^−0.8


def _gsq_kernel(
    M_ref, A_ref, dY_ref, w_ref, dq_ref, dh_ref, m_ref, l_ref, r_ref,
    vr_ref, vc_ref,
    *, c_actual: int, s_actual: int, lam_l1: float, lam_l2: float,
    with_dh: bool = True,
):
    """Row sums (over spots) and column partial sums (over the cell tile) of
    the squared gradient — the Adafactor second-moment statistics —
    recomputing P/dP/g exactly like the update kernel."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    P, dP, _, _ = _dp_tile(
        M_ref[...], m_ref[...], l_ref[...], A_ref[...], dY_ref[...],
        w_ref[...], dq_ref[...], dh_ref[...], i, j, c_actual, s_actual,
        with_dh=with_dh,
    )
    valid = _spot_mask(s_actual, j, P.shape) & _cell_mask(c_actual, i, P.shape)
    g = _grad_tile(M_ref[...].astype(jnp.float32), P, dP, r_ref[...], valid,
                   lam_l1, lam_l2)
    gsq = g * g

    @pl.when(j == 0)
    def _init():
        vr_ref[...] = jnp.zeros_like(vr_ref)

    vr_ref[...] += jnp.sum(gsq, axis=1, keepdims=True)
    # the (8, ts) column-partial block is indexed (i, j): written exactly
    # once per grid step, summed over the cell-tile axis outside the kernel.
    # Row 0 carries the partial; rows 1-7 are zero padding — Mosaic requires
    # the block's second-to-last dim divisible by 8, and the extra write
    # traffic is 8·ceil(c/tc)·s·4 bytes ≈ 0.3% of the step
    part = jnp.sum(gsq, axis=0, keepdims=True)
    vc_ref[...] = jnp.concatenate(
        [part, jnp.zeros((7, part.shape[1]), jnp.float32)], axis=0
    )


def _gsq(M, A, w, m, l, dY, dq, dh, r, lam_l1, lam_l2, with_dh: bool = True):
    """Returns (vr_sum (c,), vc_sum (s,)): Σ_spots g² per cell and
    Σ_cells g² per spot."""
    c, s = M.shape
    k = A.shape[1]
    n_ci = pl.cdiv(c, TC)
    cell_stat = pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((TC, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TS, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        cell_stat,
        pl.BlockSpec((1, TS), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        cell_stat,
        cell_stat,
        cell_stat,
        cell_stat,
    ]
    grid = (n_ci, pl.cdiv(s, TS))
    vr, vc_parts = pl.pallas_call(
        partial(_gsq_kernel, c_actual=c, s_actual=s, lam_l1=float(lam_l1),
                lam_l2=float(lam_l2), with_dh=with_dh),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            cell_stat,
            pl.BlockSpec((8, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((8 * n_ci, -(-s // TS) * TS), jnp.float32),
        ],
        interpret=_interpret(),
    )(M, A, dY, w.reshape(-1, 1), dq.reshape(1, -1), dh.reshape(-1, 1),
      m, l, r)
    return vr[:, 0], jnp.sum(vc_parts, axis=0)[:s]


def factored_rms_vectors(count, vr, vc, vr_sum, vc_sum, c_actual, s_actual):
    """The XLA-side Adafactor bookkeeping between the two kernels: decay the
    carried factor statistics toward this step's row/col grad² means and
    form the per-row / per-col rsqrt factors of optax's update
    ``u = g · row_factor ⊗ col_factor``.

    Follows optax ``scale_by_factored_rms`` exactly, including the shape-
    dependent orientation: the factor living on the SMALLER dimension is the
    one normalized by its mean (optax reduces ``v_row`` over the largest
    axis and divides it by ``row_col_mean``)."""
    t = count.astype(jnp.float32)
    decay = 1.0 - (t + 1.0) ** (-ADAFACTOR_DECAY)
    gr = vr_sum / float(s_actual) + ADAFACTOR_EPS
    gc = vc_sum / float(c_actual) + ADAFACTOR_EPS
    vr_new = decay * vr + (1.0 - decay) * gr
    vc_new = decay * vc + (1.0 - decay) * gc
    # ** -0.5 (not rsqrt) to match optax bit-for-bit: adafactor dynamics
    # amplify a 1-ulp factor difference into visibly diverged trajectories
    if s_actual >= c_actual:
        rowf = (vr_new / jnp.mean(vr_new)) ** -0.5
        colf = vc_new ** -0.5
    else:
        rowf = vr_new ** -0.5
        colf = (vc_new / jnp.mean(vc_new)) ** -0.5
    return vr_new, vc_new, rowf, colf


def _dm_adafactor_kernel(
    M_ref, A_ref, dY_ref, w_ref, dq_ref, dh_ref, m_ref, l_ref, r_ref,
    rowf_ref, colf_ref, sc_ref,
    Mo_ref, mo_ref, lo_ref, uo_ref, s1o_ref, s2o_ref,
    *, c_actual: int, s_actual: int, lam_l1: float, lam_l2: float,
    with_norms: bool, sr: bool = False, with_dh: bool = True,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    P, dP, _, _ = _dp_tile(
        M_ref[...], m_ref[...], l_ref[...], A_ref[...], dY_ref[...],
        w_ref[...], dq_ref[...], dh_ref[...], i, j, c_actual, s_actual,
        with_dh=with_dh,
    )
    valid = _spot_mask(s_actual, j, P.shape) & _cell_mask(c_actual, i, P.shape)
    M_tile = M_ref[...].astype(jnp.float32)
    g = _grad_tile(M_tile, P, dP, r_ref[...], valid, lam_l1, lam_l2)

    lr = sc_ref[0, 0]
    # u = g · row_factor ⊗ col_factor (rsqrt factors precomputed on the
    # (c,) / (s,) vectors — the only per-element work is two multiplies)
    M_new = M_tile - lr * (g * rowf_ref[...] * colf_ref[...])
    if sr:
        tile_id = jnp.uint32(i * pl.num_programs(1) + j)
        base = _wang_hash(
            sc_ref[0, 1].astype(jnp.int32).astype(jnp.uint32)
            ^ (tile_id * jnp.uint32(0x85EBCA6B))
        )
        M_stored = _sr_cast(M_new, Mo_ref.dtype, base ^ jnp.uint32(1))
    else:
        M_stored = M_new.astype(Mo_ref.dtype)
    Mo_ref[...] = M_stored

    _emit_next_stats(
        M_stored, j, s_actual, mo_ref, lo_ref, uo_ref, s1o_ref, s2o_ref,
        with_norms=with_norms,
    )


def _dm_adafactor(M, A, w, m, l, dY, dq, dh, r, rowf, colf, scalars,
                  lam_l1, lam_l2, with_norms: bool, sr: bool = False,
                  with_dh: bool = True):
    """Adafactor update + next-step rowstats, one streamed pass.

    Returns (M_new, m', l', u'[, s1', s2']). Unlike the Adam kernel there
    are no moment matrices: the factored statistics ride in as the (c, 1)
    row and (1, s) column rsqrt factor vectors."""
    c, s = M.shape
    k = A.shape[1]
    ts = _pick_adam_ts(M.dtype.itemsize)
    # the adafactor kernel carries no mu/nu blocks — reuse the Adam budget
    # model with zero moment bytes for a slightly wider cell tile
    tc = _pick_adam_tc(ts, k, 0, A.dtype.itemsize, M.dtype.itemsize)
    grid = (pl.cdiv(c, tc), pl.cdiv(s, ts))

    big = lambda i, j: (i, j)  # noqa: E731
    cell_stat = pl.BlockSpec((tc, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tc, ts), big, memory_space=pltpu.VMEM),              # M
        pl.BlockSpec((tc, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),   # A
        pl.BlockSpec((ts, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),   # dY
        cell_stat,                                                          # w
        pl.BlockSpec((1, ts), lambda i, j: (0, j), memory_space=pltpu.VMEM),   # dq
        cell_stat,                                                          # dh
        cell_stat,                                                          # m
        cell_stat,                                                          # l
        cell_stat,                                                          # r
        cell_stat,                                                          # rowf
        pl.BlockSpec((1, ts), lambda i, j: (0, j), memory_space=pltpu.VMEM),   # colf
        pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),  # scalars
    ]
    n_stats = 5 if with_norms else 3
    out_specs = [
        pl.BlockSpec((tc, ts), big, memory_space=pltpu.VMEM),
    ] + [cell_stat] * n_stats
    out_shape = [
        jax.ShapeDtypeStruct((c, s), M.dtype),
    ] + [jax.ShapeDtypeStruct((c, 1), jnp.float32)] * n_stats

    def kernel(*refs):
        ins = refs[:12]
        outs = refs[12:]
        if with_norms:
            _dm_adafactor_kernel(
                *ins, *outs,
                c_actual=c, s_actual=s, lam_l1=float(lam_l1),
                lam_l2=float(lam_l2), with_norms=True, sr=sr, with_dh=with_dh,
            )
        else:
            _dm_adafactor_kernel(
                *ins, *outs, None, None,
                c_actual=c, s_actual=s, lam_l1=float(lam_l1),
                lam_l2=float(lam_l2), with_norms=False, sr=sr,
                with_dh=with_dh,
            )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(M, A, dY, w.reshape(-1, 1), dq.reshape(1, -1), dh.reshape(-1, 1),
      m, l, r, rowf.reshape(-1, 1), colf.reshape(1, -1), scalars)


def init_fused_opt_state(M, moment_dtype=jnp.float32):
    """(count, mu, nu) — the fused path's Adam carry.

    ``moment_dtype=bfloat16`` halves the optimizer-state HBM traffic (the
    mu/nu reads+writes are 4 of the step's ~10 cells×spots passes) at the
    cost of ~3 decimal digits on the moments; updates are still computed in
    f32 inside the kernel.
    """
    zeros = jnp.zeros(M.shape, moment_dtype)
    return jnp.zeros((), jnp.int32), zeros, zeros


def initial_stats(M, lw: LossWeights):
    """Softmax rowstats (+ optional L1/L2 norms) of M — the fused step's
    carried statistics; subsequent steps produce them for free inside the
    Adam kernel."""
    if lw.lambda_l1 != 0 or lw.lambda_l2 != 0:
        return tuple(_rowstats_norms(M))
    from .pallas_core import _rowstats

    return tuple(_rowstats(M))


def _unconstrained_cotangents(M, stats, data, lw, compute_dtype):
    """Shared prologue of the fused unconstrained steps: projection forward,
    XLA loss epilogue + VJP, and the rbar pass. Returns everything the
    update kernels need plus the per-term loss report."""
    A, w = unconstrained_inputs(M, data, lw)
    k_real = A.shape[1]
    # compute_dtype=bfloat16 halves the kernels' A/dY block traffic and runs
    # the dP/Y matmuls at the MXU's bf16 rate; P recompute, softmax stats and
    # the optimizer update stay f32 (accumulation is always f32).
    A_p = _pad_k(A).astype(compute_dtype)

    need_norms = lw.lambda_l1 != 0 or lw.lambda_l2 != 0
    if need_norms:
        m, l, u, s1, s2 = stats
        l1_sum = jnp.sum(s1)
        l2_sum = jnp.sum(s2)
    else:
        m, l, u = stats
        l1_sum = l2_sum = None

    Y_p, q = _project(M, A_p, w, m, l)
    h = (u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])

    def epilogue(Y, q, h):
        return unconstrained_epilogue(Y, q, h, l1_sum, l2_sum, data, lw)

    total, vjp, terms = jax.vjp(
        lambda Y, q, h: epilogue(Y, q, h), Y_p[:, :k_real], q, h, has_aux=True
    )
    dY, dq, dh = vjp(jnp.ones_like(total))
    dY_p = _pad_k(dY).astype(compute_dtype)

    # λ_r = 0 ⇒ dh ≡ 0: drop the entropy-cotangent path from the backward
    # kernels (static — λ is compile-time)
    with_dh = lw.lambda_r != 0
    r = _rbar(M, A_p, w, m, l, dY_p, dq, dh, with_dh=with_dh)
    return A_p, w, m, l, dY_p, dq, dh, r, terms, need_norms, with_dh


def fused_unconstrained_step(
    M,
    count,
    mu,
    nu,
    stats,
    data: MapperData,
    lw: LossWeights,
    learning_rate,
    compute_dtype=jnp.float32,
    rounding: str = "nearest",
):
    """One fused Adam step.

    ``stats`` are the carried softmax rowstats of M (from :func:`initial_stats`
    or the previous step's fused output), so the step makes only 3 streamed
    passes over M: projection, rbar, and backward+Adam (which also emits the
    next step's stats).

    Returns ``(M_new, count_new, mu_new, nu_new, stats_new, terms)``.
    """
    (A_p, w, m, l, dY_p, dq, dh, r, terms,
     need_norms, with_dh) = _unconstrained_cotangents(
        M, stats, data, lw, compute_dtype
    )

    count_new = count + 1
    t = count_new.astype(jnp.float32)
    bc1 = 1.0 - BETA1 ** t
    bc2 = 1.0 - BETA2 ** t
    scalars = jnp.stack(
        [jnp.asarray(learning_rate, jnp.float32), bc1, bc2, t]
    ).reshape(1, 4)

    out = _dm_adam(
        M, A_p, w, m, l, dY_p, dq, dh, r, mu, nu, scalars,
        lw.lambda_l1, lw.lambda_l2, with_norms=need_norms,
        sr=rounding == "stochastic", with_dh=with_dh,
    )
    M_new, mu_new, nu_new = out[:3]
    stats_new = tuple(out[3:])
    return M_new, count_new, mu_new, nu_new, stats_new, terms


def init_fused_adafactor_state(M):
    """(count, v_row (c,), v_col (s,)) — the fused Adafactor carry. The
    factor vectors replace Adam's two (c, s) moment matrices; they are
    carried in f32 regardless of the parameter storage dtype."""
    c, s = M.shape
    return (jnp.zeros((), jnp.int32), jnp.zeros((c,), jnp.float32),
            jnp.zeros((s,), jnp.float32))


def fused_unconstrained_step_adafactor(
    M,
    count,
    vr,
    vc,
    stats,
    data: MapperData,
    lw: LossWeights,
    learning_rate,
    compute_dtype=jnp.float32,
    rounding: str = "nearest",
):
    """One fused Adafactor step (see the Adafactor section comment above).

    Same contract as :func:`fused_unconstrained_step` with the (c,) / (s,)
    factor vectors in place of the (c, s) Adam moments: 4 streamed passes
    over M (projection, rbar, grad² accumulation, update — which also emits
    the next step's rowstats) and no moment matrices.

    Returns ``(M_new, count_new, vr_new, vc_new, stats_new, terms)``.
    """
    (A_p, w, m, l, dY_p, dq, dh, r, terms,
     need_norms, with_dh) = _unconstrained_cotangents(
        M, stats, data, lw, compute_dtype
    )

    c, s = M.shape
    vr_sum, vc_sum = _gsq(M, A_p, w, m, l, dY_p, dq, dh, r,
                          lw.lambda_l1, lw.lambda_l2, with_dh=with_dh)
    vr_new, vc_new, rowf, colf = factored_rms_vectors(
        count, vr, vc, vr_sum, vc_sum, c, s
    )

    count_new = count + 1
    scalars = jnp.stack([
        jnp.asarray(learning_rate, jnp.float32),
        count_new.astype(jnp.float32),
    ]).reshape(1, 2)
    out = _dm_adafactor(
        M, A_p, w, m, l, dY_p, dq, dh, r, rowf, colf, scalars,
        lw.lambda_l1, lw.lambda_l2, with_norms=need_norms,
        sr=rounding == "stochastic", with_dh=with_dh,
    )
    M_new = out[0]
    stats_new = tuple(out[1:])
    return M_new, count_new, vr_new, vc_new, stats_new, terms


def _adam_vector(x, g, mu, nu, lr, bc1, bc2):
    """Exact torch/optax Adam on a small dense parameter (the F filter)."""
    mu_new = BETA1 * mu + (1.0 - BETA1) * g
    nu_new = BETA2 * nu + (1.0 - BETA2) * (g * g)
    x_new = x - lr * (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + ADAM_EPS)
    return x_new, mu_new, nu_new


def fused_constrained_step(
    M,
    F,
    count,
    mu,
    nu,
    muF,
    nuF,
    stats,
    data: MapperData,
    lw: LossWeights,
    learning_rate,
    compute_dtype=jnp.float32,
    rounding: str = "nearest",
):
    """One fused Adam step for the constrained mapper (M and the filter F).

    Reference semantics: ``MapperConstrained._loss_fn``
    (``mapping_optimizer.py:495-587``), Adam over ``[M, F]`` (``:607``).

    M rides the same 3-pass fused pipeline as the unconstrained step with
    ``A = S ⊙ σ(F)`` and ``w = σ(F)``. F's gradient needs *no extra pass over
    M*: both its A-path and q-path contributions scale linearly in
    ``w = σ(F)``, so they are recoverable from the rbar reduction already
    computed for the softmax VJP::

        r_c   = Σ_s P·dP = w_c·(dL/dw_c)|_{A,q-paths} + dh_c·(h_c + 1)
        dL/dF = dF_direct + σ'(F)/w · (r − dh·(h+1))
              = dF_direct + (1 − w) · (r − dh·(h+1))

    where dF_direct (count/f_reg/density-denominator terms) comes from the
    epilogue vjp. F's own Adam update is an O(cells) vector op.

    Returns ``((M_new, F_new), count_new, (mu, muF), (nu, nuF), stats_new,
    terms)``.
    """
    w = jax.nn.sigmoid(F)
    S = data.S
    if data.gene_mask is not None:
        S = S * data.gene_mask[None, :]
    A = S * w[:, None]
    k_real = A.shape[1]
    A_p = _pad_k(A).astype(compute_dtype)

    m, l, u = stats
    Y_p, q = _project(M, A_p, w, m, l)
    h = (u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])
    h_sum = jnp.sum(h)

    total, vjp, terms = jax.vjp(
        lambda Y, qq, hs, FF: constrained_epilogue(Y, qq, hs, FF, data, lw),
        Y_p[:, :k_real],
        q,
        h_sum,
        F,
        has_aux=True,
    )
    dY, dq, dhs, dF_direct = vjp(jnp.ones_like(total))
    dY_p = _pad_k(dY).astype(compute_dtype)
    dh = jnp.broadcast_to(dhs, (M.shape[0],))

    with_dh = lw.lambda_r != 0  # λ_r = 0 ⇒ dh ≡ 0 (static)
    r = _rbar(M, A_p, w, m, l, dY_p, dq, dh, with_dh=with_dh)
    gF = dF_direct + (1.0 - w) * (r[:, 0] - dh * (h + 1.0))

    count_new = count + 1
    t = count_new.astype(jnp.float32)
    bc1 = 1.0 - BETA1 ** t
    bc2 = 1.0 - BETA2 ** t
    scalars = jnp.stack(
        [jnp.asarray(learning_rate, jnp.float32), bc1, bc2, t]
    ).reshape(1, 4)

    M_new, mu_new, nu_new, m2, l2, u2 = _dm_adam(
        M, A_p, w, m, l, dY_p, dq, dh, r, mu, nu, scalars, 0.0, 0.0,
        with_norms=False, sr=rounding == "stochastic", with_dh=with_dh,
    )
    F_new, muF_new, nuF_new = _adam_vector(
        F, gF, muF.astype(jnp.float32), nuF.astype(jnp.float32),
        jnp.asarray(learning_rate, jnp.float32), bc1, bc2,
    )
    return (
        (M_new, F_new),
        count_new,
        (mu_new, muF_new.astype(muF.dtype)),
        (nu_new, nuF_new.astype(nuF.dtype)),
        (m2, l2, u2),
        terms,
    )
