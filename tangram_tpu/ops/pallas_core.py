"""Pallas TPU kernels for the fused mapper core.

``mapper_core(M, A, w) -> (Y, q, h)`` with P = softmax(M, rows over spots):
Y = Pᵀ A, q = w P, h_c = Σ_s P log P.

Why a hand-written kernel: the XLA path materializes P (and, in the backward
pass, dP) in HBM — extra O(cells · spots) buffers read+written several times
per step. At atlas scale (100k × 50k fp32 = 20 GB) that doesn't just cost
bandwidth, it can't fit. These kernels stream M tile-by-tile:

* forward  = 2 passes over M   (online row stats, then fused exp→MXU matmul)
* backward = 2 passes over M   (recompute P from stats; dP is formed on the
  fly from A·dYᵀ + w⊗dq + dh·(logP+1) and consumed by the softmax VJP inside
  the same tile — never stored)

Per-step HBM traffic for the hot loop becomes ~5 c·s transfers (+ Adam's 6)
versus the naive ~9-12, and peak memory stays O(c·s) for the parameters.

The reductions cross: softmax rows run over spots while Y/q accumulate over
cells, so a FlashAttention-style single fused pass is impossible — two passes
is bandwidth-optimal for this op family.

Reference semantics being fused: ``mapping_optimizer.py:201-202`` (softmax +
Mᵀ@S), ``:215-217`` (density marginal), ``:224`` (entropy).

All shapes are static under jit; ragged edge tiles are handled with iota
masks instead of padded copies (a per-step jnp.pad of M would add a full
c·s read+write to every step).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mapper_core_pallas"]

# Tile sizes: multiples of the f32 (8, 128) base tile. Measured on v5e at the
# tutorial workload (paired A/Bs): 512-cell tiles beat 256 by ~10% (fewer
# refetches of the (spots, genes) cotangent block), and 768-spot tiles beat
# 512 by ~5%. The fused backward+Adam kernel independently shrinks its cell
# tile to fit scoped VMEM (see fused_step._pick_adam_tc).
TC = 512  # cells per tile
TS = 768  # spots per tile
NEG_BIG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _spot_mask(s_actual: int, j, shape):
    """Mask of valid spot columns for spot-tile index j (tile-size derived
    from the block shape so kernels can run with any tile configuration)."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    return (j * shape[1] + col) < s_actual


def _cell_mask(c_actual: int, i, shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=0)
    return (i * shape[0] + row) < c_actual


# ---------------------------------------------------------------------------
# Forward kernel 1: per-cell online softmax stats (max, sumexp, Σ exp·M)
# ---------------------------------------------------------------------------


def _rowstats_kernel(M_ref, m_ref, l_ref, u_ref, *, s_actual: int):
    j = pl.program_id(1)

    tile = M_ref[...].astype(jnp.float32)  # params may be stored bf16
    valid = _spot_mask(s_actual, j, tile.shape)
    tile = jnp.where(valid, tile, NEG_BIG)

    tile_max = jnp.max(tile, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref)
        u_ref[...] = jnp.zeros_like(u_ref)

    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, tile_max)
    scale = jnp.exp(m_old - m_new)
    e = jnp.where(valid, jnp.exp(tile - m_new), 0.0)
    l_ref[...] = l_ref[...] * scale + jnp.sum(e, axis=1, keepdims=True)
    u_ref[...] = u_ref[...] * scale + jnp.sum(e * tile, axis=1, keepdims=True)
    m_ref[...] = m_new


def _rowstats(M):
    c, s = M.shape
    grid = (pl.cdiv(c, TC), pl.cdiv(s, TS))  # spot innermost → stats accumulate
    stat_spec = pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    m, l, u = pl.pallas_call(
        partial(_rowstats_kernel, s_actual=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TC, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=[stat_spec, stat_spec, stat_spec],
        out_shape=[jax.ShapeDtypeStruct((c, 1), jnp.float32)] * 3,
        interpret=_interpret(),
    )(M)
    return m, l, u


# ---------------------------------------------------------------------------
# Forward kernel 2: Y = Pᵀ A and q = w P, recomputing P from (m, l)
# ---------------------------------------------------------------------------


def _project_kernel(
    M_ref, A_ref, w_ref, m_ref, l_ref, Y_ref, q_ref, *, c_actual: int, s_actual: int
):
    j = pl.program_id(0)  # spot tile
    i = pl.program_id(1)  # cell tile (inner, accumulated)

    tile = M_ref[...].astype(jnp.float32)  # (TC, TS); params may be bf16
    # reciprocal on the (TC, 1) stat column, broadcast multiply: a full-tile
    # divide is many-cycle on the VPU and was measurable at bf16 shapes
    P = jnp.exp(tile - m_ref[...]) * (1.0 / l_ref[...])
    # Mask every contraction input's out-of-bounds region: OOB block loads
    # are undefined (NaN in interpret mode) and 0·NaN would poison the MXU
    # accumulation.
    P = jnp.where(_cell_mask(c_actual, i, P.shape), P, 0.0)
    P = jnp.where(_spot_mask(s_actual, j, P.shape), P, 0.0)
    A = jnp.where(_cell_mask(c_actual, i, A_ref.shape), A_ref[...], 0.0)
    w_valid = (
        i * w_ref.shape[1] + jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 1)
    ) < c_actual
    wv = jnp.where(w_valid, w_ref[...], 0.0)

    @pl.when(i == 0)
    def _init():
        Y_ref[...] = jnp.zeros_like(Y_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    # A may arrive in bf16 (compute_dtype option): match P's dtype to feed
    # the MXU at double rate; accumulation stays f32.
    Y_ref[...] += jax.lax.dot_general(
        P.astype(A.dtype), A,
        dimension_numbers=(((0,), (0,)), ((), ())),  # Pᵀ @ A
        preferred_element_type=jnp.float32,
    )
    q_ref[...] += jax.lax.dot_general(
        wv, P,
        dimension_numbers=(((1,), (0,)), ((), ())),  # (1,TC) @ (TC,TS)
        preferred_element_type=jnp.float32,
    )


def _project(M, A, w, m, l):
    c, s = M.shape
    k = A.shape[1]
    grid = (pl.cdiv(s, TS), pl.cdiv(c, TC))  # cell innermost → Y/q accumulate
    Y, q = pl.pallas_call(
        partial(_project_kernel, c_actual=c, s_actual=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TC, TS), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TC), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TS, k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, k), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.float32),
        ],
        interpret=_interpret(),
    )(M, A, w.reshape(1, -1), m, l)
    return Y, q[0]


# ---------------------------------------------------------------------------
# Backward: dP is never materialized — formed per tile and consumed in place
# ---------------------------------------------------------------------------


def _dp_tile(M_tile, m, l, A_tile, dY_tile, w_tile, dq_tile, dh_tile,
             i, j, c_actual: int, s_actual: int, with_dh: bool = True):
    """Recompute P and form dP for one (TC, TS) tile.

    dP = A dYᵀ + w ⊗ dq + dh ⊙ (log P + 1): the cotangents of Y = PᵀA,
    q = wP and h = Σ P log P respectively. All contraction inputs are masked
    in their OOB regions (undefined loads would produce 0·NaN = NaN).

    ``with_dh=False`` (static) removes the entropy cotangent path — log P and
    its fused multiply-add over the full tile — for the common λ_r = 0
    configuration where dh is identically zero.
    """
    M_tile = M_tile.astype(jnp.float32)  # params may be stored bf16
    e = jnp.exp(M_tile - m)
    P = e * (1.0 / l)  # per-row reciprocal, not a full-tile divide
    A_tile = jnp.where(_cell_mask(c_actual, i, A_tile.shape), A_tile, 0.0)
    spot_rows = (
        j * dY_tile.shape[0] + jax.lax.broadcasted_iota(jnp.int32, dY_tile.shape, 0)
    ) < s_actual
    dY_tile = jnp.where(spot_rows, dY_tile, 0.0)
    dq_cols = (
        j * dq_tile.shape[1] + jax.lax.broadcasted_iota(jnp.int32, dq_tile.shape, 1)
    ) < s_actual
    dq_tile = jnp.where(dq_cols, dq_tile, 0.0)
    dP = jax.lax.dot_general(
        A_tile, dY_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),  # A @ dYᵀ → (TC, TS)
        preferred_element_type=jnp.float32,
    )
    dP = dP + w_tile * dq_tile  # (TC,1) * (1,TS)
    if with_dh:
        logP = M_tile - m - jnp.log(l)
        dP = dP + dh_tile * (logP + 1.0)
    return P, dP, dY_tile, dq_tile


def _rbar_kernel(
    M_ref, A_ref, dY_ref, w_ref, dq_ref, dh_ref, m_ref, l_ref, r_ref,
    *, c_actual: int, s_actual: int, with_dh: bool = True,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    P, dP, _, _ = _dp_tile(
        M_ref[...], m_ref[...], l_ref[...], A_ref[...], dY_ref[...],
        w_ref[...], dq_ref[...], dh_ref[...], i, j, c_actual, s_actual,
        with_dh=with_dh,
    )
    prod = jnp.where(_spot_mask(s_actual, j, P.shape), P * dP, 0.0)
    prod = jnp.where(_cell_mask(c_actual, i, prod.shape), prod, 0.0)

    @pl.when(j == 0)
    def _init():
        r_ref[...] = jnp.zeros_like(r_ref)

    r_ref[...] += jnp.sum(prod, axis=1, keepdims=True)


def _dm_kernel(
    M_ref, A_ref, dY_ref, w_ref, dq_ref, dh_ref, m_ref, l_ref, r_ref,
    dM_ref, dA_ref, dw_ref,
    *, c_actual: int, s_actual: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)  # spot tile (inner → dA/dw accumulate across it)
    P, dP, dY_m, dq_m = _dp_tile(
        M_ref[...], m_ref[...], l_ref[...], A_ref[...], dY_ref[...],
        w_ref[...], dq_ref[...], dh_ref[...], i, j, c_actual, s_actual,
    )
    valid = _spot_mask(s_actual, j, P.shape)
    cmask = _cell_mask(c_actual, i, P.shape)
    P = jnp.where(valid & cmask, P, 0.0)
    dP = jnp.where(valid & cmask, dP, 0.0)
    dM_ref[...] = (P * (dP - r_ref[...])).astype(dM_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dA_ref[...] = jnp.zeros_like(dA_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dA_ref[...] += jax.lax.dot_general(
        P, dY_m,
        dimension_numbers=(((1,), (0,)), ((), ())),  # P @ dY → (TC, k)
        preferred_element_type=jnp.float32,
    )
    dw_ref[...] += jax.lax.dot_general(
        P, dq_m,
        dimension_numbers=(((1,), (1,)), ((), ())),  # P @ dqᵀ → (TC, 1)
        preferred_element_type=jnp.float32,
    )


def _backward(M, A, w, m, l, dY, dq, dh):
    c, s = M.shape
    k = A.shape[1]
    w2 = w.reshape(-1, 1)
    dq2 = dq.reshape(1, -1)
    dh2 = dh.reshape(-1, 1)

    def in_specs():
        return [
            pl.BlockSpec((TC, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ]

    grid = (pl.cdiv(c, TC), pl.cdiv(s, TS))  # spot innermost

    r = pl.pallas_call(
        partial(_rbar_kernel, c_actual=c, s_actual=s),
        grid=grid,
        in_specs=in_specs(),
        out_specs=[
            pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_shape=[jax.ShapeDtypeStruct((c, 1), jnp.float32)],
        interpret=_interpret(),
    )(M, A, dY, w2, dq2, dh2, m, l)[0]

    dM, dA, dw = pl.pallas_call(
        partial(_dm_kernel, c_actual=c, s_actual=s),
        grid=grid,
        in_specs=in_specs()
        + [pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((TC, TS), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, s), M.dtype),
            jax.ShapeDtypeStruct((c, k), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(M, A, dY, w2, dq2, dh2, m, l, r)
    return dM, dA, dw[:, 0]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _pad_k(X):
    """Pad the gene/annotation axis to a lane multiple (128). Zero columns
    project to zero outputs, which the wrappers slice off again; in the
    backward pass zero dY columns contribute nothing."""
    k = X.shape[1]
    k_pad = -(-k // 128) * 128
    if k_pad == k:
        return X
    return jnp.pad(X, ((0, 0), (0, k_pad - k)))


def _forward_parts(M, A, w):
    k = A.shape[1]
    A = _pad_k(A)
    m, l, u = _rowstats(M)
    Y, q = _project(M, A, w, m, l)
    # h = Σ_s P log P = Σ_s (e/l)·(M − m − log l) = u/l − m − log l
    # (u accumulates Σ e·M with e = exp(M − m); Σ e = l)
    h = (u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])
    return Y[:, :k], q, h, (m, l)


@jax.custom_vjp
def mapper_core_pallas(M, A, w):
    Y, q, h, _ = _forward_parts(M, A, w)
    return Y, q, h


def _fwd(M, A, w):
    Y, q, h, (m, l) = _forward_parts(M, A, w)
    return (Y, q, h), (M, A, w, m, l)


def _bwd(res, cts):
    M, A, w, m, l = res
    dY, dq, dh = cts
    k = A.shape[1]
    dM, dA, dw = _backward(M, _pad_k(A), w, m, l, _pad_k(dY), dq, dh)
    return dM, dA[:, :k], dw


mapper_core_pallas.defvjp(_fwd, _bwd)
