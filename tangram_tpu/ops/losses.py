"""Pure-JAX implementations of every Tangram loss term.

Semantics mirror the reference optimizer (``mapping_optimizer.py:189-309`` and
``:495-587``) exactly, including the per-term reporting quirks (terms reported
as ``term / lambda`` which yields NaN when a lambda is 0, and the sign flip of
the reported entropy between the plain and constrained mappers). The total
loss is always mathematically identical to the reference.

Improvements over the reference, without changing results:

* Geary's C uses the exact algebraic identity
  ``sum_ij w_ij (x_i - x_j)^2 = r·x² + c·x² - 2·sum(x ⊙ Wx)``
  (r/c = row/col sums of W), replacing the reference's O(spots² · genes)
  dense broadcast (``mapping_optimizer.py:182-185``) with O(spots · genes) —
  mandatory for any realistic spot count.
* Every per-gene reduction supports a ``gene_mask`` so cross-validation folds
  of different sizes share one padded, jit-compiled shape.
* Spot-graph products accept either a dense matrix or a
  :class:`~tangram_tpu.ops.core.NeighborGraph` (k-NN structure-of-arrays).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .core import graph_matmul, mapper_core

__all__ = [
    "LossWeights",
    "MapperData",
    "cosine_similarity",
    "kl_div_sum",
    "spatial_local_indicators",
    "compute_loss",
    "compute_constrained_loss",
    "constrained_epilogue",
    "unconstrained_inputs",
    "unconstrained_epilogue",
    "val_metrics",
]

COSINE_EPS = 1e-8  # matches torch.nn.functional.cosine_similarity default


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Static loss-term strengths. A zero lambda removes the term from the
    compiled graph entirely (the reference gates the same way at
    ``mapping_optimizer.py:234,242,255-263``)."""

    lambda_g1: float = 1.0
    lambda_d: float = 0.0
    lambda_g2: float = 0.0
    lambda_r: float = 0.0
    lambda_l1: float = 0.0
    lambda_l2: float = 0.0
    lambda_neighborhood_g1: float = 0.0
    lambda_ct_islands: float = 0.0
    lambda_getis_ord: float = 0.0
    lambda_moran: float = 0.0
    lambda_geary: float = 0.0
    # constrained mode only
    lambda_count: float = 1.0
    lambda_f_reg: float = 1.0


class MapperData(NamedTuple):
    """Pytree of device arrays consumed by the loss. ``None`` disables a term."""

    S: jnp.ndarray  # (cells, genes) training expression
    G: jnp.ndarray  # (spots, genes) spatial expression
    gene_mask: Optional[jnp.ndarray] = None  # (genes,) 1/0 for padded folds
    d: Optional[jnp.ndarray] = None  # (spots,) target density
    d_source: Optional[jnp.ndarray] = None  # (cells,) cluster density
    voxel_weights: Any = None  # (spots, spots) or NeighborGraph
    neighborhood_filter: Any = None  # (spots, spots) or NeighborGraph
    ct_encode: Optional[jnp.ndarray] = None  # (cells, n_celltypes)
    spatial_weights: Any = None  # (spots, spots) or NeighborGraph
    getis_ord_ref: Optional[jnp.ndarray] = None  # (spots, genes)
    moran_ref: Optional[jnp.ndarray] = None  # (spots, genes)
    geary_ref: Optional[jnp.ndarray] = None  # (genes,)
    target_count: Optional[jnp.ndarray] = None  # scalar, constrained mode


def cosine_similarity(x, y, axis: int = 0, eps: float = COSINE_EPS):
    """torch-compatible cosine similarity along ``axis``: each norm is clamped
    to ``eps`` individually (verified against torch 2.x behavior).

    The clamp is applied *inside* the sqrt (``sqrt(max(Σx², eps²))``) — same
    value as ``max(‖x‖, eps)``, but with a zero (not NaN) gradient at x = 0,
    which matters for padded/masked gene columns: ``d‖x‖/dx = x/‖x‖`` is NaN
    at 0 and would poison the whole gradient through ``0 * NaN``.
    """
    dot = jnp.sum(x * y, axis=axis)
    nx = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis), eps * eps))
    ny = jnp.sqrt(jnp.maximum(jnp.sum(y * y, axis=axis), eps * eps))
    return dot / (nx * ny)


def kl_div_sum(log_pred, target):
    """torch ``KLDivLoss(reduction='sum')``: sum of target·(log target − log_pred),
    with 0·log 0 := 0 (reference ``mapping_optimizer.py:122,218``).

    Zero-target entries contribute exactly 0 even when ``log_pred`` is −inf
    there — required for padded spot rows in the sharded paths, identical
    everywhere real priors are strictly positive."""
    pos = target > 0
    xlogx = jnp.where(pos, target * jnp.log(jnp.where(pos, target, 1.0)), 0.0)
    cross = jnp.where(pos, target * log_pred, 0.0)
    return jnp.sum(xlogx - cross)


def _masked_mean(values, mask):
    if mask is None:
        return jnp.mean(values)
    return jnp.sum(values * mask) / jnp.sum(mask)


def _safe_div(num, den):
    ok = den != 0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def spatial_local_indicators(G, W, lw: LossWeights):
    """Getis-Ord G*, Moran's I, and Geary's C per gene.

    Matches reference ``mapping_optimizer.py:159-187`` numerically; Geary's C
    is computed via the streamed identity (see module docstring) instead of
    the O(s²·g) broadcast. Gene masking is not needed here: padded/held-out
    columns of ``G`` are zero, the indicators come out 0 via ``_safe_div``,
    and the downstream ``_masked_mean`` over cosine similarities excludes
    them.
    """
    getis_ord = moran = geary = None
    n_spots = G.shape[0]

    WG = None
    if lw.lambda_getis_ord > 0 or lw.lambda_moran > 0 or lw.lambda_geary > 0:
        WG = graph_matmul(W, G)

    if lw.lambda_getis_ord > 0:
        getis_ord = _safe_div(WG, jnp.sum(G, axis=0))

    if lw.lambda_moran > 0:
        mean = jnp.mean(G, axis=0)
        z = G - mean
        # W @ broadcast(mean) is exactly row_sums(W) ⊗ mean — no second
        # (spots × spots) matmul needed
        if hasattr(W, "row_sums"):
            w_rows = W.row_sums()
        else:
            w_rows = jnp.sum(W, axis=1)
        Wz = WG - w_rows[:, None] * mean[None, :]
        moran = _safe_div(n_spots * z * Wz, jnp.sum(z * z, axis=0))

    if lw.lambda_geary > 0:
        z = G - jnp.mean(G, axis=0)
        m2 = jnp.sum(z * z, axis=0) / (n_spots - 1)
        if hasattr(W, "row_sums"):
            r, c = W.row_sums(), W.col_sums()
        else:
            r, c = jnp.sum(W, axis=1), jnp.sum(W, axis=0)
        GG = G * G
        hi = jax.lax.Precision.HIGHEST  # full-f32 dots on TPU
        pair_sum = (
            jnp.einsum("s,sg->g", r, GG, precision=hi)
            + jnp.einsum("s,sg->g", c, GG, precision=hi)
            - 2.0 * jnp.sum(G * WG, axis=0)
        )
        geary = _safe_div(pair_sum, 2.0 * m2)

    return getis_ord, moran, geary


def compute_loss(M, data: MapperData, lw: LossWeights, impl: str = "auto"):
    """Loss for the unconstrained mapper (reference ``_loss_fn``,
    ``mapping_optimizer.py:189-309``).

    Returns ``(total_loss, terms)`` where ``terms`` reproduces the reference's
    reported per-term values (NaNs included for disabled terms).
    """
    A, w = unconstrained_inputs(M, data, lw)
    Y, q, h = mapper_core(M, A, w, impl=impl)
    l1_sum = jnp.sum(jnp.abs(M)) if lw.lambda_l1 != 0 else None
    l2_sum = jnp.sum(M * M) if lw.lambda_l2 != 0 else None
    return unconstrained_epilogue(Y, q, h, l1_sum, l2_sum, data, lw)


def unconstrained_inputs(M, data: MapperData, lw: LossWeights):
    """(A, w) fed to mapper_core for the unconstrained loss: A is S with the
    ct one-hot appended when islands are active; w is the marginal weight
    (uniform for cells mode, cluster density for clusters mode)."""
    S, mask = data.S, data.gene_mask
    if mask is not None:
        S = S * mask[None, :]
    need_ct = lw.lambda_ct_islands > 0 and data.ct_encode is not None
    A = jnp.concatenate([S, data.ct_encode], axis=1) if need_ct else S
    if data.d_source is not None:
        w = data.d_source
    else:
        n_cells = M.shape[0]
        # f32 regardless of the parameter storage dtype: the marginal weight
        # feeds f32 accumulations (and bf16 stat blocks trip Mosaic layouts)
        w = jnp.full((n_cells,), 1.0 / n_cells, dtype=jnp.float32)
    return A, w


def unconstrained_epilogue(Y, q, h, l1_sum, l2_sum, data: MapperData, lw: LossWeights):
    """Everything downstream of the fused core: expression similarities,
    density KL, entropy, spatial regularizers — all functions of the small
    (spots × k) projection, so the fused-Adam path can differentiate this
    epilogue alone and hand the (dY, dq, dh) cotangents to the streamed
    backward kernel. ``l1_sum``/``l2_sum`` are the raw-logit norms (their
    gradients are handled elsewhere; values only feed the reported terms).
    """
    S, G, mask = data.S, data.G, data.gene_mask
    if mask is not None:
        # Zero out non-fold gene columns so every reduction (including the
        # per-voxel vg term and density-independent norms) sees exactly the
        # fold's training genes — this makes one padded jit shape serve all
        # cross-validation folds (SURVEY §7 "dynamic shapes").
        S = S * mask[None, :]
        G = G * mask[None, :]

    need_ct = lw.lambda_ct_islands > 0 and data.ct_encode is not None
    G_pred = Y[:, : S.shape[1]]
    ct_map = Y[:, S.shape[1]:] if need_ct else None

    terms = {}

    # gene-voxel & voxel-gene expression similarity (:205-206)
    gv_sim = _masked_mean(cosine_similarity(G_pred, G, axis=0), mask)
    vg_sim = jnp.mean(cosine_similarity(G_pred, G, axis=1))
    gv_term = lw.lambda_g1 * gv_sim
    vg_term = lw.lambda_g2 * vg_sim
    expression_term = gv_term + vg_term
    terms["main_loss"] = gv_term / lw.lambda_g1
    terms["vg_reg"] = vg_term / lw.lambda_g2 if lw.lambda_g2 != 0 else jnp.float32(jnp.nan)

    # density KL (:212-221)
    if data.d is not None:
        d_pred = jnp.log(q)
        density_term = lw.lambda_d * kl_div_sum(d_pred, data.d)
        terms["kl_reg"] = density_term / lw.lambda_d if lw.lambda_d != 0 else jnp.float32(jnp.nan)
    else:
        density_term = 0.0
        terms["kl_reg"] = jnp.float32(jnp.nan)

    # entropy (:224) — positive entropy ADDED to the loss => peaked maps
    entropy_term = lw.lambda_r * -jnp.sum(h)
    terms["entropy_reg"] = (
        entropy_term / lw.lambda_r if lw.lambda_r != 0 else jnp.float32(jnp.nan)
    )

    # l1/l2 on raw logits (:228-231)
    l1_term = lw.lambda_l1 * l1_sum if lw.lambda_l1 != 0 else 0.0
    l2_term = lw.lambda_l2 * l2_sum if lw.lambda_l2 != 0 else 0.0
    terms["l1_reg"] = l1_term / lw.lambda_l1 if lw.lambda_l1 != 0 else jnp.float32(jnp.nan)
    terms["l2_reg"] = l2_term / lw.lambda_l2 if lw.lambda_l2 != 0 else jnp.float32(jnp.nan)

    # spatial neighborhood expression similarity (:234-239)
    if lw.lambda_neighborhood_g1 > 0:
        WGp = graph_matmul(data.voxel_weights, G_pred)
        WG = graph_matmul(data.voxel_weights, G)
        nb_sim = _masked_mean(cosine_similarity(WGp, WG, axis=0), mask)
        gv_neighborhood_term = lw.lambda_neighborhood_g1 * nb_sim
        terms["gv_neighborhood_sim"] = nb_sim
    else:
        gv_neighborhood_term = 0.0
        terms["gv_neighborhood_sim"] = jnp.float32(jnp.nan)

    # cell-type islands (:242-248)
    if need_ct:
        nb_ct = graph_matmul(data.neighborhood_filter, ct_map)
        penalty = jnp.mean(jnp.maximum(ct_map - nb_ct, 0.0))
        ct_island_term = lw.lambda_ct_islands * penalty
        terms["ct_island_penalty"] = penalty
    else:
        ct_island_term = 0.0
        terms["ct_island_penalty"] = jnp.float32(jnp.nan)

    # spatial autocorrelation preservation (:251-263)
    getis_pred, moran_pred, geary_pred = spatial_local_indicators(
        G_pred, data.spatial_weights, lw
    )
    getis_term = moran_term = geary_term = 0.0
    terms["getis_ord_sim"] = jnp.float32(jnp.nan)
    terms["moran_sim"] = jnp.float32(jnp.nan)
    terms["geary_sim"] = jnp.float32(jnp.nan)
    if lw.lambda_getis_ord > 0:
        sim = _masked_mean(cosine_similarity(data.getis_ord_ref, getis_pred, axis=0), mask)
        getis_term = lw.lambda_getis_ord * sim
        terms["getis_ord_sim"] = sim
    if lw.lambda_moran > 0:
        sim = _masked_mean(cosine_similarity(data.moran_ref, moran_pred, axis=0), mask)
        moran_term = lw.lambda_moran * sim
        terms["moran_sim"] = sim
    if lw.lambda_geary > 0:
        # per-gene scalars: reference takes cosine over the spot axis of an
        # (s-independent) vector — Geary's C is one value per gene, so the
        # cosine reduces to similarity of two gene-vectors (dim=0 over a
        # 1-D tensor in the reference == full-vector cosine).
        ref = data.geary_ref if mask is None else data.geary_ref * mask
        pred = geary_pred if mask is None else geary_pred * mask
        sim = cosine_similarity(ref, pred, axis=0)
        geary_term = lw.lambda_geary * sim
        terms["geary_sim"] = sim

    total = (
        -expression_term
        + density_term
        + entropy_term
        + l1_term
        + l2_term
        + ct_island_term
        - gv_neighborhood_term
        - getis_term
        - moran_term
        - geary_term
    )
    terms["total_loss"] = total
    return total, terms


def compute_constrained_loss(params, data: MapperData, lw: LossWeights, impl: str = "auto"):
    """Loss for the constrained mapper (reference ``MapperConstrained._loss_fn``,
    ``mapping_optimizer.py:495-587``)."""
    M, F = params
    F_probs = jax.nn.sigmoid(F)
    S = data.S
    if data.gene_mask is not None:
        S = S * data.gene_mask[None, :]
    A = S * F_probs[:, None]
    Y, q, h = mapper_core(M, A, F_probs, impl=impl)
    return constrained_epilogue(Y, q, jnp.sum(h), F, data, lw)


def constrained_epilogue(Y, q, h_sum, F, data: MapperData, lw: LossWeights,
                         f_sums=None):
    """Constrained-loss tail, downstream of the fused core.

    Takes the projection ``Y = Pᵀ(S ⊙ σ(F))``, the filtered marginal
    ``q = σ(F) P``, the total negative map entropy ``h_sum = Σ P log P`` and
    the raw filter logits ``F`` as *independent* inputs — so the fused-Adam
    path can ``jax.vjp`` this epilogue alone and recover (dY, dq, dh, and the
    direct part of dF); F's indirect gradient through A and q is reconstructed
    from the streamed rbar pass (see ``ops/fused_step.py``).

    Under ``shard_map`` the sharded steps pass ``f_sums = (Σ σ(F),
    Σ σ(F)−σ(F)²)`` — the two F reductions, psummed OUTSIDE this function —
    and ``F=None``; differentiating through this epilogue then never crosses
    a collective (the shard_map psum transpose under ``check_vma=False`` is
    not the true adjoint, which silently corrupts dF — caught by
    scripts/fuzz_paths.py), and the caller rebuilds the direct F gradient
    from the returned ``(ds1, ds2)`` scalar cotangents by the chain rule.
    """
    G, mask = data.G, data.gene_mask
    if mask is not None:
        G = G * mask[None, :]
    G_pred = Y

    if f_sums is not None:
        sum_F_probs, sum_f_reg = f_sums
    else:
        F_probs = jax.nn.sigmoid(F)
        sum_F_probs = jnp.sum(F_probs)
        sum_f_reg = jnp.sum(F_probs - F_probs * F_probs)

    terms = {}

    gv_sim = _masked_mean(cosine_similarity(G_pred, G, axis=0), mask)
    vg_sim = jnp.mean(cosine_similarity(G_pred, G, axis=1))
    gv_term = lw.lambda_g1 * gv_sim
    vg_term = lw.lambda_g2 * vg_sim
    expression_term = gv_term + vg_term
    terms["main_loss"] = gv_term / lw.lambda_g1
    terms["vg_reg"] = vg_term / lw.lambda_g2 if lw.lambda_g2 != 0 else jnp.float32(jnp.nan)

    if data.d is not None:
        # filtered marginal: (P ⊙ F).sum(cells) == F @ P == q  (:512-514)
        d_pred = jnp.log(q / sum_F_probs)
        density_term = lw.lambda_d * kl_div_sum(d_pred, data.d)
        terms["kl_reg"] = density_term / lw.lambda_d if lw.lambda_d != 0 else jnp.float32(jnp.nan)
    else:
        density_term = None
        terms["kl_reg"] = jnp.float32(jnp.nan)

    # NOTE sign quirk (:526): the constrained mapper reports sum(P log P)
    # (negative entropy) where the plain mapper reports -sum(P log P); the
    # effective total-loss contribution (+lambda_r * entropy) is identical.
    entropy_term = lw.lambda_r * h_sum
    terms["entropy_reg"] = (
        entropy_term / lw.lambda_r if lw.lambda_r != 0 else jnp.float32(jnp.nan)
    )

    count_term = lw.lambda_count * jnp.abs(sum_F_probs - data.target_count)
    terms["count_reg"] = (
        count_term / lw.lambda_count if lw.lambda_count != 0 else jnp.float32(jnp.nan)
    )

    f_reg = lw.lambda_f_reg * sum_f_reg
    terms["lambda_f_reg"] = (
        f_reg / lw.lambda_f_reg if lw.lambda_f_reg != 0 else jnp.float32(jnp.nan)
    )

    total = -expression_term - entropy_term + count_term + f_reg
    if density_term is not None:
        total = total + density_term
    terms["total_loss"] = total
    return total, terms


VAL_METRIC_KEYS = (
    "val_total_loss",
    "val_gene_sim",
    "val_sp_sparsity_weighted_sim",
    "val_entropy",
)


def val_metrics_from_projection(Y, G, h_mean, n_spots, gene_mask=None):
    """Validation metrics given the projection ``Y = Pᵀ S_val``, the measured
    val expression ``G``, and the mean per-cell softmax entropy ``h_mean`` —
    the pieces the sharded forward produces without materializing P."""
    G_pred = Y
    cos_g = cosine_similarity(G_pred, G, axis=0)
    gv_sim = _masked_mean(cos_g, gene_mask)
    vg_sim = jnp.mean(cosine_similarity(G_pred, G, axis=1))
    expression_sim = gv_sim + vg_sim

    n_spots_obs = G.shape[0]
    gene_density = jnp.sum(G != 0, axis=0) / n_spots_obs  # 1 - sparsity
    if gene_mask is not None:
        gene_density = gene_density * gene_mask
    sp_weighted = jnp.sum(cos_g * gene_density) / jnp.sum(gene_density)

    entropy = -h_mean / jnp.log(n_spots)

    return {
        "val_total_loss": expression_sim,
        "val_gene_sim": gv_sim,
        "val_sp_sparsity_weighted_sim": sp_weighted,
        "val_entropy": entropy,
    }


def val_metrics(M, S, G, gene_mask=None, impl: str = "auto"):
    """Validation metrics (reference ``_val_loss_fn``,
    ``mapping_optimizer.py:311-356``): expression similarity, gene-voxel
    similarity, sparsity-weighted similarity, normalized mapping entropy."""
    if gene_mask is not None:
        S = S * gene_mask[None, :]
        G = G * gene_mask[None, :]
    n_cells = M.shape[0]
    # w stays f32 regardless of M's storage dtype: the Pallas stat blocks
    # reject bf16 vector operands (same constraint as unconstrained_inputs)
    w = jnp.full((n_cells,), 1.0 / n_cells, dtype=jnp.float32)
    Y, _, h = mapper_core(M, S, w, impl=impl)
    return val_metrics_from_projection(
        Y, G, jnp.mean(h), M.shape[1], gene_mask=gene_mask
    )
