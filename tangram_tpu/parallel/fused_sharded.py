"""Multi-chip training through the fused Pallas kernels.

GSPMD cannot partition a ``pallas_call``, so the generic sharded path
(`mesh.py`) runs the XLA implementation. This module is the TPU-native
alternative: ``shard_map`` with the fused kernels running shard-locally and a
handful of small collectives per step.

Two mesh layouts:

* **1-D ("cell",)** — every device holds full rows of M, so the softmax is
  local; two psums per step move the (spots × genes) projection ``Y`` and the
  spot marginal ``q`` over ICI. All loss terms are supported (spatial
  regularizers, clusters mode, constrained mode); only the L1/L2 logit
  penalties are excluded (their norms would need an extra collective).
* **2-D ("cell", "spot")** — M is block-sharded over both axes, for problems
  whose *rows* no longer fit a chip. The per-cell softmax stats (max /
  sum-exp / Σe·M) are merged across spot shards with one pmax + two psums of
  (cells/n, 1) vectors; ``Y``/``q`` psum over the cell axis; the per-gene
  cosine reductions psum over the spot axis; the rbar reduction of the
  softmax VJP psums over the spot axis. Supported terms: the core loss
  (λ_g1/λ_g2 expression, density KL, entropy) — the north-star configuration.

Cell and spot counts need not divide the mesh: inputs are zero-padded (M spot
padding uses −1e30 logits so padded spots carry exactly zero probability) and
every reduction is masked to the real extent, so sharded == unsharded to
numerical precision.

Per-step ICI traffic is O(spots × genes / shards) — thousands of times
smaller than M. At the 100k cells × 50k spots north star on a v5e-8 (1-D):
each device holds a 12.5k × 50k shard of M (2.5 GB) plus moments; the psums
move ~50 MB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.losses import (
    LossWeights,
    MapperData,
    constrained_epilogue,
    kl_div_sum,
    unconstrained_epilogue,
)

__all__ = ["fit_mapping_fused_sharded"]

COSINE_EPS = 1e-8
F_PAD_LOGIT = -40.0  # sigmoid(-40) ~ 4e-18: padded filter cells stay off
M_PAD_LOGIT = -1e30  # padded spot columns get exactly zero softmax mass


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    try:
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_rep=False)


def _pad_axis(x, axis, target, value=0.0):
    if x is None or x.shape[axis] == target:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, widths, constant_values=value)


def _cell_validity(c_local: int, c_real: int, axis: str):
    """(c_local,) 1/0 mask of rows that are real cells on this shard."""
    start = jax.lax.axis_index(axis) * c_local
    return ((start + jnp.arange(c_local)) < c_real).astype(jnp.float32)


def _adam_scalars(count_new, learning_rate):
    from ..ops.fused_step import BETA1, BETA2

    t = count_new.astype(jnp.float32)
    return jnp.stack(
        [jnp.asarray(learning_rate, jnp.float32),
         1.0 - BETA1 ** t, 1.0 - BETA2 ** t, jnp.float32(0)]
    ).reshape(1, 4)


# ---------------------------------------------------------------------------
# 1-D ("cell",) steps — softmax local, Y/q psum over cells
# ---------------------------------------------------------------------------


def _cell_step_unconstrained(M, count, mu, nu, stats, S_local, ct_local,
                             w_local, cvalid, data, lw, learning_rate,
                             compute_dtype, axis):
    from ..ops.fused_step import _dm_adam, _pad_k, _project, _rbar

    mask = data.gene_mask
    S_eff = S_local if mask is None else S_local * mask[None, :]
    A = S_eff if ct_local is None else jnp.concatenate([S_eff, ct_local], axis=1)
    k_real = A.shape[1]
    A_p = _pad_k(A).astype(compute_dtype)

    m, l, u = stats
    Y_partial, q_partial = _project(M, A_p, w_local, m, l)
    Y = jax.lax.psum(Y_partial, axis)
    q = jax.lax.psum(q_partial, axis)
    h_local = ((u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])) * cvalid
    h_sum = jax.lax.psum(jnp.sum(h_local), axis)

    def epilogue(Y, q, h1):
        # the epilogue consumes h only through sum(h); feed it the global sum
        return unconstrained_epilogue(Y, q, h1, None, None, data, lw)

    total, vjp, terms = jax.vjp(
        epilogue, Y[:, :k_real], q, h_sum.reshape(1), has_aux=True
    )
    dY, dq, dh1 = vjp(jnp.ones_like(total))
    dY_p = _pad_k(dY).astype(compute_dtype)
    dh_local = dh1[0] * cvalid

    r = _rbar(M, A_p, w_local, m, l, dY_p, dq, dh_local)

    count_new = count + 1
    M_new, mu_new, nu_new, m2, l2, u2 = _dm_adam(
        M, A_p, w_local, m, l, dY_p, dq, dh_local, r, mu, nu,
        _adam_scalars(count_new, learning_rate), 0.0, 0.0, with_norms=False,
    )
    return (M_new, count_new, mu_new, nu_new, (m2, l2, u2)), terms


def _cell_step_constrained(M, F, count, mu, nu, muF, nuF, stats, S_local,
                           cvalid, data, lw, learning_rate, compute_dtype,
                           axis):
    from ..ops.fused_step import _adam_vector, _dm_adam, _pad_k, _project, _rbar

    w = jax.nn.sigmoid(F) * cvalid
    mask = data.gene_mask
    S_eff = S_local if mask is None else S_local * mask[None, :]
    A = S_eff * w[:, None]
    k_real = A.shape[1]
    A_p = _pad_k(A).astype(compute_dtype)

    m, l, u = stats
    Y_partial, q_partial = _project(M, A_p, w, m, l)
    Y = jax.lax.psum(Y_partial, axis)
    q = jax.lax.psum(q_partial, axis)
    h = (u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])
    h_sum = jax.lax.psum(jnp.sum(h * cvalid), axis)

    def epilogue(Y, qq, hs, FF):
        return constrained_epilogue(Y, qq, hs, FF, data, lw, axis=axis)

    total, vjp, terms = jax.vjp(
        epilogue, Y[:, :k_real], q, h_sum, F, has_aux=True
    )
    dY, dq, dhs, dF_direct = vjp(jnp.ones_like(total))
    dY_p = _pad_k(dY).astype(compute_dtype)
    dh_local = jnp.broadcast_to(dhs, (M.shape[0],)) * cvalid

    r = _rbar(M, A_p, w, m, l, dY_p, dq, dh_local)
    gF = (dF_direct + (1.0 - w) * (r[:, 0] - dh_local * (h + 1.0))) * cvalid

    count_new = count + 1
    from ..ops.fused_step import BETA1, BETA2

    t = count_new.astype(jnp.float32)
    bc1, bc2 = 1.0 - BETA1 ** t, 1.0 - BETA2 ** t
    M_new, mu_new, nu_new, m2, l2, u2 = _dm_adam(
        M, A_p, w, m, l, dY_p, dq, dh_local, r, mu, nu,
        _adam_scalars(count_new, learning_rate), 0.0, 0.0, with_norms=False,
    )
    F_new, muF_new, nuF_new = _adam_vector(
        F, gF, muF, nuF, jnp.asarray(learning_rate, jnp.float32), bc1, bc2
    )
    return (
        (M_new, F_new, count_new, mu_new, nu_new, muF_new, nuF_new,
         (m2, l2, u2)),
        terms,
    )


# ---------------------------------------------------------------------------
# 2-D ("cell", "spot") step — block-sharded M, stats merged across spot shards
# ---------------------------------------------------------------------------


def _merge_rowstats(m_l, l_l, u_l, axis):
    """Combine per-shard online softmax stats into global per-cell stats:
    the same log-sum-exp merge the kernels use across tiles, as mesh
    collectives over the spot axis."""
    m_g = jax.lax.pmax(m_l, axis)
    scale = jnp.exp(m_l - m_g)
    l_g = jax.lax.psum(l_l * scale, axis)
    u_g = jax.lax.psum(u_l * scale, axis)
    return m_g, l_g, u_g


def _core_epilogue_2d(Y, q, h_sum, G_local, d_local, gene_mask, svalid,
                      lw: LossWeights, n_spots_real: int, spot_axis: str):
    """Core loss terms (λ_g1/λ_g2 expression, density KL, entropy) with
    spot-axis reductions as psums — numerically identical to
    ``unconstrained_epilogue`` on the unsharded problem."""
    G = G_local if gene_mask is None else G_local * gene_mask[None, :]
    Gp = Y * svalid[:, None]

    def spot_sum(x):
        return jax.lax.psum(jnp.sum(x, axis=0), spot_axis)

    terms = {}

    dots = spot_sum(Gp * G)
    n_pred = jnp.sqrt(jnp.maximum(spot_sum(Gp * Gp), COSINE_EPS**2))
    n_meas = jnp.sqrt(jnp.maximum(spot_sum(G * G), COSINE_EPS**2))
    cos_g = dots / (n_pred * n_meas)
    if gene_mask is None:
        gv_sim = jnp.mean(cos_g)
    else:
        gv_sim = jnp.sum(cos_g * gene_mask) / jnp.sum(gene_mask)
    gv_term = lw.lambda_g1 * gv_sim
    terms["main_loss"] = gv_term / lw.lambda_g1

    if lw.lambda_g2 != 0:
        dots_v = jnp.sum(Gp * G, axis=1)
        nv_pred = jnp.sqrt(jnp.maximum(jnp.sum(Gp * Gp, axis=1), COSINE_EPS**2))
        nv_meas = jnp.sqrt(jnp.maximum(jnp.sum(G * G, axis=1), COSINE_EPS**2))
        cos_v = (dots_v / (nv_pred * nv_meas)) * svalid
        vg_sim = jax.lax.psum(jnp.sum(cos_v), spot_axis) / n_spots_real
        vg_term = lw.lambda_g2 * vg_sim
        terms["vg_reg"] = vg_sim
    else:
        vg_term = 0.0
        terms["vg_reg"] = jnp.float32(jnp.nan)

    if d_local is not None:
        d_pred = jnp.log(jnp.where(svalid > 0, q, 1.0))
        pos = d_local > 0
        xlogx = jnp.where(pos, d_local * jnp.log(jnp.where(pos, d_local, 1.0)), 0.0)
        cross = jnp.where(pos, d_local * d_pred, 0.0)
        density_term = lw.lambda_d * jax.lax.psum(jnp.sum(xlogx - cross), spot_axis)
        terms["kl_reg"] = (
            density_term / lw.lambda_d if lw.lambda_d != 0 else jnp.float32(jnp.nan)
        )
    else:
        density_term = 0.0
        terms["kl_reg"] = jnp.float32(jnp.nan)

    entropy_term = lw.lambda_r * -h_sum
    terms["entropy_reg"] = (
        entropy_term / lw.lambda_r if lw.lambda_r != 0 else jnp.float32(jnp.nan)
    )

    total = -(gv_term + vg_term) + density_term + entropy_term
    terms["total_loss"] = total
    return total, terms


def _grid_step_unconstrained(M, count, mu, nu, stats_l, S_local, w_local,
                             G_local, d_local, gene_mask, cvalid, svalid,
                             lw, learning_rate, compute_dtype, n_spots_real):
    from ..ops.fused_step import _dm_adam, _pad_k, _project, _rbar

    S_eff = S_local if gene_mask is None else S_local * gene_mask[None, :]
    k_real = S_eff.shape[1]
    A_p = _pad_k(S_eff).astype(compute_dtype)

    m, l, u = _merge_rowstats(*stats_l, "spot")
    Y_partial, q_partial = _project(M, A_p, w_local, m, l)
    Y = jax.lax.psum(Y_partial, "cell")
    q = jax.lax.psum(q_partial, "cell")
    h_local = ((u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])) * cvalid
    h_sum = jax.lax.psum(jnp.sum(h_local), "cell")

    def epilogue(Y, q, hs):
        return _core_epilogue_2d(
            Y, q, hs, G_local, d_local, gene_mask, svalid, lw,
            n_spots_real, "spot",
        )

    total, vjp, terms = jax.vjp(epilogue, Y[:, :k_real], q, h_sum, has_aux=True)
    dY, dq, dhs = vjp(jnp.ones_like(total))
    dY_p = _pad_k(dY).astype(compute_dtype)
    dh_local = jnp.broadcast_to(dhs, (M.shape[0],)) * cvalid

    r_l = _rbar(M, A_p, w_local, m, l, dY_p, dq, dh_local)
    r = jax.lax.psum(r_l, "spot")

    count_new = count + 1
    M_new, mu_new, nu_new, m2, l2, u2 = _dm_adam(
        M, A_p, w_local, m, l, dY_p, dq, dh_local, r, mu, nu,
        _adam_scalars(count_new, learning_rate), 0.0, 0.0, with_norms=False,
    )
    return (M_new, count_new, mu_new, nu_new, (m2, l2, u2)), terms


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------


def fit_mapping_fused_sharded(
    params,
    data: MapperData,
    lw: LossWeights,
    num_epochs: int,
    learning_rate: float,
    mesh: Mesh = None,
    moment_dtype=jnp.float32,
    compute_dtype=jnp.float32,
):
    """Train over a device mesh with the fused kernels.

    ``params`` is M (cells/clusters modes) or ``(M, F)`` (constrained).
    Returns ``(params_final, history)`` with the parameters sharded over the
    mesh. See the module docstring for supported configurations per mesh
    layout; L1/L2 logit penalties always need the GSPMD path.
    """
    if lw.lambda_l1 != 0 or lw.lambda_l2 != 0:
        raise NotImplementedError(
            "fused sharded path does not support lambda_l1/lambda_l2; "
            "use parallel.fit_mapping_sharded (GSPMD) instead."
        )
    constrained = isinstance(params, tuple)

    if mesh is None:
        devices = np.asarray(jax.devices())
        mesh = Mesh(devices.reshape(-1), axis_names=("cell",))

    if "spot" in mesh.axis_names and mesh.shape["spot"] > 1:
        if constrained:
            raise NotImplementedError(
                "constrained mode on a 2-D mesh is not supported; use a 1-D "
                "('cell',) mesh or the GSPMD path."
            )
        has_spatial = (
            lw.lambda_neighborhood_g1 != 0
            or lw.lambda_ct_islands != 0
            or lw.lambda_getis_ord != 0
            or lw.lambda_moran != 0
            or lw.lambda_geary != 0
        )
        if has_spatial:
            raise NotImplementedError(
                "spot-graph regularizers on a 2-D mesh are not supported by "
                "the fused path; use a 1-D ('cell',) mesh or GSPMD."
            )
        return _fit_2d(params, data, lw, num_epochs, learning_rate, mesh,
                       moment_dtype, compute_dtype)

    return _fit_1d(params, data, lw, num_epochs, learning_rate, mesh,
                   moment_dtype, compute_dtype, constrained)


def _fit_1d(params, data, lw, num_epochs, learning_rate, mesh, moment_dtype,
            compute_dtype, constrained):
    axis = "cell"
    n_shards = mesh.shape[axis]
    M0 = params[0] if constrained else params
    n_cells = M0.shape[0]
    c_pad = -(-n_cells // n_shards) * n_shards

    S = _pad_axis(data.S, 0, c_pad)
    ct = data.ct_encode if (lw.lambda_ct_islands > 0 and data.ct_encode is not None) else None
    ct = _pad_axis(ct, 0, c_pad)
    if data.d_source is not None:
        w_full = _pad_axis(data.d_source, 0, c_pad)
    else:
        w_full = _pad_axis(
            jnp.full((n_cells,), 1.0 / n_cells, dtype=M0.dtype), 0, c_pad
        )
    M0 = _pad_axis(M0, 0, c_pad)
    F0 = None
    if constrained:
        F0 = _pad_axis(params[1], 0, c_pad, value=F_PAD_LOGIT)

    # shard the cell-axis arrays; replicate the (small) spot/gene-axis rest
    repl = NamedSharding(mesh, P())
    cell_rows = NamedSharding(mesh, P("cell", None))
    M0 = jax.device_put(M0, cell_rows)
    S = jax.device_put(S, cell_rows)
    ct = None if ct is None else jax.device_put(ct, cell_rows)
    w_full = jax.device_put(w_full, NamedSharding(mesh, P("cell")))
    F0 = None if F0 is None else jax.device_put(F0, NamedSharding(mesh, P("cell")))
    # the step reads S/ct through the sharded args; blank them in `data`
    data_repl = jax.tree.map(
        lambda x: jax.device_put(x, repl),
        data._replace(S=jnp.zeros((1, S.shape[1]), S.dtype), ct_encode=None,
                      d_source=None),
    )
    data_specs = jax.tree.map(lambda _: P(), data_repl)

    extra_specs = []
    extra_args = []
    if ct is not None:
        extra_specs.append(P("cell", None))
        extra_args.append(ct)
    if constrained:
        extra_specs.append(P("cell"))
        extra_args.append(F0)

    def run(M_local, S_local, w_local, data_local, *extras):
        from ..ops.pallas_core import _rowstats

        extras = list(extras)
        ct_l = extras.pop(0) if ct is not None else None
        F_l = extras.pop(0) if constrained else None
        data_local = data_local._replace(S=S_local)
        cvalid = _cell_validity(M_local.shape[0], n_cells, axis)
        count = jnp.zeros((), jnp.int32)
        mu = jnp.zeros(M_local.shape, moment_dtype)
        nu = jnp.zeros(M_local.shape, moment_dtype)
        stats = tuple(_rowstats(M_local))

        if constrained:
            muF = jnp.zeros(F_l.shape, jnp.float32)
            nuF = jnp.zeros(F_l.shape, jnp.float32)

            def step(carry, _):
                M, F, count, mu, nu, muF, nuF, stats = carry
                new_carry, terms = _cell_step_constrained(
                    M, F, count, mu, nu, muF, nuF, stats, S_local, cvalid,
                    data_local, lw, learning_rate, compute_dtype, axis,
                )
                return new_carry, terms

            (M_f, F_f, *_), history = jax.lax.scan(
                step, (M_local, F_l, count, mu, nu, muF, nuF, stats),
                None, length=num_epochs,
            )
            return M_f, F_f, history

        def step(carry, _):
            M, count, mu, nu, stats = carry
            new_carry, terms = _cell_step_unconstrained(
                M, count, mu, nu, stats, S_local, ct_l, w_local, cvalid,
                data_local, lw, learning_rate, compute_dtype, axis,
            )
            return new_carry, terms

        (M_f, *_), history = jax.lax.scan(
            step, (M_local, count, mu, nu, stats), None, length=num_epochs
        )
        return M_f, history

    out_specs = (
        (P("cell", None), P("cell"), P()) if constrained
        else (P("cell", None), P())
    )
    sharded = _shard_map(
        run,
        mesh,
        in_specs=(P("cell", None), P("cell", None), P("cell"), data_specs)
        + tuple(extra_specs),
        out_specs=out_specs,
    )
    out = jax.jit(sharded)(M0, S, w_full, data_repl, *extra_args)
    if constrained:
        M_f, F_f, history = out
        return (M_f[:n_cells], F_f[:n_cells]), history
    M_f, history = out
    return M_f[:n_cells], history


def _fit_2d(M0, data, lw, num_epochs, learning_rate, mesh, moment_dtype,
            compute_dtype):
    cshards, sshards = mesh.shape["cell"], mesh.shape["spot"]
    n_cells, n_spots = M0.shape
    c_pad = -(-n_cells // cshards) * cshards
    s_pad = -(-n_spots // sshards) * sshards

    M0 = _pad_axis(_pad_axis(M0, 0, c_pad), 1, s_pad, value=M_PAD_LOGIT)
    S = _pad_axis(data.S, 0, c_pad)
    G = _pad_axis(data.G, 0, s_pad)
    d = _pad_axis(data.d, 0, s_pad)
    if data.d_source is not None:
        w_full = _pad_axis(data.d_source, 0, c_pad)
    else:
        w_full = _pad_axis(
            jnp.full((n_cells,), 1.0 / n_cells, dtype=M0.dtype), 0, c_pad
        )
    gene_mask = data.gene_mask

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    M0 = jax.device_put(M0, ns("cell", "spot"))
    S = jax.device_put(S, ns("cell", None))
    G = jax.device_put(G, ns("spot", None))
    d = None if d is None else jax.device_put(d, ns("spot"))
    w_full = jax.device_put(w_full, ns("cell"))
    gene_mask = None if gene_mask is None else jax.device_put(gene_mask, ns(None))

    d_specs = () if d is None else (P("spot"),)
    d_args = () if d is None else (d,)
    gm_specs = () if gene_mask is None else (P(None),)
    gm_args = () if gene_mask is None else (gene_mask,)

    def run(M_local, S_local, w_local, G_local, *rest):
        from ..ops.pallas_core import _rowstats

        rest = list(rest)
        d_l = rest.pop(0) if d is not None else None
        gm = rest.pop(0) if gene_mask is not None else None
        cvalid = _cell_validity(M_local.shape[0], n_cells, "cell")
        svalid = _cell_validity(M_local.shape[1], n_spots, "spot")
        count = jnp.zeros((), jnp.int32)
        mu = jnp.zeros(M_local.shape, moment_dtype)
        nu = jnp.zeros(M_local.shape, moment_dtype)
        stats_l = tuple(_rowstats(M_local))

        def step(carry, _):
            M, count, mu, nu, stats_l = carry
            new_carry, terms = _grid_step_unconstrained(
                M, count, mu, nu, stats_l, S_local, w_local, G_local, d_l,
                gm, cvalid, svalid, lw, learning_rate, compute_dtype,
                n_spots,
            )
            return new_carry, terms

        (M_f, *_), history = jax.lax.scan(
            step, (M_local, count, mu, nu, stats_l), None, length=num_epochs
        )
        return M_f, history

    sharded = _shard_map(
        run,
        mesh,
        in_specs=(P("cell", "spot"), P("cell", None), P("cell"),
                  P("spot", None)) + d_specs + gm_specs,
        out_specs=(P("cell", "spot"), P()),
    )
    M_f, history = jax.jit(sharded)(M0, S, w_full, G, *d_args, *gm_args)
    return M_f[:n_cells, :n_spots], history
