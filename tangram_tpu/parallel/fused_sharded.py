"""Multi-chip training through the fused Pallas kernels.

GSPMD cannot partition a ``pallas_call``, so the generic sharded path
(`mesh.py`) runs the XLA implementation. This module is the TPU-native
alternative: ``shard_map`` with the fused kernels running shard-locally and a
handful of small collectives per step.

Two mesh layouts:

* **1-D ("cell",)** — every device holds full rows of M, so the softmax is
  local; two psums per step move the (spots × genes) projection ``Y`` and the
  spot marginal ``q`` over ICI. Every loss configuration is supported:
  spatial regularizers, clusters mode, constrained ``(M, F)``, and L1/L2
  logit penalties (norm sums psum'd from the kernel-carried rowstats).
* **("slice", "cell")** — multi-slice pods: cells shard over slices ×
  chips-per-slice; identical kernels, with every psum running over the
  product axis so XLA lowers it to an in-slice ICI reduce plus a cross-slice
  DCN reduce. Wire cost per step and slice: the same (spots × genes)
  buffers, at DCN rather than ICI rates (see bench.py's north-star comm
  model).
* **2-D ("cell", "spot")** — M is block-sharded over both axes, for problems
  whose *rows* no longer fit a chip. The per-cell softmax stats (max /
  sum-exp / Σe·M) are merged across spot shards with one pmax + two psums of
  (cells/n, 1) vectors; ``Y``/``q`` psum over the cell axis and all-gather
  over the spot axis (outside the epilogue vjp, cotangents sliced back per
  shard), so the unchanged single-device epilogue — spatial regularizers,
  ct islands, constrained terms — runs replicated; the rbar reduction of
  the softmax VJP psums over the spot axis. L1/L2 logit penalties ride the
  kernel-carried norm rowstats (one scalar psum each over the whole mesh);
  the kernels' PAD_GUARD keeps the −1e30 spot-pad sentinels out of the norm
  sums and their gradients.
* **("slice", "cell", "spot")** — the 2-D layout across a multi-slice pod,
  for jobs whose cell-rows outgrow a chip AND span slices: cells shard over
  the ("slice", "cell") product axis, spots within slices. Identical step;
  the cell-axis psums run over the product axis so XLA lowers each to an
  in-slice ICI reduce plus a cross-slice DCN reduce (per-chip DCN traffic:
  the in-slice-scattered 1/chips_per_slice share of the (spots × genes)
  buffer — see bench.py's hierarchical decomposition).

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
    VAL_METRIC_KEYS,
    LossWeights,
    MapperData,
    constrained_epilogue,
    unconstrained_epilogue,
    val_metrics_from_projection,
)

__all__ = ["fit_mapping_fused_sharded"]

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


def _cell_validity(c_local: int, c_real: int, axis):
    """(c_local,) 1/0 mask of rows that are real cells on this shard.

    ``axis`` may be a tuple of mesh axes (multi-slice cell sharding):
    ``jax.lax.axis_index`` then returns the linearized index over the
    product axis."""
    start = jax.lax.axis_index(axis) * c_local
    return ((start + jnp.arange(c_local)) < c_real).astype(jnp.float32)


def _adam_scalars(count_new, learning_rate):
    from ..ops.fused_step import BETA1, BETA2

    t = count_new.astype(jnp.float32)
    # slot 3 carries the step count: the stochastic-rounding seed
    return jnp.stack(
        [jnp.asarray(learning_rate, jnp.float32),
         1.0 - BETA1 ** t, 1.0 - BETA2 ** t, t]
    ).reshape(1, 4)


# ---------------------------------------------------------------------------
# 1-D ("cell",) steps — softmax local, Y/q psum over cells
# ---------------------------------------------------------------------------


def _cell_step_unconstrained(M, count, mu, nu, stats, S_local, ct_local,
                             w_local, cvalid, data, lw, learning_rate,
                             compute_dtype, axis, rounding="nearest"):
    from ..ops.fused_step import _dm_adam, _pad_k, _project, _rbar

    mask = data.gene_mask
    S_eff = S_local if mask is None else S_local * mask[None, :]
    A = S_eff if ct_local is None else jnp.concatenate([S_eff, ct_local], axis=1)
    k_real = A.shape[1]
    A_p = _pad_k(A).astype(compute_dtype)

    need_norms = lw.lambda_l1 != 0 or lw.lambda_l2 != 0
    if need_norms:
        # padded cell rows hold zero logits, so their |M| / M**2 sums vanish
        m, l, u, s1, s2 = stats
        l1_sum = jax.lax.psum(jnp.sum(s1), axis)
        l2_sum = jax.lax.psum(jnp.sum(s2), axis)
    else:
        m, l, u = stats
        l1_sum = l2_sum = None
    Y_partial, q_partial = _project(M, A_p, w_local, m, l)
    Y = jax.lax.psum(Y_partial, axis)
    q = jax.lax.psum(q_partial, axis)
    h_local = ((u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])) * cvalid
    h_sum = jax.lax.psum(jnp.sum(h_local), axis)

    def epilogue(Y, q, h1):
        # the epilogue consumes h only through sum(h); feed it the global sum
        return unconstrained_epilogue(Y, q, h1, l1_sum, l2_sum, data, lw)

    total, vjp, terms = jax.vjp(
        epilogue, Y[:, :k_real], q, h_sum.reshape(1), has_aux=True
    )
    dY, dq, dh1 = vjp(jnp.ones_like(total))
    dY_p = _pad_k(dY).astype(compute_dtype)
    dh_local = dh1[0] * cvalid

    with_dh = lw.lambda_r != 0  # static: λ_r = 0 ⇒ dh ≡ 0
    r = _rbar(M, A_p, w_local, m, l, dY_p, dq, dh_local, with_dh=with_dh)

    count_new = count + 1
    out = _dm_adam(
        M, A_p, w_local, m, l, dY_p, dq, dh_local, r, mu, nu,
        _adam_scalars(count_new, learning_rate), lw.lambda_l1, lw.lambda_l2,
        with_norms=need_norms, sr=rounding == "stochastic", with_dh=with_dh,
    )
    M_new, mu_new, nu_new = out[:3]
    return (M_new, count_new, mu_new, nu_new, tuple(out[3:])), terms


def _constrained_f_sums(w_raw, cvalid, axis):
    """Global ``(Σ σ(F), Σ σ(F)−σ(F)²)`` over real cells — psummed OUTSIDE
    the epilogue vjp (the shard_map psum transpose is not the true adjoint;
    differentiating through an in-vjp psum corrupts dF)."""
    s1 = jax.lax.psum(jnp.sum(w_raw * cvalid), axis)
    s2 = jax.lax.psum(jnp.sum((w_raw - w_raw * w_raw) * cvalid), axis)
    return s1, s2


def _constrained_dF_direct(w_raw, cvalid, ds1, ds2):
    """Chain rule back through the F reductions: d/dF of
    ``ds1·Σσ(F) + ds2·Σ(σ(F)−σ(F)²)`` per local entry."""
    sig_grad = w_raw * (1.0 - w_raw) * cvalid
    return ds1 * sig_grad + ds2 * (1.0 - 2.0 * w_raw) * sig_grad


def _cell_step_constrained(M, F, count, mu, nu, muF, nuF, stats, S_local,
                           cvalid, data, lw, learning_rate, compute_dtype,
                           axis, rounding="nearest"):
    from ..ops.fused_step import _adam_vector, _dm_adam, _pad_k, _project, _rbar

    w_raw = jax.nn.sigmoid(F)
    w = w_raw * cvalid
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
    s1, s2 = _constrained_f_sums(w_raw, cvalid, axis)

    def epilogue(Y, qq, hs, a, b):
        return constrained_epilogue(Y, qq, hs, None, data, lw, f_sums=(a, b))

    total, vjp, terms = jax.vjp(
        epilogue, Y[:, :k_real], q, h_sum, s1, s2, has_aux=True
    )
    dY, dq, dhs, ds1, ds2 = vjp(jnp.ones_like(total))
    dF_direct = _constrained_dF_direct(w_raw, cvalid, ds1, ds2)
    dY_p = _pad_k(dY).astype(compute_dtype)
    dh_local = jnp.broadcast_to(dhs, (M.shape[0],)) * cvalid

    with_dh = lw.lambda_r != 0  # static: λ_r = 0 ⇒ dh ≡ 0
    r = _rbar(M, A_p, w, m, l, dY_p, dq, dh_local, with_dh=with_dh)
    gF = (dF_direct + (1.0 - w) * (r[:, 0] - dh_local * (h + 1.0))) * cvalid

    count_new = count + 1
    from ..ops.fused_step import BETA1, BETA2

    t = count_new.astype(jnp.float32)
    bc1, bc2 = 1.0 - BETA1 ** t, 1.0 - BETA2 ** t
    M_new, mu_new, nu_new, m2, l2, u2 = _dm_adam(
        M, A_p, w, m, l, dY_p, dq, dh_local, r, mu, nu,
        _adam_scalars(count_new, learning_rate), 0.0, 0.0, with_norms=False,
        sr=rounding == "stochastic", with_dh=with_dh,
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


def _grid_step(M, F, count, mu, nu, muF, nuF, stats_l, S_local, ct_local,
               w_local, cvalid, data_repl, lw, learning_rate, compute_dtype,
               n_spots_real, constrained, rounding="nearest",
               cell_axes=("cell",)):
    """One fused Adam step on a (cell, spot) block shard.

    ``cell_axes`` is the tuple of mesh axes the cell dimension shards over —
    ("cell",) on a single slice, ("slice", "cell") on a multi-slice pod
    (cell-axis psums then cross DCN on their "slice" dimension).

    The softmax stats are merged across spot shards; the (spots × k)
    projection is psum'd over the cell axis, all-gathered over the spot axis
    and trimmed to the real spot count, so the FULL single-device epilogue —
    expression terms, density KL, entropy, spot-graph regularizers, ct
    islands, and the constrained filter terms — runs unchanged on every
    device. The gather happens OUTSIDE the epilogue vjp; the dY/dq
    cotangents are sliced back to the local shard for the streamed backward
    kernels.
    """
    from ..ops.fused_step import _adam_vector, _dm_adam, _pad_k, _project, _rbar

    mask = data_repl.gene_mask
    S_eff = S_local if mask is None else S_local * mask[None, :]
    if constrained:
        w_raw = jax.nn.sigmoid(F)
        w = w_raw * cvalid
        A = S_eff * w[:, None]
    else:
        w = w_local
        A = (
            S_eff if ct_local is None
            else jnp.concatenate([S_eff, ct_local], axis=1)
        )
    k_real = A.shape[1]
    A_p = _pad_k(A).astype(compute_dtype)

    need_norms = (not constrained) and (lw.lambda_l1 != 0 or lw.lambda_l2 != 0)
    if need_norms:
        # per-shard |M| / M² row sums (sentinel pad entries excluded by the
        # kernels' PAD_GUARD); one scalar psum each over the whole mesh
        m_l, l_l, u_l, s1_l, s2_l = stats_l
        l1_sum = jax.lax.psum(jnp.sum(s1_l), tuple(cell_axes) + ("spot",))
        l2_sum = jax.lax.psum(jnp.sum(s2_l), tuple(cell_axes) + ("spot",))
        m, l, u = _merge_rowstats(m_l, l_l, u_l, "spot")
    else:
        l1_sum = l2_sum = None
        m, l, u = _merge_rowstats(*stats_l, "spot")
    Y_partial, q_partial = _project(M, A_p, w, m, l)
    Y_shard = jax.lax.psum(Y_partial, cell_axes)
    q_shard = jax.lax.psum(q_partial, cell_axes)
    Y_full = jax.lax.all_gather(Y_shard, "spot", axis=0, tiled=True)[:n_spots_real]
    q_full = jax.lax.all_gather(q_shard, "spot", axis=0, tiled=True)[:n_spots_real]

    h = (u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])
    h_sum = jax.lax.psum(jnp.sum(h * cvalid), cell_axes)

    if constrained:
        s1, s2 = _constrained_f_sums(w_raw, cvalid, cell_axes)

        def epi(Yf, qf, hs, a, b):
            return constrained_epilogue(
                Yf[:, :k_real], qf, hs, None, data_repl, lw, f_sums=(a, b)
            )

        total, vjp, terms = jax.vjp(
            epi, Y_full, q_full, h_sum, s1, s2, has_aux=True
        )
        dY_full, dq_full, dhs, ds1, ds2 = vjp(jnp.ones_like(total))
        dF_direct = _constrained_dF_direct(w_raw, cvalid, ds1, ds2)
    else:
        def epi(Yf, qf, h1):
            return unconstrained_epilogue(
                Yf[:, :k_real], qf, h1, l1_sum, l2_sum, data_repl, lw
            )

        total, vjp, terms = jax.vjp(
            epi, Y_full, q_full, h_sum.reshape(1), has_aux=True
        )
        dY_full, dq_full, dh1 = vjp(jnp.ones_like(total))
        dhs = dh1[0]

    # pad the cotangents back out to the padded spot extent, slice our shard
    s_local = M.shape[1]
    j = jax.lax.axis_index("spot")
    n_spot_shards = jax.lax.psum(1, "spot")
    pad_rows = s_local * n_spot_shards - n_spots_real
    dY_l = jax.lax.dynamic_slice_in_dim(
        jnp.pad(dY_full, ((0, pad_rows), (0, 0))), j * s_local, s_local
    )
    dq_l = jax.lax.dynamic_slice_in_dim(
        jnp.pad(dq_full, (0, pad_rows)), j * s_local, s_local
    )
    dh_local = jnp.broadcast_to(dhs, (M.shape[0],)) * cvalid
    dY_p = _pad_k(dY_l).astype(compute_dtype)

    with_dh = lw.lambda_r != 0  # static: λ_r = 0 ⇒ dh ≡ 0
    r = jax.lax.psum(
        _rbar(M, A_p, w, m, l, dY_p, dq_l, dh_local, with_dh=with_dh), "spot"
    )

    count_new = count + 1
    out = _dm_adam(
        M, A_p, w, m, l, dY_p, dq_l, dh_local, r, mu, nu,
        _adam_scalars(count_new, learning_rate), lw.lambda_l1, lw.lambda_l2,
        with_norms=need_norms, sr=rounding == "stochastic", with_dh=with_dh,
    )
    M_new, mu_new, nu_new = out[:3]
    if not constrained:
        return (M_new, count_new, mu_new, nu_new, tuple(out[3:])), terms
    m2, l2, u2 = out[3:]

    from ..ops.fused_step import BETA1, BETA2

    gF = (dF_direct + (1.0 - w) * (r[:, 0] - dh_local * (h + 1.0))) * cvalid
    t = count_new.astype(jnp.float32)
    F_new, muF_new, nuF_new = _adam_vector(
        F, gF, muF, nuF, jnp.asarray(learning_rate, jnp.float32),
        1.0 - BETA1 ** t, 1.0 - BETA2 ** t,
    )
    return (
        (M_new, F_new, count_new, mu_new, nu_new, muF_new, nuF_new,
         (m2, l2, u2)),
        terms,
    )


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------


def fit_mapping_fused_sharded(
    params,
    data: MapperData,
    lw: LossWeights,
    num_epochs: int,
    learning_rate,
    mesh: Mesh = None,
    moment_dtype=jnp.float32,
    compute_dtype=jnp.float32,
    rounding: str = "nearest",
    opt_state=None,
    return_opt_state=False,
    val_data: MapperData = None,
    val_each=None,
    donate=False,
    step_offset: int = 0,
):
    """Train over a device mesh with the fused kernels.

    ``params`` is M (cells/clusters modes) or ``(M, F)`` (constrained).
    Returns ``(params_final, history)`` — or ``(params_final, opt_state,
    history)`` with ``return_opt_state`` — with the parameters sharded over
    the mesh. ``opt_state`` is a plain dict (count + Adam moments, trimmed
    to the real extents) accepted back by a later call for a bit-exact
    resume; the softmax stats are recomputed from M. ``learning_rate`` is a
    constant float or a per-epoch ``(num_epochs,)`` vector
    (``ops/schedules.py``). ``donate=True`` donates the sharded M and Adam
    moments to the computation (halving their peak HBM next to the training
    carry — the knob that doubles per-chip shard capacity at atlas scale);
    the caller must not reuse the incoming buffers. ``step_offset`` is the
    absolute epoch index of this call's first step: chunked/resumed runs
    pass it so the ``val_each`` validation cadence continues across chunk
    boundaries instead of restarting (the analogue of ``fit_mapping``'s
    ``step_offset``). See the module docstring for supported configurations
    per mesh layout.
    """
    from ..ops.schedules import resolve_lr

    learning_rate = resolve_lr(learning_rate, num_epochs)
    constrained = isinstance(params, tuple)
    has_norm_penalties = lw.lambda_l1 != 0 or lw.lambda_l2 != 0
    if has_norm_penalties and constrained:
        raise NotImplementedError(
            "lambda_l1/lambda_l2 are not part of the constrained loss"
        )
    if val_data is not None and constrained:
        # the reference's _val_loss_fn exists on the unconstrained Mapper
        # only (mapping_optimizer.py:311-356)
        raise NotImplementedError(
            "validation metrics are not defined for the constrained mapper"
        )

    if mesh is None:
        devices = np.asarray(jax.devices())
        mesh = Mesh(devices.reshape(-1), axis_names=("cell",))

    val = dict(val_data=val_data, val_each=val_each, donate=donate,
               step_offset=int(step_offset), rounding=rounding)
    if "spot" in mesh.axis_names and mesh.shape["spot"] > 1:
        cell_axes = (
            ("slice", "cell") if "slice" in mesh.axis_names else ("cell",)
        )
        return _fit_2d(params, data, lw, num_epochs, learning_rate, mesh,
                       moment_dtype, compute_dtype, constrained,
                       opt_state=opt_state, return_opt_state=return_opt_state,
                       cell_axes=cell_axes, **val)

    # multi-slice pod: a ("slice", "cell") mesh shards cells over the
    # product axis — DCN rides the "slice" dimension of every psum
    axis = "cell"
    if "slice" in mesh.axis_names:
        axis = tuple(a for a in mesh.axis_names if a in ("slice", "cell"))
    return _fit_1d(params, data, lw, num_epochs, learning_rate, mesh,
                   moment_dtype, compute_dtype, constrained,
                   opt_state=opt_state, return_opt_state=return_opt_state,
                   axis=axis, **val)


def _opt_arrays(opt_state, shapes, dtypes, pads):
    """(count, moment arrays...) — zeros for a fresh run, re-padded restored
    values otherwise. ``shapes``/``dtypes``/``pads`` describe each moment
    array; checkpointed moments are stored trimmed to the real extents and
    zero-padding restores them exactly (padded rows never accumulate)."""
    names = ["mu", "nu", "muF", "nuF"][: len(shapes)]
    if opt_state is None:
        count = jnp.zeros((), jnp.int32)
        arrays = [jnp.zeros(sh, dt) for sh, dt in zip(shapes, dtypes)]
    else:
        count = jnp.asarray(opt_state["count"], jnp.int32)
        arrays = []
        for name, sh, dt, pad_dims in zip(names, shapes, dtypes, pads):
            arr = jnp.asarray(opt_state[name], dt)
            for axis_i, target in pad_dims:
                arr = _pad_axis(arr, axis_i, target)
            arrays.append(arr)
    return count, arrays


def _donate_argnums(extra_names):
    """Argument indices of (M, mu, nu[, F, muF, nuF]) in the jitted
    shard_map call — the training-state buffers safe to donate. Optional
    extras start at position 7 and are located by name."""
    idx = [0, 5, 6]
    idx += [7 + extra_names.index(n) for n in ("F", "muF", "nuF")
            if n in extra_names]
    return tuple(idx)


def _fit_1d(params, data, lw, num_epochs, learning_rate, mesh, moment_dtype,
            compute_dtype, constrained, opt_state=None,
            return_opt_state=False, val_data=None, val_each=None,
            donate=False, step_offset=0, axis="cell", rounding="nearest"):
    # ``axis`` may be a tuple of mesh axes — e.g. ("slice", "cell") for a
    # multi-slice pod where cells shard over slices × chips-per-slice: the
    # kernels are unchanged (still row-local softmax) and the Y/q psums run
    # over the product axis, which XLA lowers to an in-slice ICI reduce plus
    # a cross-slice DCN reduce (the hierarchical collective is the
    # compiler's job, not hand-written here).
    axes = axis if isinstance(axis, tuple) else (axis,)
    spec_axes = axis if isinstance(axis, str) else tuple(axes)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
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
            jnp.full((n_cells,), 1.0 / n_cells, dtype=jnp.float32), 0, c_pad
        )
    M0 = _pad_axis(M0, 0, c_pad)
    F0 = None
    if constrained:
        F0 = _pad_axis(params[1], 0, c_pad, value=F_PAD_LOGIT)

    # shard the cell-axis arrays; replicate the (small) spot/gene-axis rest
    repl = NamedSharding(mesh, P())
    cell_rows = NamedSharding(mesh, P(spec_axes, None))
    M0 = jax.device_put(M0, cell_rows)
    S = jax.device_put(S, cell_rows)
    ct = None if ct is None else jax.device_put(ct, cell_rows)
    w_full = jax.device_put(w_full, NamedSharding(mesh, P(spec_axes)))
    F0 = None if F0 is None else jax.device_put(F0, NamedSharding(mesh, P(spec_axes)))
    # The step reads S/ct through the sharded args; blank them in `data`.
    # ct_encode keeps a (1, n_ct) stub: the epilogue consumes the ct columns
    # through Y but gates the islands penalty on `ct_encode is not None`.
    data_repl = jax.tree.map(
        lambda x: jax.device_put(x, repl),
        data._replace(
            S=jnp.zeros((1, S.shape[1]), S.dtype),
            ct_encode=None if ct is None else jnp.zeros((1, ct.shape[1]), ct.dtype),
            d_source=None,
        ),
    )
    data_specs = jax.tree.map(lambda _: P(), data_repl)

    n_spots = M0.shape[1]
    if constrained:
        count0, (mu0, nu0, muF0, nuF0) = _opt_arrays(
            opt_state,
            [(c_pad, n_spots)] * 2 + [(c_pad,)] * 2,
            [moment_dtype, moment_dtype, jnp.float32, jnp.float32],
            [[(0, c_pad)]] * 4,
        )
    else:
        count0, (mu0, nu0) = _opt_arrays(
            opt_state, [(c_pad, n_spots)] * 2, [moment_dtype] * 2,
            [[(0, c_pad)]] * 2,
        )
        muF0 = nuF0 = None
    mu0 = jax.device_put(mu0, cell_rows)
    nu0 = jax.device_put(nu0, cell_rows)
    count0 = jax.device_put(count0, repl)
    cell_vec = NamedSharding(mesh, P(spec_axes))
    muF0 = None if muF0 is None else jax.device_put(muF0, cell_vec)
    nuF0 = None if nuF0 is None else jax.device_put(nuF0, cell_vec)

    with_val = val_data is not None and val_each is not None
    if with_val:
        val_each = int(val_each)
        valS = jax.device_put(
            _pad_axis(jnp.asarray(val_data.S, jnp.float32), 0, c_pad), cell_rows
        )
        valG = jax.device_put(jnp.asarray(val_data.G, jnp.float32), repl)

    # constant lr (python float) or a replicated per-epoch lr vector
    # (ops/schedules.py); the Adam kernels take lr as a traced scalar either
    # way, so a schedule costs nothing extra.
    lr_vec = None
    if np.ndim(learning_rate) == 1:
        lr_vec = jax.device_put(jnp.asarray(learning_rate, jnp.float32), repl)
    else:
        learning_rate = float(learning_rate)

    # optional inputs travel as (name, spec, array) triples — run() looks
    # them up by name, never by position
    extra_names, extra_specs, extra_args = [], [], []

    def add_extra(name, spec, arr):
        extra_names.append(name)
        extra_specs.append(spec)
        extra_args.append(arr)

    if ct is not None:
        add_extra("ct", P(spec_axes, None), ct)
    if constrained:
        add_extra("F", P(spec_axes), F0)
        add_extra("muF", P(spec_axes), muF0)
        add_extra("nuF", P(spec_axes), nuF0)
    if with_val:
        add_extra("valS", P(spec_axes, None), valS)
        add_extra("valG", P(), valG)
    if lr_vec is not None:
        add_extra("lr", P(), lr_vec)

    def run(M_local, S_local, w_local, data_local, count, mu, nu, *extras):
        from ..ops.fused_step import _pad_k, _project, initial_stats
        from ..ops.pallas_core import _rowstats

        ex = dict(zip(extra_names, extras))
        lr_l = ex.get("lr")

        # scan t is the ABSOLUTE epoch index (step_offset + position), so
        # the val cadence carries across chunked/resumed calls; the chunk's
        # lr vector is indexed relative to this call
        def lr_at(t):
            return learning_rate if lr_l is None else lr_l[t - step_offset]

        ct_l = ex.get("ct")
        if constrained:
            F_l, muF, nuF = ex["F"], ex["muF"], ex["nuF"]
        if with_val:
            valS_l, valG_l = ex["valS"], ex["valG"]
        data_local = data_local._replace(S=S_local)
        cvalid = _cell_validity(M_local.shape[0], n_cells, axis)
        stats = (
            tuple(_rowstats(M_local)) if constrained
            else tuple(initial_stats(M_local, lw))
        )

        def val_fn(M, stats_new):
            # forward over the val-gene columns using the step's carried
            # post-step softmax stats: one extra streamed pass over M, no
            # standalone rowstats (padded cell rows of valS are zero, so
            # they add nothing to Y; h is masked to real cells)
            m, l, u = stats_new[0], stats_new[1], stats_new[2]
            g_val = valG_l.shape[1]
            valS_p = _pad_k(valS_l).astype(compute_dtype)
            Y_part, _ = _project(M, valS_p, w_local, m, l)
            Y = jax.lax.psum(Y_part, axis)[:, :g_val]
            h = ((u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])) * cvalid
            h_mean = jax.lax.psum(jnp.sum(h), axis) / n_cells
            return val_metrics_from_projection(Y, valG_l, h_mean, n_spots)

        def maybe_val(t, M, stats_new):
            if not with_val:
                return {}
            return jax.lax.cond(
                t % val_each == 0,
                lambda: val_fn(M, stats_new),
                lambda: {k: jnp.float32(jnp.nan) for k in VAL_METRIC_KEYS},
            )

        if constrained:
            def step(carry, t):
                M, F, count, mu, nu, muF, nuF, stats = carry
                new_carry, terms = _cell_step_constrained(
                    M, F, count, mu, nu, muF, nuF, stats, S_local, cvalid,
                    data_local, lw, lr_at(t), compute_dtype, axis,
                    rounding=rounding,
                )
                return new_carry, terms

            (M_f, F_f, count_f, mu_f, nu_f, muF_f, nuF_f, _), history = (
                jax.lax.scan(
                    step, (M_local, F_l, count, mu, nu, muF, nuF, stats),
                    step_offset + jnp.arange(num_epochs)
                    if lr_l is not None else None,
                    length=None if lr_l is not None else num_epochs,
                )
            )
            return M_f, F_f, count_f, mu_f, nu_f, muF_f, nuF_f, history

        need_t = with_val or lr_l is not None

        def step(carry, t):
            M, count, mu, nu, stats = carry
            new_carry, terms = _cell_step_unconstrained(
                M, count, mu, nu, stats, S_local, ct_l, w_local, cvalid,
                data_local, lw, lr_at(t), compute_dtype, axis,
                rounding=rounding,
            )
            if with_val:
                terms = {**terms, **maybe_val(t, new_carry[0], new_carry[4])}
            return new_carry, terms

        (M_f, count_f, mu_f, nu_f, _), history = jax.lax.scan(
            step, (M_local, count, mu, nu, stats),
            step_offset + jnp.arange(num_epochs) if need_t else None,
            length=None if need_t else num_epochs,
        )
        return M_f, count_f, mu_f, nu_f, history

    rows, vec = P(spec_axes, None), P(spec_axes)
    out_specs = (
        (rows, vec, P(), rows, rows, vec, vec, P()) if constrained
        else (rows, P(), rows, rows, P())
    )
    sharded = _shard_map(
        run,
        mesh,
        in_specs=(rows, rows, vec, data_specs, P(), rows, rows)
        + tuple(extra_specs),
        out_specs=out_specs,
    )
    jit_kw = (
        {"donate_argnums": _donate_argnums(extra_names)} if donate else {}
    )
    out = jax.jit(sharded, **jit_kw)(M0, S, w_full, data_repl, count0, mu0,
                                     nu0, *extra_args)
    if constrained:
        M_f, F_f, count_f, mu_f, nu_f, muF_f, nuF_f, history = out
        result = (M_f[:n_cells], F_f[:n_cells])
        opt_out = {"count": count_f, "mu": mu_f[:n_cells], "nu": nu_f[:n_cells],
                   "muF": muF_f[:n_cells], "nuF": nuF_f[:n_cells]}
    else:
        M_f, count_f, mu_f, nu_f, history = out
        result = M_f[:n_cells]
        opt_out = {"count": count_f, "mu": mu_f[:n_cells], "nu": nu_f[:n_cells]}
    if return_opt_state:
        return result, opt_out, history
    return result, history


def _fit_2d(params, data, lw, num_epochs, learning_rate, mesh, moment_dtype,
            compute_dtype, constrained, opt_state=None,
            return_opt_state=False, val_data=None, val_each=None,
            donate=False, step_offset=0, rounding="nearest",
            cell_axes=("cell",)):
    # ``cell_axes`` — mesh axes the cell dimension shards over: ("cell",)
    # within one slice, ("slice", "cell") on a multi-slice pod (the one
    # layout needed when a cell-row of M outgrows a chip AND the job spans
    # slices; cell-axis psums then cross DCN on their slice dimension)
    constr = constrained
    M0 = params[0] if constr else params
    cell_axes = tuple(cell_axes)
    cspec = cell_axes[0] if len(cell_axes) == 1 else cell_axes
    caxis = cell_axes[0] if len(cell_axes) == 1 else cell_axes
    cshards = int(np.prod([mesh.shape[a] for a in cell_axes]))
    sshards = mesh.shape["spot"]
    n_cells, n_spots = M0.shape
    c_pad = -(-n_cells // cshards) * cshards
    s_pad = -(-n_spots // sshards) * sshards

    M0 = _pad_axis(_pad_axis(M0, 0, c_pad), 1, s_pad, value=M_PAD_LOGIT)
    S = _pad_axis(data.S, 0, c_pad)
    ct = data.ct_encode if (lw.lambda_ct_islands > 0 and data.ct_encode is not None) else None
    ct = _pad_axis(ct, 0, c_pad)
    if data.d_source is not None:
        w_full = _pad_axis(data.d_source, 0, c_pad)
    else:
        w_full = _pad_axis(
            jnp.full((n_cells,), 1.0 / n_cells, dtype=jnp.float32), 0, c_pad
        )
    F0 = None
    if constr:
        F0 = _pad_axis(params[1], 0, c_pad, value=F_PAD_LOGIT)

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    M0 = jax.device_put(M0, ns(cspec, "spot"))
    S = jax.device_put(S, ns(cspec, None))
    ct = None if ct is None else jax.device_put(ct, ns(cspec, None))
    w_full = jax.device_put(w_full, ns(cspec))
    F0 = None if F0 is None else jax.device_put(F0, ns(cspec))
    # G, d, gene_mask, spot graphs and autocorrelation refs stay REPLICATED:
    # they are O(spots × genes) — tiny next to M — and the full epilogue
    # consumes them whole after the spot-axis all-gather of the projection.
    # ct_encode keeps a (1, n_ct) stub: the epilogue consumes the ct columns
    # through Y but gates the islands penalty on `ct_encode is not None`.
    data_repl = jax.tree.map(
        lambda x: jax.device_put(x, ns()),
        data._replace(
            S=jnp.zeros((1, S.shape[1]), S.dtype),
            ct_encode=None if ct is None else jnp.zeros((1, ct.shape[1]), ct.dtype),
            d_source=None,
        ),
    )
    data_specs = jax.tree.map(lambda _: P(), data_repl)

    with_val = val_data is not None and val_each is not None
    if with_val:
        val_each = int(val_each)
        valS = jax.device_put(
            _pad_axis(jnp.asarray(val_data.S, jnp.float32), 0, c_pad),
            ns(cspec, None),
        )
        valG = jax.device_put(jnp.asarray(val_data.G, jnp.float32), ns())

    extra_names, extra_specs, extra_args = [], [], []

    def add_extra(name, spec, arr):
        extra_names.append(name)
        extra_specs.append(spec)
        extra_args.append(arr)

    if ct is not None:
        add_extra("ct", P(cspec, None), ct)
    if constr:
        add_extra("F", P(cspec), F0)

    if constr:
        count0, (mu0, nu0, muF0, nuF0) = _opt_arrays(
            opt_state,
            [(c_pad, s_pad)] * 2 + [(c_pad,)] * 2,
            [moment_dtype, moment_dtype, jnp.float32, jnp.float32],
            [[(0, c_pad), (1, s_pad)]] * 2 + [[(0, c_pad)]] * 2,
        )
    else:
        count0, (mu0, nu0) = _opt_arrays(
            opt_state, [(c_pad, s_pad)] * 2, [moment_dtype] * 2,
            [[(0, c_pad), (1, s_pad)]] * 2,
        )
        muF0 = nuF0 = None
    mu0 = jax.device_put(mu0, ns(cspec, "spot"))
    nu0 = jax.device_put(nu0, ns(cspec, "spot"))
    count0 = jax.device_put(count0, ns())
    muF0 = None if muF0 is None else jax.device_put(muF0, ns(cspec))
    nuF0 = None if nuF0 is None else jax.device_put(nuF0, ns(cspec))
    if constr:
        add_extra("muF", P(cspec), muF0)
        add_extra("nuF", P(cspec), nuF0)
    if with_val:
        add_extra("valS", P(cspec, None), valS)
        add_extra("valG", P(), valG)

    lr_vec = None
    if np.ndim(learning_rate) == 1:
        lr_vec = jax.device_put(jnp.asarray(learning_rate, jnp.float32), ns())
        add_extra("lr", P(), lr_vec)
    else:
        learning_rate = float(learning_rate)

    need_norms = (not constr) and (lw.lambda_l1 != 0 or lw.lambda_l2 != 0)

    def run(M_local, S_local, w_local, data_local, count, mu, nu, *extras):
        from ..ops.fused_step import _pad_k, _project, _rowstats_norms
        from ..ops.pallas_core import _rowstats

        ex = dict(zip(extra_names, extras))
        lr_l = ex.get("lr")

        # absolute epoch index in t; chunk-relative lr indexing (see _fit_1d)
        def lr_at(t):
            return learning_rate if lr_l is None else lr_l[t - step_offset]

        ct_l = ex.get("ct")
        if constr:
            F_l, muF, nuF = ex["F"], ex["muF"], ex["nuF"]
        if with_val:
            valS_l, valG_l = ex["valS"], ex["valG"]
        cvalid = _cell_validity(M_local.shape[0], n_cells, caxis)
        stats_l = (
            tuple(_rowstats_norms(M_local)) if need_norms
            else tuple(_rowstats(M_local))
        )

        def val_fn(M, stats_l_new):
            # same collective pattern as the training forward: stats merged
            # across spot shards, Y psum'd over cells, gathered over spots
            m, l, u = _merge_rowstats(*stats_l_new[:3], "spot")
            g_val = valG_l.shape[1]
            valS_p = _pad_k(valS_l).astype(compute_dtype)
            Y_part, _ = _project(M, valS_p, w_local, m, l)
            Y_shard = jax.lax.psum(Y_part, cell_axes)
            Y = jax.lax.all_gather(
                Y_shard, "spot", axis=0, tiled=True
            )[:n_spots, :g_val]
            h = ((u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])) * cvalid
            h_mean = jax.lax.psum(jnp.sum(h), cell_axes) / n_cells
            return val_metrics_from_projection(Y, valG_l, h_mean, n_spots)

        def maybe_val(t, M, stats_l_new):
            if not with_val:
                return {}
            return jax.lax.cond(
                t % val_each == 0,
                lambda: val_fn(M, stats_l_new),
                lambda: {k: jnp.float32(jnp.nan) for k in VAL_METRIC_KEYS},
            )

        if constr:
            def step(carry, t):
                M, F, count, mu, nu, muF, nuF, stats_l = carry
                return _grid_step(
                    M, F, count, mu, nu, muF, nuF, stats_l, S_local, ct_l,
                    w_local, cvalid, data_local, lw, lr_at(t),
                    compute_dtype, n_spots, True, rounding=rounding,
                    cell_axes=cell_axes,
                )

            (M_f, F_f, count_f, mu_f, nu_f, muF_f, nuF_f, _), history = (
                jax.lax.scan(
                    step, (M_local, F_l, count, mu, nu, muF, nuF, stats_l),
                    step_offset + jnp.arange(num_epochs)
                    if lr_l is not None else None,
                    length=None if lr_l is not None else num_epochs,
                )
            )
            return M_f, F_f, count_f, mu_f, nu_f, muF_f, nuF_f, history

        need_t = with_val or lr_l is not None

        def step(carry, t):
            M, count, mu, nu, stats_l = carry
            new_carry, terms = _grid_step(
                M, None, count, mu, nu, None, None, stats_l, S_local, ct_l,
                w_local, cvalid, data_local, lw, lr_at(t),
                compute_dtype, n_spots, False, rounding=rounding,
                cell_axes=cell_axes,
            )
            if with_val:
                terms = {**terms, **maybe_val(t, new_carry[0], new_carry[4])}
            return new_carry, terms

        (M_f, count_f, mu_f, nu_f, _), history = jax.lax.scan(
            step, (M_local, count, mu, nu, stats_l),
            step_offset + jnp.arange(num_epochs) if need_t else None,
            length=None if need_t else num_epochs,
        )
        return M_f, count_f, mu_f, nu_f, history

    block, vec = P(cspec, "spot"), P(cspec)
    out_specs = (
        (block, vec, P(), block, block, vec, vec, P()) if constr
        else (block, P(), block, block, P())
    )
    sharded = _shard_map(
        run,
        mesh,
        in_specs=(block, P(cspec, None), vec, data_specs, P(), block, block)
        + tuple(extra_specs),
        out_specs=out_specs,
    )
    jit_kw = (
        {"donate_argnums": _donate_argnums(extra_names)} if donate else {}
    )
    out = jax.jit(sharded, **jit_kw)(M0, S, w_full, data_repl, count0, mu0,
                                     nu0, *extra_args)
    if constr:
        M_f, F_f, count_f, mu_f, nu_f, muF_f, nuF_f, history = out
        result = (M_f[:n_cells, :n_spots], F_f[:n_cells])
        opt_out = {"count": count_f, "mu": mu_f[:n_cells, :n_spots],
                   "nu": nu_f[:n_cells, :n_spots],
                   "muF": muF_f[:n_cells], "nuF": nuF_f[:n_cells]}
    else:
        M_f, count_f, mu_f, nu_f, history = out
        result = M_f[:n_cells, :n_spots]
        opt_out = {"count": count_f, "mu": mu_f[:n_cells, :n_spots],
                   "nu": nu_f[:n_cells, :n_spots]}
    if return_opt_state:
        return result, opt_out, history
    return result, history
