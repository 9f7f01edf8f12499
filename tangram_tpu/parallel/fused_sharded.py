"""Multi-chip training through the fused Pallas kernels.

GSPMD cannot partition a ``pallas_call``, so the generic sharded path
(`mesh.py`) runs the XLA implementation. This module is the TPU-native
alternative: ``shard_map`` over the "cell" mesh axis with the fused kernels
running shard-locally and two collectives per step:

* ``psum`` of the projected expression ``Y = Pᵀ A``  — (spots × genes)
* ``psum`` of the spot marginal ``q`` (+ the scalar entropy sum)

Everything else is local to a shard: the softmax runs over the spot axis
(every device holds full rows of M), the backward tiles and the Adam update
touch only the local (cells/n_devices × spots) block. Per-step ICI traffic is
O(spots × genes) — thousands of times smaller than M.

At the 100k cells × 50k spots north star on a v5e-8: each device holds a
12.5k × 50k shard of M (2.5 GB) plus bf16 moments; the psums move ~50 MB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.losses import LossWeights, MapperData, unconstrained_epilogue

__all__ = ["fit_mapping_fused_sharded"]


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


def _local_fused_step(M, count, mu, nu, stats, S_local, ct_local, w_local,
                      data, lw, learning_rate, compute_dtype, axis):
    """One fused Adam step on this device's cell shard; collectives where the
    math crosses shards."""
    from ..ops.fused_step import BETA1, BETA2, _dm_adam, _pad_k, _project, _rbar

    mask = data.gene_mask
    S_eff = S_local if mask is None else S_local * mask[None, :]
    A = S_eff if ct_local is None else jnp.concatenate([S_eff, ct_local], axis=1)
    k_real = A.shape[1]
    A_p = _pad_k(A).astype(compute_dtype)

    m, l, u = stats
    Y_partial, q_partial = _project(M, A_p, w_local, m, l)
    Y = jax.lax.psum(Y_partial, axis)
    q = jax.lax.psum(q_partial, axis)
    h_local = (u[:, 0] / l[:, 0]) - m[:, 0] - jnp.log(l[:, 0])
    h_sum = jax.lax.psum(jnp.sum(h_local), axis)

    def epilogue(Y, q, h1):
        # the epilogue consumes h only through sum(h); feed it the global sum
        return unconstrained_epilogue(Y, q, h1, None, None, data, lw)

    total, vjp, terms = jax.vjp(
        epilogue, Y[:, :k_real], q, h_sum.reshape(1), has_aux=True
    )
    dY, dq, dh1 = vjp(jnp.ones_like(total))
    dY_p = _pad_k(dY).astype(compute_dtype)
    dh_local = jnp.broadcast_to(dh1[0], (M.shape[0],))

    r = _rbar(M, A_p, w_local, m, l, dY_p, dq, dh_local)

    count_new = count + 1
    t = count_new.astype(jnp.float32)
    scalars = jnp.stack(
        [jnp.asarray(learning_rate, jnp.float32),
         1.0 - BETA1 ** t, 1.0 - BETA2 ** t, jnp.float32(0)]
    ).reshape(1, 4)

    M_new, mu_new, nu_new, m2, l2, u2 = _dm_adam(
        M, A_p, w_local, m, l, dY_p, dq, dh_local, r, mu, nu, scalars,
        0.0, 0.0, with_norms=False,
    )
    return M_new, count_new, mu_new, nu_new, (m2, l2, u2), terms


def fit_mapping_fused_sharded(
    M0,
    data: MapperData,
    lw: LossWeights,
    num_epochs: int,
    learning_rate: float,
    mesh: Mesh = None,
    moment_dtype=jnp.float32,
    compute_dtype=jnp.float32,
):
    """Train over a 1-D "cell" mesh with the fused kernels.

    Returns ``(M_final, history)`` with M_final sharded over the mesh.
    Unconstrained modes (cells/clusters, all spatial regularizers) are
    supported; L1/L2 logit penalties are not (their norms would need an
    extra collective) — use the GSPMD path for those.
    """
    if lw.lambda_l1 != 0 or lw.lambda_l2 != 0:
        raise NotImplementedError(
            "fused sharded path does not support lambda_l1/lambda_l2; "
            "use parallel.fit_mapping_sharded (GSPMD) instead."
        )

    if mesh is None:
        devices = np.asarray(jax.devices())
        mesh = Mesh(devices.reshape(-1), axis_names=("cell",))
    axis = "cell"
    n_shards = mesh.shape[axis]
    n_cells = M0.shape[0]
    if n_cells % n_shards != 0:
        raise ValueError(
            f"n_cells={n_cells} must be divisible by the {n_shards}-way cell mesh"
        )

    S = data.S
    ct = data.ct_encode if (lw.lambda_ct_islands > 0 and data.ct_encode is not None) else None
    if data.d_source is not None:
        w_full = data.d_source
    else:
        w_full = jnp.full((n_cells,), 1.0 / n_cells, dtype=M0.dtype)

    # shard the cell-axis arrays; replicate the (small) spot/gene-axis rest
    repl = NamedSharding(mesh, P())
    M0 = jax.device_put(M0, NamedSharding(mesh, P("cell", None)))
    S = jax.device_put(S, NamedSharding(mesh, P("cell", None)))
    ct = None if ct is None else jax.device_put(ct, NamedSharding(mesh, P("cell", None)))
    w_full = jax.device_put(w_full, NamedSharding(mesh, P("cell")))
    # the step reads S/ct through the sharded args; blank them in `data`
    data_repl = jax.tree.map(
        lambda x: jax.device_put(x, repl),
        data._replace(S=jnp.zeros((1, S.shape[1]), S.dtype), ct_encode=None,
                      d_source=None),
    )
    data_specs = jax.tree.map(lambda _: P(), data_repl)

    ct_specs = () if ct is None else (P("cell", None),)
    ct_args = () if ct is None else (ct,)

    def run(M_local, S_local, w_local, data_local, *ct_local):
        from ..ops.fused_step import initial_stats

        ct_l = ct_local[0] if ct_local else None
        data_local = data_local._replace(S=S_local)
        count = jnp.zeros((), jnp.int32)
        mu = jnp.zeros(M_local.shape, moment_dtype)
        nu = jnp.zeros(M_local.shape, moment_dtype)
        stats = initial_stats(M_local, lw)

        def step(carry, _):
            M, count, mu, nu, stats = carry
            M_new, count_new, mu_new, nu_new, stats_new, terms = _local_fused_step(
                M, count, mu, nu, stats, S_local, ct_l, w_local, data_local,
                lw, learning_rate, compute_dtype, axis,
            )
            return (M_new, count_new, mu_new, nu_new, stats_new), terms

        (M_final, *_), history = jax.lax.scan(
            step, (M_local, count, mu, nu, stats), None, length=num_epochs
        )
        return M_final, history

    sharded = _shard_map(
        run,
        mesh,
        in_specs=(P("cell", None), P("cell", None), P("cell"), data_specs) + ct_specs,
        out_specs=(P("cell", None), P()),
    )
    return jax.jit(sharded)(M0, S, w_full, data_repl, *ct_args)
