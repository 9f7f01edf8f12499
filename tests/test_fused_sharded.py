"""Multi-chip fused-kernel path: shard_map over the cell axis must match
single-device training (same kernels, psums over the mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tangram_tpu.models.mapper import fit_mapping, init_logits
from tangram_tpu.ops.losses import LossWeights, MapperData
from tangram_tpu.parallel.fused_sharded import fit_mapping_fused_sharded


def make_problem(rng, c=64, s=48, g=10, with_d=True):
    S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
    d = None
    if with_d:
        d = rng.random(s).astype(np.float32)
        d /= d.sum()
    data = MapperData(
        S=jnp.asarray(S), G=jnp.asarray(G),
        d=None if d is None else jnp.asarray(d),
    )
    return init_logits(c, s, 5, "numpy"), data


@pytest.mark.parametrize("lw", [
    LossWeights(lambda_g1=1.0),
    LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_g2=0.5, lambda_r=0.01),
])
def test_fused_sharded_matches_single_device(rng, lw):
    M0, data = make_problem(rng, with_d=lw.lambda_d > 0)
    p_ref, h_ref = fit_mapping(M0, data, lw, 20, 0.1, impl="pallas", fused=True)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(-1), axis_names=("cell",))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 20, 0.1, mesh=mesh)

    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)


def test_fused_sharded_clusters_mode_with_ct(rng):
    """d_source weights + ct-islands columns ride the same sharded machinery."""
    c, s, g = 32, 40, 8
    M0, data = make_problem(rng, c=c, s=s, g=g)
    W = (rng.random((s, s)) * (rng.random((s, s)) < 0.4)).astype(np.float32)
    ct = np.zeros((c, 3), np.float32)
    ct[np.arange(c), rng.integers(0, 3, c)] = 1
    ds = rng.random(c).astype(np.float32)
    ds /= ds.sum()
    data = data._replace(
        d_source=jnp.asarray(ds),
        ct_encode=jnp.asarray(ct),
        neighborhood_filter=jnp.asarray(W),
    )
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_ct_islands=0.4)

    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(-1), axis_names=("cell",))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=3e-4)


def test_mesh_through_public_api(rng):
    """map_cells_to_space(mesh=...) trains sharded and matches single-device."""
    import pandas as pd

    import tangram_tpu as tg

    c, s, g = 64, 40, 16
    S = (rng.poisson(2.0, (c, g)) + 1).astype(np.float32)
    G = (rng.poisson(2.0, (s, g)) + 1).astype(np.float32)
    ad_sc = tg.AnnData(X=S, obs=pd.DataFrame(index=[f"c{i}" for i in range(c)]),
                       var=pd.DataFrame(index=[f"g{i}" for i in range(g)]))
    ad_sp = tg.AnnData(X=G, var=pd.DataFrame(index=[f"g{i}" for i in range(g)]))
    tg.pp_adatas(ad_sc, ad_sp)

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), axis_names=("cell",))
    m_mesh = tg.map_cells_to_space(ad_sc, ad_sp, num_epochs=25, random_state=42,
                                   verbose=False, mesh=mesh)
    m_single = tg.map_cells_to_space(ad_sc, ad_sp, num_epochs=25, random_state=42,
                                     verbose=False)
    np.testing.assert_allclose(m_mesh.X, m_single.X, atol=5e-4)

    with pytest.raises(NotImplementedError, match="constrained"):
        tg.map_cells_to_space(ad_sc, ad_sp, mode="constrained", target_count=30,
                              mesh=mesh, num_epochs=5, verbose=False,
                              density_prior="uniform")


def test_fused_sharded_rejects_l1(rng):
    M0, data = make_problem(rng)
    with pytest.raises(NotImplementedError, match="lambda_l1"):
        fit_mapping_fused_sharded(
            M0, data, LossWeights(lambda_g1=1.0, lambda_l1=0.1), 5, 0.1
        )


def test_fused_sharded_rejects_indivisible(rng):
    M0, data = make_problem(rng, c=30)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(-1), axis_names=("cell",))
    with pytest.raises(ValueError, match="divisible"):
        fit_mapping_fused_sharded(M0, data, LossWeights(), 5, 0.1, mesh=mesh)
