"""Multi-chip fused-kernel path: shard_map over the cell axis (and the 2-D
cell×spot grid) must match single-device training — same kernels, psums over
the mesh, padding when the problem doesn't divide the mesh."""

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


def cell_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(-1), axis_names=("cell",))


@pytest.mark.parametrize("lw", [
    LossWeights(lambda_g1=1.0),
    LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_g2=0.5, lambda_r=0.01),
])
def test_fused_sharded_matches_single_device(rng, lw):
    M0, data = make_problem(rng, with_d=lw.lambda_d > 0)
    p_ref, h_ref = fit_mapping(M0, data, lw, 20, 0.1, impl="pallas", fused=True)

    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 20, 0.1, mesh=cell_mesh(8))

    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)


def test_fused_sharded_clusters_mode_with_ct(rng):
    """d_source weights + ct-islands columns ride the same sharded machinery.

    W is deliberately WEAK (~one 0.05-weight neighbor per spot) so the hinge
    max(ct_map − W·ct_map, 0) is strictly positive — a dense W makes the
    penalty identically zero and the test would pass even if the sharded
    path dropped the term entirely.
    """
    c, s, g = 32, 40, 8
    M0, data = make_problem(rng, c=c, s=s, g=g)
    W = (0.05 * rng.random((s, s)) * (rng.random((s, s)) < 0.05)).astype(np.float32)
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
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=cell_mesh(4))
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    assert float(np.asarray(h_ref["ct_island_penalty"])[0]) > 1e-4
    np.testing.assert_allclose(
        np.asarray(h_sh["ct_island_penalty"]),
        np.asarray(h_ref["ct_island_penalty"]), rtol=2e-4, atol=2e-6,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=3e-4)


def test_fused_sharded_pads_indivisible_cells(rng):
    """n_cells that doesn't divide the mesh is zero-padded, not rejected."""
    M0, data = make_problem(rng, c=30)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=cell_mesh(8))
    assert p_sh.shape == p_ref.shape
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)


def test_fused_sharded_constrained_matches_single_device(rng):
    """(M, F) constrained training sharded over cells == single device.

    target_count is set above n_cells so |Σσ(F) − target| never crosses its
    kink mid-test: at the kink a 1-ulp difference in the psum'd filter total
    flips the sign one step apart and the (still individually correct)
    trajectories separate chaotically.
    """
    c, s = 48, 36
    M0, data = make_problem(rng, c=c, s=s)
    data = data._replace(target_count=jnp.float32(200.0))
    F0 = jnp.asarray(rng.normal(size=c), jnp.float32)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0,
                     lambda_count=1.0, lambda_f_reg=1.0)

    p_ref, h_ref = fit_mapping((M0, F0), data, lw, 20, 0.1, constrained=True,
                               impl="pallas", fused=True)
    (M_sh, F_sh), h_sh = fit_mapping_fused_sharded(
        (M0, F0), data, lw, 20, 0.1, mesh=cell_mesh(8)
    )
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    # raw logits: a few near-zero-gradient entries take ±lr Adam steps in
    # different directions under reordered psums; probabilities stay tight
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(M_sh, axis=1)),
        np.asarray(jax.nn.softmax(p_ref[0], axis=1)), atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(F_sh)),
        np.asarray(jax.nn.sigmoid(p_ref[1])), atol=2e-3,
    )


def test_fused_sharded_2d_matches_single_device(rng):
    """Block-sharded (cell × spot) fused training == single device, with
    padding on both axes. λ_r is exercised separately by the gradient
    identity test below: the entropy gradient crosses zero inside every row,
    and Adam's sign(g)-sized first steps amplify 1-ulp reduction-order
    differences on those entries into divergent (individually correct)
    trajectories.
    """
    M0, data = make_problem(rng, c=30, s=42)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_g2=0.5)
    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2d = Mesh(devs, axis_names=("cell", "spot"))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=mesh2d)
    assert p_sh.shape == p_ref.shape
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=5e-3)


def test_2d_entropy_gradient_identity(rng):
    """The 2-D path's entropy machinery — rowstats merged across spot shards,
    rbar psum'd over "spot", dM = P(dP − r) — must reproduce the autodiff
    gradient of Σ_c Σ_s P log P exactly."""
    from jax.sharding import PartitionSpec as P

    from tangram_tpu.ops.fused_step import _rbar
    from tangram_tpu.ops.pallas_core import _rowstats
    from tangram_tpu.parallel.fused_sharded import _merge_rowstats, _shard_map

    c, s = 16, 24
    M0 = jnp.asarray(rng.normal(size=(c, s)), jnp.float32)
    truth = jax.grad(
        lambda M: jnp.sum(jax.nn.softmax(M, 1) * jax.nn.log_softmax(M, 1))
    )(M0)

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, axis_names=("cell", "spot"))

    def run(M_l):
        m, l, u = _merge_rowstats(*_rowstats(M_l), "spot")
        zeros_k = jnp.zeros((M_l.shape[0], 128), jnp.float32)
        dY = jnp.zeros((M_l.shape[1], 128), jnp.float32)
        dq = jnp.zeros((M_l.shape[1],), jnp.float32)
        dh = jnp.ones((M_l.shape[0],), jnp.float32)
        w = jnp.zeros((M_l.shape[0],), jnp.float32)
        r = jax.lax.psum(_rbar(M_l, zeros_k, w, m, l, dY, dq, dh), "spot")
        P_loc = jnp.exp(M_l - m) / l
        logP = M_l - m - jnp.log(l)
        return P_loc * ((logP + 1.0) - r)

    dM = _shard_map(
        run, mesh, in_specs=(P("cell", "spot"),), out_specs=P("cell", "spot")
    )(M0)
    np.testing.assert_allclose(np.asarray(dM), np.asarray(truth), atol=1e-6)


def test_mesh_through_public_api(rng):
    """map_cells_to_space(mesh=...) trains sharded and matches single-device,
    for both the plain and the constrained mapper."""
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

    # target_count above n_cells keeps the |Σσ(F) − target| kink out of the
    # trajectory (see test_fused_sharded_constrained_matches_single_device)
    kwargs = dict(mode="constrained", target_count=200, num_epochs=25,
                  random_state=42, verbose=False, density_prior="uniform")
    mc_mesh = tg.map_cells_to_space(ad_sc, ad_sp, mesh=mesh, **kwargs)
    mc_single = tg.map_cells_to_space(ad_sc, ad_sp, **kwargs)
    np.testing.assert_allclose(mc_mesh.X, mc_single.X, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(mc_mesh.obs["F_out"]), np.asarray(mc_single.obs["F_out"]),
        atol=2e-3,
    )


def test_fused_sharded_l1_l2_matches_single_device(rng):
    """Raw-logit L1/L2 penalties ride the 1-D fused path (norm sums psum'd
    from the carried rowstats)."""
    M0, data = make_problem(rng)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_l1=0.01, lambda_l2=0.005)
    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=cell_mesh(8))
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=5e-3)


def test_fused_sharded_2d_l1_l2_matches_single_device(rng):
    """L1/L2 logit penalties on the 2-D block mesh == single device: the
    kernels' PAD_GUARD keeps the −1e30 spot-pad sentinels out of the norm
    sums/gradients (shapes here don't divide either mesh axis)."""
    M0, data = make_problem(rng, c=30, s=42)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_l1=0.01,
                     lambda_l2=0.005)
    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2d = Mesh(devs, axis_names=("cell", "spot"))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=mesh2d)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=5e-3)
    for key in ("l1_reg", "l2_reg"):
        np.testing.assert_allclose(
            np.asarray(h_sh[key]), np.asarray(h_ref[key]),
            rtol=2e-4, atol=2e-5,
        )


def test_fused_sharded_2d_spatial_and_ct(rng):
    """Spot-graph regularizers + ct islands on the 2-D mesh: the full
    epilogue runs on the gathered projection and must match single-device.
    The islands graph is weak (see the clusters-mode test) so the hinge
    penalty is nonzero and a dropped term would be caught."""
    c, s, g = 30, 42, 8
    M0, data = make_problem(rng, c=c, s=s, g=g)
    W = (rng.random((s, s)) * (rng.random((s, s)) < 0.3)).astype(np.float32)
    W_islands = (0.05 * rng.random((s, s)) * (rng.random((s, s)) < 0.05)).astype(np.float32)
    ct = np.zeros((c, 3), np.float32)
    ct[np.arange(c), rng.integers(0, 3, c)] = 1
    lw = LossWeights(
        lambda_g1=1.0, lambda_d=1.0, lambda_neighborhood_g1=0.4,
        lambda_ct_islands=0.5, lambda_moran=0.3,
    )
    from tangram_tpu.ops.losses import spatial_local_indicators

    _, moran_ref, _ = spatial_local_indicators(data.G, jnp.asarray(W), lw)
    data = data._replace(
        voxel_weights=jnp.asarray(W),
        neighborhood_filter=jnp.asarray(W_islands),
        ct_encode=jnp.asarray(ct),
        spatial_weights=jnp.asarray(W),
        moran_ref=moran_ref,
    )
    p_ref, h_ref = fit_mapping(M0, data, lw, 12, 0.1, impl="pallas", fused=True)
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2d = Mesh(devs, axis_names=("cell", "spot"))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 12, 0.1, mesh=mesh2d)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=3e-4, atol=3e-5,
    )
    assert float(np.asarray(h_ref["ct_island_penalty"])[0]) > 1e-4
    np.testing.assert_allclose(
        np.asarray(h_sh["ct_island_penalty"]),
        np.asarray(h_ref["ct_island_penalty"]), rtol=3e-4, atol=2e-6,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=5e-3)


def test_fused_sharded_2d_constrained(rng):
    """(M, F) constrained training on the 2-D block mesh == single device."""
    c, s = 30, 42
    M0, data = make_problem(rng, c=c, s=s)
    data = data._replace(target_count=jnp.float32(200.0))
    F0 = jnp.asarray(rng.normal(size=c), jnp.float32)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_count=1.0,
                     lambda_f_reg=1.0)
    p_ref, h_ref = fit_mapping((M0, F0), data, lw, 15, 0.1, constrained=True,
                               impl="pallas", fused=True)
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2d = Mesh(devs, axis_names=("cell", "spot"))
    (M_sh, F_sh), h_sh = fit_mapping_fused_sharded(
        (M0, F0), data, lw, 15, 0.1, mesh=mesh2d
    )
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=3e-4, atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(M_sh, axis=1)),
        np.asarray(jax.nn.softmax(p_ref[0], axis=1)), atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(F_sh)),
        np.asarray(jax.nn.sigmoid(p_ref[1])), atol=2e-3,
    )


@pytest.mark.parametrize("mesh_kind", ["1d", "2d"])
def test_fused_sharded_resume_opt_state(rng, mesh_kind):
    """Two chunked sharded runs with carried opt_state == one full run."""
    M0, data = make_problem(rng, c=30, s=42)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    if mesh_kind == "1d":
        mesh = cell_mesh(8)
    else:
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                    axis_names=("cell", "spot"))

    p_full, h_full = fit_mapping_fused_sharded(M0, data, lw, 16, 0.1, mesh=mesh)
    p1, opt1, _ = fit_mapping_fused_sharded(
        M0, data, lw, 8, 0.1, mesh=mesh, return_opt_state=True
    )
    # round-trip through host numpy, as a checkpoint would
    opt1 = {k: np.asarray(jax.device_get(v)) for k, v in opt1.items()}
    p2, h2 = fit_mapping_fused_sharded(
        np.asarray(jax.device_get(p1)), data, lw, 8, 0.1, mesh=mesh,
        opt_state=opt1,
    )
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_full), atol=1e-6)


def test_fused_sharded_constrained_resume(rng):
    c, s = 30, 42
    M0, data = make_problem(rng, c=c, s=s)
    data = data._replace(target_count=jnp.float32(200.0))
    F0 = jnp.asarray(rng.normal(size=c), jnp.float32)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_count=1.0,
                     lambda_f_reg=1.0)
    mesh = cell_mesh(8)
    (Mf, Ff), _ = fit_mapping_fused_sharded((M0, F0), data, lw, 16, 0.1, mesh=mesh)
    (M1, F1), opt1, _ = fit_mapping_fused_sharded(
        (M0, F0), data, lw, 8, 0.1, mesh=mesh, return_opt_state=True
    )
    opt1 = {k: np.asarray(jax.device_get(v)) for k, v in opt1.items()}
    (M2, F2), _ = fit_mapping_fused_sharded(
        (np.asarray(jax.device_get(M1)), np.asarray(jax.device_get(F1))),
        data, lw, 8, 0.1, mesh=mesh, opt_state=opt1,
    )
    np.testing.assert_allclose(np.asarray(M2), np.asarray(Mf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(F2), np.asarray(Ff), atol=1e-6)


@pytest.mark.parametrize("mesh_kind", ["1d", "2d"])
def test_mesh_with_val_matches_single_device(rng, mesh_kind):
    """Mapper.train(mesh=..., val_each=...) — the fused sharded val forward
    (projection from the carried post-step stats) must match single-device
    training including the validation history, on both mesh layouts."""
    from tangram_tpu.models.mapper import Mapper

    c, s, g = 32, 24, 10
    S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
    if mesh_kind == "1d":
        mesh = cell_mesh(8)
    else:
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    axis_names=("cell", "spot"))

    m_mesh = Mapper(S=S, G=G, random_state=3, mesh=mesh)
    out_mesh, hist_mesh = m_mesh.train(num_epochs=20, learning_rate=0.1,
                                       print_each=None, val_each=5)
    m_single = Mapper(S=S, G=G, random_state=3)
    out_single, hist_single = m_single.train(num_epochs=20, learning_rate=0.1,
                                             print_each=None, val_each=5)
    np.testing.assert_allclose(out_mesh, out_single, atol=5e-4)
    for k in ("val_gene_sim", "val_sp_sparsity_weighted_sim", "val_entropy"):
        np.testing.assert_allclose(
            np.asarray(hist_mesh[k]), np.asarray(hist_single[k]), atol=5e-4,
        )
    assert len(hist_mesh["val_gene_sim"]) == 4


def test_gspmd_sharded_with_val(rng):
    """fit_mapping_sharded's in-scan validation (the GSPMD path used for
    non-cell meshes) matches the unsharded val history."""
    from tangram_tpu.models.mapper import fit_mapping
    from tangram_tpu.parallel import fit_mapping_sharded

    c, s = 32, 24
    M0, data = make_problem(rng, c=c, s=s)
    val_data = MapperData(S=data.S[:, :4], G=data.G[:, :4])
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    kw = dict(with_val=True, val_data=val_data, val_each=5)
    p_ref, h_ref = fit_mapping(M0, data, lw, 20, 0.1, impl="xla", **kw)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                axis_names=("cell", "spot"))
    p_sh, h_sh = fit_mapping_sharded(M0, data, lw, 20, 0.1, mesh=mesh, **kw)
    mask = np.isfinite(np.asarray(h_ref["val_gene_sim"]))
    np.testing.assert_allclose(
        np.asarray(h_sh["val_gene_sim"])[mask],
        np.asarray(h_ref["val_gene_sim"])[mask], atol=5e-4,
    )


def test_gspmd_constrained(rng):
    """fit_mapping_sharded with (M, F) params (the GSPMD constrained path)
    matches the unsharded optax trajectory."""
    from tangram_tpu.parallel import fit_mapping_sharded

    c, s = 32, 24
    M0, data = make_problem(rng, c=c, s=s)
    data = data._replace(target_count=jnp.float32(200.0))
    F0 = jnp.asarray(rng.normal(size=c), jnp.float32)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_count=1.0,
                     lambda_f_reg=1.0)
    p_ref, h_ref = fit_mapping((M0, F0), data, lw, 15, 0.1, constrained=True,
                               impl="xla")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                axis_names=("cell", "spot"))
    p_sh, h_sh = fit_mapping_sharded((M0, F0), data, lw, 15, 0.1, mesh=mesh,
                                     constrained=True)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh[0]), np.asarray(p_ref[0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(p_sh[1]), np.asarray(p_ref[1]), atol=2e-3)


def test_fused_sharded_with_neighbor_graph(rng):
    """Structured NeighborGraph regularizers (transpose-VJP gathers) ride the
    1-D fused mesh path: graph leaves replicate through the data pytree."""
    import pandas as pd

    import tangram_tpu as tg
    from tangram_tpu.ops.losses import spatial_local_indicators
    from tangram_tpu.spatial import neighbor_graph, spatial_neighbors

    c, s, g = 32, 40, 8
    M0, data = make_problem(rng, c=c, s=s, g=g)
    ad_sp = tg.AnnData(X=np.ones((s, 1), np.float32))
    ad_sp.obsm["spatial"] = rng.random((s, 2))
    spatial_neighbors(ad_sp, n_neighs=4)
    voxel_graph = neighbor_graph(ad_sp, standardized=True, self_inclusion=True)
    autocorr_graph = neighbor_graph(ad_sp, standardized=True, self_inclusion=False)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_neighborhood_g1=0.4,
                     lambda_geary=0.3)
    _, _, geary_ref = spatial_local_indicators(data.G, autocorr_graph, lw)
    data = data._replace(
        voxel_weights=voxel_graph, spatial_weights=autocorr_graph,
        geary_ref=jnp.asarray(geary_ref),
    )
    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=cell_mesh(8))
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=5e-3)


def test_gspmd_shardings_tolerate_missing_axes(rng):
    """mapping_shardings degrades absent mesh axis names to replication, so
    GSPMD training works on meshes without 'cell'/'spot' axes (e.g. a pure
    data-parallel mesh handed to MapperConstrained)."""
    from tangram_tpu.parallel import fit_mapping_sharded

    c, s = 24, 16
    M0, data = make_problem(rng, c=c, s=s)
    data = data._replace(target_count=jnp.float32(100.0))
    F0 = jnp.asarray(rng.normal(size=c), jnp.float32)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_count=1.0,
                     lambda_f_reg=1.0)
    p_ref, h_ref = fit_mapping((M0, F0), data, lw, 10, 0.1, constrained=True,
                               impl="xla")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(-1), axis_names=("data",))
    p_sh, h_sh = fit_mapping_sharded((M0, F0), data, lw, 10, 0.1, mesh=mesh,
                                     constrained=True)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh[0]), np.asarray(p_ref[0]), atol=2e-3)


def test_mapper_routes_2d_l1_l2_to_fused_path(rng):
    """Mapper.train on a 2-D mesh with L1/L2 penalties uses the fused path
    (no stale GSPMD fallback) and matches single-device training."""
    from tangram_tpu.models.mapper import Mapper

    c, s, g = 30, 42, 8
    S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                axis_names=("cell", "spot"))
    kwargs = dict(lambda_l1=0.01, lambda_l2=0.005, random_state=7)
    out_mesh, h_mesh = Mapper(S=S, G=G, mesh=mesh, **kwargs).train(
        num_epochs=15, learning_rate=0.1, print_each=None)
    out_single, h_single = Mapper(S=S, G=G, **kwargs).train(
        num_epochs=15, learning_rate=0.1, print_each=None)
    np.testing.assert_allclose(out_mesh, out_single, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(h_mesh["total_loss"]), np.asarray(h_single["total_loss"]),
        rtol=2e-4, atol=2e-5,
    )


@pytest.mark.parametrize("seed", range(6))
def test_fused_sharded_fuzz(rng, seed):
    """Randomized shapes × mesh layouts × loss configurations: every sharded
    run must match single-device fused training. Shapes are drawn NOT to
    divide the mesh most of the time, so the padding/masking machinery is
    always in play."""
    frng = np.random.default_rng(500 + seed)
    c = int(frng.integers(9, 70))
    s = int(frng.integers(9, 60))
    g = int(frng.integers(4, 14))
    layout = frng.choice(["1d", "2d"])
    if layout == "1d":
        n = int(frng.choice([2, 3, 4, 8]))
        mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(-1),
                    axis_names=("cell",))
    else:
        shape = [(2, 2), (4, 2), (2, 4), (2, 3)][int(frng.integers(0, 4))]
        mesh = Mesh(np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape),
                    axis_names=("cell", "spot"))

    M0, data = make_problem(rng, c=c, s=s, g=g)
    lw_kwargs = dict(lambda_g1=1.0)
    if frng.random() < 0.7:
        lw_kwargs["lambda_d"] = float(frng.uniform(0.2, 1.5))
    else:
        data = data._replace(d=None)
    if frng.random() < 0.5:
        lw_kwargs["lambda_g2"] = float(frng.uniform(0.1, 1.0))
    if frng.random() < 0.4:
        lw_kwargs["lambda_l1"] = float(frng.uniform(0.001, 0.02))
    if frng.random() < 0.4:
        lw_kwargs["lambda_l2"] = float(frng.uniform(0.001, 0.01))
    if frng.random() < 0.4:
        W = (0.05 * frng.random((s, s)) * (frng.random((s, s)) < 0.1)).astype(
            np.float32)
        ct = np.zeros((c, 3), np.float32)
        ct[np.arange(c), frng.integers(0, 3, c)] = 1
        data = data._replace(ct_encode=jnp.asarray(ct),
                             neighborhood_filter=jnp.asarray(W))
        lw_kwargs["lambda_ct_islands"] = float(frng.uniform(0.1, 0.6))
    lw = LossWeights(**lw_kwargs)

    epochs = 8
    p_ref, h_ref = fit_mapping(M0, data, lw, epochs, 0.1, impl="pallas",
                               fused=True)
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, epochs, 0.1,
                                           mesh=mesh)
    msg = f"c={c} s={s} g={g} mesh={dict(mesh.shape)} lw={lw_kwargs}"
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=3e-4, atol=3e-5, err_msg=msg,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                               atol=5e-3, err_msg=msg)


@pytest.mark.parametrize("mesh_kind", ["1d", "2d"])
def test_donated_run_matches(rng, mesh_kind):
    """donate=True (training-state buffers handed to the computation) does
    not change the math, for both plain and constrained params."""
    M0, data = make_problem(rng, c=32, s=24)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    if mesh_kind == "1d":
        mesh = cell_mesh(8)
    else:
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    axis_names=("cell", "spot"))
    p_ref, h_ref = fit_mapping_fused_sharded(M0, data, lw, 12, 0.1, mesh=mesh)
    p_don, h_don = fit_mapping_fused_sharded(
        jnp.array(M0), data, lw, 12, 0.1, mesh=mesh, donate=True
    )
    np.testing.assert_allclose(np.asarray(p_don), np.asarray(p_ref), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h_don["total_loss"]), np.asarray(h_ref["total_loss"]),
        atol=1e-6,
    )

    F0 = jnp.asarray(rng.normal(0, 1, (M0.shape[0],)).astype(np.float32))
    datac = data._replace(target_count=jnp.float32(10.0))
    lwc = LossWeights(lambda_g1=1.0, lambda_count=1.0, lambda_f_reg=1.0)
    (Mr, Fr), _ = fit_mapping_fused_sharded(
        (jnp.array(M0), jnp.array(F0)), datac, lwc, 8, 0.1, mesh=mesh
    )
    (Md, Fd), _ = fit_mapping_fused_sharded(
        (jnp.array(M0), jnp.array(F0)), datac, lwc, 8, 0.1, mesh=mesh,
        donate=True,
    )
    np.testing.assert_allclose(np.asarray(Md), np.asarray(Mr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Fd), np.asarray(Fr), atol=1e-6)


@pytest.mark.parametrize("mesh_kind", ["1d", "2d"])
def test_constrained_sharded_nonunit_lambdas(rng, mesh_kind):
    """Regression: the direct F gradient through the count/f_reg/density
    reductions must be exact on the sharded paths. The epilogue's F psums
    used to sit inside the vjp, where shard_map's psum transpose (under
    check_vma=False) is not the true adjoint — with non-unit lambda_count
    plus a density prior (and worse with cell padding), F silently diverged
    by O(1) within a few epochs (found by scripts/fuzz_paths.py)."""
    c, s, g = 9, 42, 15  # c=9 on 8 shards: heavy cell padding
    S = (rng.gamma(2.0, 1.0, (c, g)) + 0.05).astype(np.float32)
    G = (rng.gamma(3.0, 1.0, (s, g)) + 0.05).astype(np.float32)
    d = rng.random(s).astype(np.float32)
    d /= d.sum()
    M0 = rng.normal(0, 1, (c, s)).astype(np.float32)
    F0 = rng.normal(0, 1, (c,)).astype(np.float32)
    lw = LossWeights(lambda_g1=0.515, lambda_d=1.0, lambda_r=2.3e-4,
                     lambda_count=0.265, lambda_f_reg=1.032)
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d),
                      target_count=jnp.float32(30.0))
    (Mx, Fx), hx = fit_mapping((jnp.asarray(M0), jnp.asarray(F0)), data, lw,
                               8, 0.1, impl="xla", constrained=True)
    if mesh_kind == "1d":
        mesh = cell_mesh(8)
    else:
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    axis_names=("cell", "spot"))
    (Ms, Fs), hs = fit_mapping_fused_sharded((M0, F0), data, lw, 8, 0.1,
                                             mesh=mesh)
    np.testing.assert_allclose(np.asarray(Fs), np.asarray(Fx), atol=5e-5)
    np.testing.assert_allclose(np.asarray(Ms), np.asarray(Mx), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(hs["total_loss"]), np.asarray(hx["total_loss"]), atol=5e-5
    )


def test_fused_sharded_multislice_matches_single_device(rng):
    """("slice", "cell") mesh — the 2-slice pod composition: cells shard
    over slices × chips-per-slice, every psum runs over the product axis
    (in-slice ICI reduce + cross-slice DCN reduce, inserted by XLA)."""
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_r=0.01)
    M0, data = make_problem(rng, c=50, s=24, g=10)  # 50 cells: pads to 56
    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                axis_names=("slice", "cell"))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=mesh)

    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)


def test_fused_sharded_multislice_constrained(rng):
    """Constrained (M, F) over the ("slice", "cell") mesh."""
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_count=1.0,
                     lambda_f_reg=1.0)
    M0, data = make_problem(rng, c=48, s=20, g=8)
    data = data._replace(target_count=jnp.float32(15.0))
    F0 = jnp.asarray(np.random.default_rng(3).normal(size=48), jnp.float32)

    p_ref, h_ref = fit_mapping((M0, F0), data, lw, 12, 0.1, constrained=True,
                               impl="pallas", fused=True)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                axis_names=("slice", "cell"))
    p_sh, h_sh = fit_mapping_fused_sharded((M0, F0), data, lw, 12, 0.1,
                                           mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    for a, b in zip(p_sh, p_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_fused_sharded_multislice_2d_matches_single_device(rng):
    """("slice", "cell", "spot") mesh — the 2-D block layout across a
    2-slice pod (cells shard over the slice×cell product axis, spots within
    slices): the one envelope edge round 4 left unimplemented. Cell AND
    spot counts chosen to NOT divide their shards, so the padding paths are
    exercised too."""
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_r=0.01)
    M0, data = make_problem(rng, c=50, s=21, g=10)  # pads: 50→52 cells, 21→22 spots
    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                axis_names=("slice", "cell", "spot"))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 15, 0.1, mesh=mesh)

    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)


def test_fused_sharded_multislice_2d_constrained(rng):
    """Constrained (M, F) over the ("slice", "cell", "spot") mesh."""
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_count=1.0,
                     lambda_f_reg=1.0)
    M0, data = make_problem(rng, c=48, s=20, g=8)
    data = data._replace(target_count=jnp.float32(15.0))
    F0 = jnp.asarray(np.random.default_rng(3).normal(size=48), jnp.float32)

    p_ref, h_ref = fit_mapping((M0, F0), data, lw, 12, 0.1, constrained=True,
                               impl="pallas", fused=True)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                axis_names=("slice", "cell", "spot"))
    p_sh, h_sh = fit_mapping_fused_sharded((M0, F0), data, lw, 12, 0.1,
                                           mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    for a, b in zip(p_sh, p_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_fused_sharded_multislice_2d_l1_l2_and_val(rng):
    """L1/L2 norm psums (whole-mesh scalar reductions) and the val-metric
    collectives both run over the slice×cell product axis."""
    lw = LossWeights(lambda_g1=1.0, lambda_l1=0.01, lambda_l2=0.005)
    M0, data = make_problem(rng, c=40, s=20, g=10, with_d=False)
    val = MapperData(S=data.S, G=data.G)
    p_ref, h_ref = fit_mapping(M0, data, lw, 10, 0.1, impl="pallas",
                               fused=True, with_val=True, val_data=val,
                               val_each=5)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                axis_names=("slice", "cell", "spot"))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 10, 0.1, mesh=mesh,
                                           val_data=val, val_each=5)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        rtol=1e-4, atol=1e-5,
    )
    vg = np.asarray(h_sh["val_gene_sim"])
    vg_ref = np.asarray(h_ref["val_gene_sim"])
    np.testing.assert_allclose(
        vg[~np.isnan(vg)], vg_ref[~np.isnan(vg_ref)], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)
