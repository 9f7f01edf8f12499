"""Visium hex-grid neighbor graphs (``coord_type="grid"``).

The reference's ``pp_adatas`` calls ``squidpy.gr.spatial_neighbors``
(``mapping_utils.py:100``), which auto-selects grid adjacency for Visium
data (library metadata in ``uns["spatial"]``): 6-neighbor hex-lattice
connectivity where border spots keep their true lattice degree. These tests
pin that behavior on a hand-built hex lattice.
"""

import numpy as np
import pandas as pd
import pytest

from tangram_tpu import adlite
from tangram_tpu.spatial import spatial_neighbors


def hex_lattice(n_rows, n_cols, pitch=1.0):
    """Row-staggered hexagonal lattice (the Visium array layout): every
    interior spot has exactly 6 equidistant neighbors at ``pitch``."""
    coords = []
    for r in range(n_rows):
        for c in range(n_cols):
            x = (c + 0.5 * (r % 2)) * pitch
            y = r * (np.sqrt(3.0) / 2.0) * pitch
            coords.append((x, y))
    return np.asarray(coords, dtype=np.float64)


def make_adata(coords, visium_metadata=False):
    n = coords.shape[0]
    ad = adlite.AnnData(
        X=np.ones((n, 2), np.float32),
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n)]),
    )
    ad.obsm["spatial"] = coords
    if visium_metadata:
        ad.uns["spatial"] = {"library_1": {"images": {}, "scalefactors": {}}}
    return ad


def degrees(ad):
    return np.asarray(ad.obsp["spatial_connectivities"].sum(axis=1)).ravel()


def test_hex_lattice_adjacency():
    """Interior spots have exactly their 6 hex neighbors; corners/edges keep
    their true lattice degree (no second-ring back-fill)."""
    coords = hex_lattice(5, 6, pitch=2.5)
    ad = make_adata(coords)
    spatial_neighbors(ad, coord_type="grid")
    deg = degrees(ad)

    n_rows, n_cols = 5, 6
    idx = lambda r, c: r * n_cols + c  # noqa: E731

    # interior spot: all 6 hex neighbors, and exactly those
    r, c = 2, 3
    conn = ad.obsp["spatial_connectivities"].tocsr()
    nbrs = set(conn[idx(r, c)].indices)
    # even row (r=2): same-row ±1; row above/below at columns c-1 and c
    expected = {
        idx(2, 2), idx(2, 4),
        idx(1, 2), idx(1, 3),
        idx(3, 2), idx(3, 3),
    }
    assert nbrs == expected
    assert deg[idx(r, c)] == 6

    # corner (0,0) on an even row: right neighbor + two in row 1 → degree 2
    corner = set(conn[idx(0, 0)].indices)
    assert corner == {idx(0, 1), idx(1, 0)}

    # no edge longer than the lattice pitch survives
    coo = conn.tocoo()
    dists = np.linalg.norm(coords[coo.row] - coords[coo.col], axis=1)
    assert np.all(dists <= 2.5 * 1.01)

    # distances matrix carries the ring index (squidpy grid semantics)
    assert np.all(ad.obsp["spatial_distances"].data == 1.0)


def test_grid_vs_generic_on_borders():
    """Generic KNN back-fills border spots to exactly n_neighs neighbors
    from the second ring; grid mode must not."""
    coords = hex_lattice(4, 4)
    ad_gen = make_adata(coords)
    spatial_neighbors(ad_gen, coord_type="generic")
    ad_grid = make_adata(coords)
    spatial_neighbors(ad_grid, coord_type="grid")

    deg_gen = degrees(ad_gen)
    deg_grid = degrees(ad_grid)
    assert deg_gen.max() >= 6  # KNN always hands out n_neighs per spot
    assert deg_grid.min() < 6  # borders keep their true lattice degree
    assert deg_grid.max() == 6
    # grid edges are a subset of some KNN graph's: every one is first-ring
    assert (deg_grid <= deg_gen).all()


def test_auto_selects_grid_with_visium_metadata():
    """coord_type=None picks grid iff uns['spatial'] metadata is present,
    like squidpy's auto selection."""
    coords = hex_lattice(4, 5)
    ad_visium = make_adata(coords, visium_metadata=True)
    spatial_neighbors(ad_visium)  # auto
    ad_plain = make_adata(coords)
    spatial_neighbors(ad_plain)  # auto → generic

    # grid: border spots below 6; generic: everyone gets exactly 6
    assert degrees(ad_visium).min() < 6
    assert np.all(degrees(ad_plain) == 6)


def test_pp_adatas_auto_grid():
    """pp_adatas on a Visium-like AnnData builds the hex-grid graph."""
    from tangram_tpu.mapping import pp_adatas

    rng = np.random.default_rng(0)
    coords = hex_lattice(4, 5)
    n = coords.shape[0]
    genes = [f"g{i}" for i in range(6)]
    ad_sp = adlite.AnnData(
        X=rng.poisson(3.0, (n, len(genes))).astype(np.float32) + 1.0,
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n)]),
        var=pd.DataFrame(index=genes),
    )
    ad_sp.obsm["spatial"] = coords
    ad_sp.uns["spatial"] = {"library_1": {}}
    ad_sc = adlite.AnnData(
        X=rng.poisson(2.0, (7, len(genes))).astype(np.float32) + 1.0,
        obs=pd.DataFrame(index=[f"c{i}" for i in range(7)]),
        var=pd.DataFrame(index=genes),
    )
    pp_adatas(ad_sc, ad_sp, genes=None)
    assert "spatial_connectivities" in ad_sp.obsp
    deg = degrees(ad_sp)
    assert deg.max() == 6 and deg.min() < 6  # hex lattice, true border degree


def test_grid_graph_is_symmetric():
    coords = hex_lattice(5, 5)
    ad = make_adata(coords)
    spatial_neighbors(ad, coord_type="grid")
    conn = ad.obsp["spatial_connectivities"]
    assert (conn != conn.T).nnz == 0


def test_mapping_with_spatial_regularizers_on_grid_graph():
    """End-to-end: pp_adatas auto-builds the hex-grid graph and
    map_cells_to_space consumes it through every spatial regularizer."""
    from tangram_tpu.mapping import map_cells_to_space, pp_adatas

    rng = np.random.default_rng(1)
    coords = hex_lattice(5, 5)
    n = coords.shape[0]
    genes = [f"g{i}" for i in range(8)]
    ad_sp = adlite.AnnData(
        X=rng.poisson(3.0, (n, len(genes))).astype(np.float32) + 1.0,
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n)]),
        var=pd.DataFrame(index=genes),
    )
    ad_sp.obsm["spatial"] = coords
    ad_sp.uns["spatial"] = {"lib": {}}
    n_cells = 18
    ad_sc = adlite.AnnData(
        X=rng.poisson(2.0, (n_cells, len(genes))).astype(np.float32) + 1.0,
        obs=pd.DataFrame(
            {"subclass_label": pd.Categorical(rng.choice(["a", "b"], n_cells))},
            index=[f"c{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=genes),
    )
    pp_adatas(ad_sc, ad_sp)
    assert degrees(ad_sp).min() < 6  # the hex graph, not generic KNN

    ad_map = map_cells_to_space(
        ad_sc, ad_sp,
        mode="cells",
        density_prior="uniform",
        num_epochs=15,
        random_state=1,
        lambda_neighborhood_g1=0.5,
        lambda_ct_islands=0.3,
        lambda_getis_ord=0.2,
        lambda_moran=0.2,
        lambda_geary=0.2,
        cluster_label="subclass_label",
        verbose=False,
    )
    np.testing.assert_allclose(np.asarray(ad_map.X).sum(axis=1), 1.0,
                               rtol=1e-5)
    hist = ad_map.uns["training_history"]
    assert np.isfinite(hist["main_loss"]).all()


# --- squidpy parameter surface: radius / percentile / n_rings ---


def test_n_rings_two_ring_hex():
    coords = hex_lattice(9, 9)
    ad = make_adata(coords, visium_metadata=True)
    spatial_neighbors(ad, n_rings=2)
    conn = ad.obsp["spatial_connectivities"]
    dists = ad.obsp["spatial_distances"]
    # interior spot: 6 first-ring + 12 second-ring neighbors
    center = 4 * 9 + 4
    assert conn[center].nnz == 18
    row = dists[center].toarray().ravel()
    assert (row == 1.0).sum() == 6
    assert (row == 2.0).sum() == 12
    # ring index, not euclidean distance
    assert set(np.unique(dists.data)) <= {1.0, 2.0}


def test_n_rings_one_matches_default():
    coords = hex_lattice(6, 6)
    ad1 = make_adata(coords, visium_metadata=True)
    ad2 = make_adata(coords, visium_metadata=True)
    spatial_neighbors(ad1)
    spatial_neighbors(ad2, n_rings=1)
    assert (ad1.obsp["spatial_connectivities"]
            != ad2.obsp["spatial_connectivities"]).nnz == 0


def test_radius_float_generic():
    rng = np.random.default_rng(0)
    coords = rng.random((60, 2)) * 10
    ad = make_adata(coords)
    spatial_neighbors(ad, radius=2.5, coord_type="generic")
    dists = ad.obsp["spatial_distances"]
    assert dists.nnz > 0
    assert dists.data.max() <= 2.5
    assert dists.diagonal().sum() == 0  # no self-edges
    # symmetric by construction (fixed-radius is a symmetric relation)
    assert (dists != dists.T).nnz == 0


def test_radius_interval_prunes_knn():
    rng = np.random.default_rng(1)
    coords = rng.random((60, 2)) * 10
    ad_all = make_adata(coords)
    spatial_neighbors(ad_all, n_neighs=6, coord_type="generic")
    d_all = ad_all.obsp["spatial_distances"]
    lo, hi = 0.5, 1.5
    ad = make_adata(coords)
    spatial_neighbors(ad, n_neighs=6, coord_type="generic", radius=(lo, hi))
    d = ad.obsp["spatial_distances"]
    assert d.nnz < d_all.nnz
    assert d.data.min() >= lo and d.data.max() <= hi


def test_percentile_prunes_longest_edges():
    rng = np.random.default_rng(2)
    coords = rng.random((80, 2)) * 10
    ad_all = make_adata(coords)
    spatial_neighbors(ad_all, n_neighs=6, coord_type="generic")
    ad = make_adata(coords)
    spatial_neighbors(ad, n_neighs=6, coord_type="generic", percentile=50.0)
    d_all = ad_all.obsp["spatial_distances"]
    d = ad.obsp["spatial_distances"]
    assert d.nnz <= d_all.nnz * 0.55
    assert d.data.max() <= np.percentile(d_all.data, 50.0) + 1e-12


def test_parameter_validation():
    coords = hex_lattice(4, 4)
    ad = make_adata(coords, visium_metadata=True)
    with pytest.raises(ValueError):
        spatial_neighbors(ad, percentile=50.0)  # grid auto-selected
    with pytest.raises(ValueError):
        spatial_neighbors(ad, radius=1.0)
    ad2 = make_adata(coords)
    with pytest.raises(ValueError):
        spatial_neighbors(ad2, coord_type="generic", n_rings=2)


def test_delaunay_percentile_prunes_long_edges():
    """squidpy documents percentile as the Delaunay companion: it must prune
    long triangulation (border/hull) edges, not be silently ignored."""
    rng = np.random.default_rng(3)
    coords = rng.random((80, 2)) * 10
    ad_all = make_adata(coords)
    spatial_neighbors(ad_all, coord_type="generic", delaunay=True)
    d_all = ad_all.obsp["spatial_distances"]
    ad = make_adata(coords)
    spatial_neighbors(ad, coord_type="generic", delaunay=True,
                      percentile=50.0)
    d = ad.obsp["spatial_distances"]
    assert d.nnz < d_all.nnz
    assert d.data.max() <= np.percentile(d_all.data, 50.0) + 1e-12


def test_delaunay_radius_interval_prunes():
    rng = np.random.default_rng(4)
    coords = rng.random((60, 2)) * 10
    ad = make_adata(coords)
    spatial_neighbors(ad, coord_type="generic", delaunay=True,
                      radius=(0.3, 1.2))
    d = ad.obsp["spatial_distances"]
    assert d.nnz > 0
    assert d.data.min() >= 0.3 and d.data.max() <= 1.2


def test_delaunay_rejects_scalar_radius():
    coords = np.random.default_rng(5).random((30, 2)) * 10
    ad = make_adata(coords)
    with pytest.raises(ValueError, match="scalar radius"):
        spatial_neighbors(ad, coord_type="generic", delaunay=True, radius=1.0)
