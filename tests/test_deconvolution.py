"""Deconvolution chain tests (C11): segmentation dataframe → per-spot
counts → segment-level assignment, plus misc utils (read_pickle,
NeighborGraph parity, spatial_weights semantics)."""

import gzip
import pickle

import numpy as np
import pandas as pd
import pytest

import tangram_tpu as tg


@pytest.fixture
def deconv_setup(rng):
    """Mapped pair with image-feature segmentation annotations."""
    n_cells, n_spots, n_genes = 30, 8, 12
    S = (rng.poisson(2.0, (n_cells, n_genes)) + 1).astype(np.float32)
    G = (rng.poisson(2.0, (n_spots, n_genes)) + 1).astype(np.float32)
    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame(
            {"cell_type": pd.Categorical(rng.choice(["a", "b"], n_cells))},
            index=[f"c{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp = tg.AnnData(
        X=G,
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n_spots)]),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp.obsm["spatial"] = rng.random((n_spots, 2)) * 100

    # squidpy-style image features: per-spot segmentation label count +
    # centroid list
    seg_labels = rng.integers(1, 5, n_spots)
    centroids = [
        [tuple(rng.random(2) * 100) for _ in range(n)] for n in seg_labels
    ]
    ad_sp.obsm["image_features"] = pd.DataFrame(
        {
            "segmentation_label": seg_labels,
            "segmentation_centroid": pd.Series(centroids, index=ad_sp.obs.index),
        },
        index=ad_sp.obs.index,
    )

    tg.pp_adatas(ad_sc, ad_sp)
    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, mode="cells", num_epochs=20, random_state=0, verbose=False
    )
    return ad_sc, ad_sp, ad_map


def test_create_segment_cell_df(deconv_setup):
    _, ad_sp, _ = deconv_setup
    tg.create_segment_cell_df(ad_sp)
    seg = ad_sp.uns["tangram_cell_segmentation"]
    assert set(["spot_idx", "y", "x", "centroids"]).issubset(seg.columns)
    total_objects = int(ad_sp.obsm["image_features"]["segmentation_label"].sum())
    assert len(seg) == total_objects
    assert "tangram_spot_centroids" in ad_sp.obsm


def test_create_segment_requires_image_features(rng):
    ad_sp = tg.AnnData(X=np.ones((3, 2)))
    with pytest.raises(ValueError, match="image_features"):
        tg.create_segment_cell_df(ad_sp)


def test_count_cell_annotations(deconv_setup):
    ad_sc, ad_sp, ad_map = deconv_setup
    tg.create_segment_cell_df(ad_sp)
    tg.count_cell_annotations(ad_map, ad_sc, ad_sp, annotation="cell_type")
    df = ad_sp.obsm["tangram_ct_count"]
    assert set(["x", "y", "cell_n", "centroids", "a", "b"]).issubset(df.columns)
    # every cell lands in exactly one spot
    assert df[["a", "b"]].to_numpy().sum() == ad_sc.n_obs


def test_count_cell_annotations_with_filter(deconv_setup):
    ad_sc, ad_sp, ad_map = deconv_setup
    tg.create_segment_cell_df(ad_sp)
    ad_map.obs["F_out"] = np.linspace(0, 1, ad_map.n_obs)
    tg.count_cell_annotations(ad_map, ad_sc, ad_sp, annotation="cell_type", threshold=0.5)
    df = ad_sp.obsm["tangram_ct_count"]
    kept = int((ad_map.obs["F_out"] > 0.5).sum())
    assert df[["a", "b"]].to_numpy().sum() == kept


def test_deconvolve_cell_annotations(deconv_setup):
    ad_sc, ad_sp, ad_map = deconv_setup
    tg.create_segment_cell_df(ad_sp)
    tg.project_cell_annotations(ad_map, ad_sp, annotation="cell_type")
    tg.count_cell_annotations(ad_map, ad_sc, ad_sp, annotation="cell_type")
    adata_segment = tg.deconvolve_cell_annotations(ad_sp)
    assert "cluster" in adata_segment.obs.columns
    assert "centroids" in adata_segment.obs.columns
    assert adata_segment.obsm["spatial"].shape[1] == 2
    assert set(adata_segment.obs["cluster"]).issubset({"a", "b"})


def test_df_to_cell_types():
    df = pd.DataFrame(
        {
            "a": [2, 0],
            "b": [1, 1],
            "centroids": [
                np.array(["c0", "c1", "c2"], dtype=object),
                np.array(["c3"], dtype=object),
            ],
        }
    )
    out = tg.df_to_cell_types(df, ["a", "b"])
    assert out["a"] == ["c0", "c1"]
    assert out["b"] == ["c2", "c3"]


# --- misc utils ---


def test_read_pickle_plain_and_gzip(tmp_path):
    obj = {"x": [1, 2, 3]}
    plain = tmp_path / "o.pkl"
    with open(plain, "wb") as f:
        pickle.dump(obj, f)
    gz = tmp_path / "o.pkl.gz"
    with gzip.open(gz, "wb") as f:
        pickle.dump(obj, f)
    assert tg.read_pickle(plain) == obj
    assert tg.read_pickle(gz) == obj


def test_neighbor_graph_matches_dense(rng):
    """NeighborGraph W@X must equal the dense spatial_weights product."""
    import jax.numpy as jnp

    from tangram_tpu.ops.core import graph_matmul
    from tangram_tpu.spatial import neighbor_graph, spatial_neighbors, spatial_weights

    n = 25
    ad_sp = tg.AnnData(X=np.ones((n, 3), np.float32))
    ad_sp.obsm["spatial"] = rng.random((n, 2))
    spatial_neighbors(ad_sp)

    X = rng.normal(size=(n, 4)).astype(np.float32)
    for std, incl in [(True, True), (False, False), (True, False), (False, True)]:
        W_dense = spatial_weights(ad_sp, standardized=std, self_inclusion=incl)
        graph = neighbor_graph(ad_sp, standardized=std, self_inclusion=incl)
        want = W_dense @ X
        got = np.asarray(graph_matmul(graph, jnp.asarray(X)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"std={std} incl={incl}")
        # row/col sums used by the streamed Geary identity
        np.testing.assert_allclose(np.asarray(graph.row_sums()), W_dense.sum(1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(graph.col_sums()), W_dense.sum(0), rtol=1e-5)


def test_neighbor_graph_max_neighbors_truncation(rng):
    """When max_neighbors actually truncates, each row keeps its
    largest-|weight| edges (the self edge keeps its reserved slot), a
    warning reports the dropped count, and the product matches the
    manually-truncated dense matrix."""
    import warnings

    import jax.numpy as jnp

    from tangram_tpu.ops.core import graph_matmul
    from tangram_tpu.spatial import neighbor_graph, sparse_weights, spatial_neighbors

    n = 30
    ad_sp = tg.AnnData(X=np.ones((n, 3), np.float32))
    ad_sp.obsm["spatial"] = rng.random((n, 2))
    spatial_neighbors(ad_sp)
    W = sparse_weights(ad_sp, standardized=True)  # distinct weights
    nnz = np.diff(W.indptr)
    X = rng.normal(size=(n, 4)).astype(np.float32)

    for incl in (False, True):
        cap = int(nnz.max()) - 2 + (1 if incl else 0)  # forces truncation
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            graph = neighbor_graph(
                ad_sp, standardized=True, self_inclusion=incl,
                max_neighbors=cap,
            )
        assert any("drops" in str(w.message) for w in rec)
        # expected: per-row top-(cap - incl) by |weight|, then +I if incl
        k_edges = cap - 1 if incl else cap
        Wd = W.toarray()
        expect = np.zeros_like(Wd)
        for i in range(n):
            cols = np.nonzero(Wd[i])[0]
            order = np.argsort(-np.abs(Wd[i, cols]), kind="stable")
            keep = cols[order[:k_edges]]
            expect[i, keep] = Wd[i, keep]
        if incl:
            expect[np.diag_indices(n)] += 1.0
        got = np.asarray(graph_matmul(graph, jnp.asarray(X)))
        np.testing.assert_allclose(got, expect @ X, rtol=1e-5, atol=1e-6,
                                   err_msg=f"incl={incl}")

    # an uncapped build must not warn
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        neighbor_graph(ad_sp, standardized=True, self_inclusion=True,
                       max_neighbors=int(nnz.max()) + 1)
    assert not [w for w in rec if "drops" in str(w.message)]

    # a cap that leaves no room for edges beside the self slot is an error
    with pytest.raises(ValueError, match="no room"):
        neighbor_graph(ad_sp, standardized=True, self_inclusion=True,
                       max_neighbors=1)


def test_spatial_weights_semantics(rng):
    """Standardized weights = row-L1-normalized distances on the
    connectivity pattern; self-inclusion adds I after normalization."""
    from tangram_tpu.spatial import spatial_neighbors, spatial_weights

    n = 12
    ad_sp = tg.AnnData(X=np.ones((n, 3), np.float32))
    ad_sp.obsm["spatial"] = rng.random((n, 2))
    spatial_neighbors(ad_sp, n_neighs=3)

    W = spatial_weights(ad_sp, standardized=True, self_inclusion=False)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, rtol=1e-9)

    W_incl = spatial_weights(ad_sp, standardized=True, self_inclusion=True)
    np.testing.assert_allclose(W_incl.sum(axis=1), 2.0, rtol=1e-9)
    np.testing.assert_allclose(np.diag(W_incl), 1.0)

    W_bin = spatial_weights(ad_sp, standardized=False, self_inclusion=False)
    assert set(np.unique(W_bin)).issubset({0.0, 1.0})
    assert np.diag(W_bin).sum() == 0


def test_knn_graph_format_in_mapping(rng):
    """map_cells_to_space(graph_format='knn') runs the regularized path with
    structured graphs and matches the dense-path result."""
    n_cells, n_spots, n_genes = 20, 15, 10
    S = (rng.poisson(2.0, (n_cells, n_genes)) + 1).astype(np.float32)
    G = (rng.poisson(2.0, (n_spots, n_genes)) + 1).astype(np.float32)
    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame(
            {"ct": pd.Categorical(rng.choice(["a", "b"], n_cells))},
            index=[f"c{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp = tg.AnnData(X=G, var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]))
    ad_sp.obsm["spatial"] = rng.random((n_spots, 2))
    tg.pp_adatas(ad_sc, ad_sp)

    kwargs = dict(
        mode="cells", cluster_label="ct", num_epochs=25, random_state=7,
        verbose=False, lambda_neighborhood_g1=0.5, lambda_ct_islands=0.5,
        lambda_getis_ord=0.3, density_prior="uniform",
    )
    m_dense = tg.map_cells_to_space(ad_sc, ad_sp, graph_format="dense", **kwargs)
    m_knn = tg.map_cells_to_space(ad_sc, ad_sp, graph_format="knn", **kwargs)
    np.testing.assert_allclose(m_knn.X, m_dense.X, rtol=1e-3, atol=1e-5)


def test_delaunay_spatial_neighbors(rng):
    from tangram_tpu.spatial import spatial_neighbors

    n = 30
    ad_sp = tg.AnnData(X=np.ones((n, 3), np.float32))
    ad_sp.obsm["spatial"] = rng.random((n, 2))
    spatial_neighbors(ad_sp, delaunay=True)
    conn = ad_sp.obsp["spatial_connectivities"]
    dists = ad_sp.obsp["spatial_distances"]
    assert conn.shape == (n, n)
    assert conn.nnz > 0 and dists.nnz == conn.nnz
    # Delaunay adjacency is symmetric
    assert (conn != conn.T).nnz == 0
    assert conn.diagonal().sum() == 0


def test_spatial_neighbors_duplicate_coords_no_self_loop(rng):
    """With duplicated spot coordinates, the kNN graph must still drop the
    self-edge by identity (not by column position) and keep real neighbors."""
    from tangram_tpu.spatial import spatial_neighbors

    n = 12
    coords = rng.random((n, 2))
    coords[6] = coords[3]  # exact duplicate pair
    coords[9] = coords[3]  # triplicate
    ad_sp = tg.AnnData(X=np.ones((n, 3), np.float32))
    ad_sp.obsm["spatial"] = coords
    spatial_neighbors(ad_sp, n_neighs=4)
    conn = ad_sp.obsp["spatial_connectivities"]
    assert conn.diagonal().sum() == 0
    # every row keeps its full neighbor budget
    assert (np.asarray(conn.sum(axis=1)).ravel() >= 4).all()


def test_graph_matmul_transpose_vjp(rng):
    """The transpose-graph custom VJP must equal autodiff through the dense
    product, for both value and gradient."""
    import jax
    import jax.numpy as jnp

    from tangram_tpu.ops.core import graph_matmul, neighbor_graph_from_dense

    s, g = 18, 5
    W = (rng.random((s, s)) * (rng.random((s, s)) < 0.3)).astype(np.float32)
    X = rng.normal(size=(s, g)).astype(np.float32)
    graph = neighbor_graph_from_dense(W)
    assert graph.t_indices is not None

    np.testing.assert_allclose(
        np.asarray(graph_matmul(graph, jnp.asarray(X))), W @ X,
        rtol=1e-5, atol=1e-6,
    )

    def loss_graph(X):
        return jnp.sum(jnp.sin(graph_matmul(graph, X)))

    def loss_dense(X):
        return jnp.sum(jnp.sin(jnp.asarray(W) @ X))

    g_graph = jax.grad(loss_graph)(jnp.asarray(X))
    g_dense = jax.grad(loss_dense)(jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(g_graph), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-6)
    # col_sums now reads the transpose arrays
    np.testing.assert_allclose(np.asarray(graph.col_sums()), W.sum(0), rtol=1e-5)
