"""AnnData-lite container and h5ad IO tests."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from tangram_tpu.adlite import AnnData, filter_genes, read_h5ad, write_h5ad


def make_adata(rng):
    X = rng.poisson(1.0, (6, 5)).astype(np.float32)
    obs = pd.DataFrame(
        {"celltype": pd.Categorical(["a", "b", "a", "c", "b", "a"]), "depth": np.arange(6)},
        index=[f"cell{i}" for i in range(6)],
    )
    var = pd.DataFrame({"hv": [True, False, True, False, True]},
                       index=[f"g{i}" for i in range(5)])
    ad = AnnData(X=X, obs=obs, var=var)
    ad.uns["training_genes"] = ["g0", "g2"]
    ad.uns["meta"] = {"alpha": 1.5, "name": "test"}
    ad.obsm["spatial"] = rng.random((6, 2))
    ad.obsp["graph"] = sp.random(6, 6, density=0.4, format="csr")
    ad.layers["counts"] = X.copy()
    return ad


def test_basic_attributes(rng):
    ad = make_adata(rng)
    assert ad.shape == (6, 5)
    assert ad.n_obs == 6 and ad.n_vars == 5
    assert list(ad.var_names) == [f"g{i}" for i in range(5)]


def test_var_subset_by_name(rng):
    ad = make_adata(rng)
    sub = ad[:, ["g1", "g3"]]
    assert sub.shape == (6, 2)
    np.testing.assert_array_equal(sub.X, ad.X[:, [1, 3]])
    assert list(sub.var_names) == ["g1", "g3"]


def test_obs_subset_by_bool(rng):
    ad = make_adata(rng)
    mask = ad.obs["celltype"] == "a"
    sub = ad[mask]
    assert sub.n_obs == 3
    np.testing.assert_array_equal(sub.X, ad.X[np.asarray(mask)])
    assert sub.obsm["spatial"].shape == (3, 2)


def test_var_names_make_unique():
    ad = AnnData(X=np.zeros((1, 3)), var=pd.DataFrame(index=["a", "a", "b"]))
    ad.var_names_make_unique()
    assert list(ad.var_names) == ["a", "a-1", "b"]


def test_filter_genes(rng):
    X = rng.poisson(1.0, (6, 5)).astype(np.float32)
    X[:, 2] = 0
    ad = AnnData(X=X)
    filter_genes(ad, min_cells=1)
    assert ad.n_vars == 4
    assert (np.asarray(ad.X) != 0).sum(axis=0).min() >= 1


def test_filter_genes_sparse(rng):
    X = rng.poisson(0.5, (10, 8)).astype(np.float32)
    X[:, 3] = 0
    ad = AnnData(X=sp.csr_matrix(X))
    filter_genes(ad, min_cells=1)
    assert ad.n_vars < 8
    assert np.asarray((ad.X != 0).sum(axis=0)).min() >= 1


def test_h5ad_roundtrip(rng, tmp_path):
    ad = make_adata(rng)
    path = tmp_path / "x.h5ad"
    write_h5ad(path, ad)
    back = read_h5ad(path)

    np.testing.assert_allclose(np.asarray(back.X), np.asarray(ad.X))
    assert list(back.obs.index) == list(ad.obs.index)
    assert list(back.obs["celltype"]) == list(ad.obs["celltype"])
    assert list(back.var.index) == list(ad.var.index)
    assert list(back.uns["training_genes"]) == ["g0", "g2"]
    assert back.uns["meta"]["alpha"] == 1.5
    assert back.uns["meta"]["name"] == "test"
    np.testing.assert_allclose(back.obsm["spatial"], ad.obsm["spatial"])
    assert sp.issparse(back.obsp["graph"])
    np.testing.assert_allclose(
        back.obsp["graph"].toarray(), ad.obsp["graph"].toarray()
    )
    np.testing.assert_allclose(np.asarray(back.layers["counts"]), np.asarray(ad.X))


def test_h5ad_sparse_X_roundtrip(rng, tmp_path):
    X = sp.random(20, 10, density=0.3, format="csr", dtype=np.float32)
    ad = AnnData(X=X)
    path = tmp_path / "sparse.h5ad"
    ad.write_h5ad(path)
    back = read_h5ad(path)
    assert sp.issparse(back.X)
    np.testing.assert_allclose(back.X.toarray(), X.toarray())


def test_copy_is_deep(rng):
    ad = make_adata(rng)
    cp = ad.copy()
    cp.X[0, 0] = 99
    cp.obs.iloc[0, 1] = -1
    assert ad.X[0, 0] != 99
    assert ad.obs.iloc[0, 1] != -1


def test_missing_obs_name_raises(rng):
    ad = make_adata(rng)
    with pytest.raises(KeyError, match="obs names not found"):
        ad[["nope"]]


def test_integer_scalar_indexing(rng):
    ad = make_adata(rng)
    sub = ad[2]
    assert sub.n_obs == 1
    np.testing.assert_array_equal(np.asarray(sub.X)[0], np.asarray(ad.X)[2])
    sub2 = ad[:, 3]
    assert sub2.n_vars == 1
