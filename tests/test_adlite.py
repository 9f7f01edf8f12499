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


@pytest.mark.parametrize("seed", range(6))
def test_h5ad_roundtrip_randomized(seed, tmp_path):
    """Property-style round-trip over random container structures: dense
    f32/f64 and CSR/CSC X, numeric/string/categorical/bool obs columns,
    nested uns (scalars, strings, arrays, string lists), random
    obsm/varm/obsp/layers presence."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 15))
    m = int(rng.integers(2, 12))
    dense = rng.poisson(1.0, (n, m)).astype(
        np.float64 if rng.random() < 0.3 else np.float32
    )
    xkind = rng.choice(["dense", "csr", "csc"])
    X = {"dense": dense,
         "csr": sp.csr_matrix(dense),
         "csc": sp.csc_matrix(dense)}[xkind]
    obs = pd.DataFrame(index=[f"cell-{i}" for i in range(n)])
    if rng.random() < 0.8:
        obs["f"] = rng.random(n)
    if rng.random() < 0.8:
        obs["i"] = rng.integers(0, 5, n)
    if rng.random() < 0.8:
        obs["s"] = [f"s{int(v)}" for v in rng.integers(0, 3, n)]
    if rng.random() < 0.8:
        obs["cat"] = pd.Categorical(rng.choice(["a", "b", "c"], n))
    if rng.random() < 0.5:
        obs["flag"] = rng.random(n) < 0.5
    var = pd.DataFrame(index=[f"gene_{j}" for j in range(m)])
    if rng.random() < 0.5:
        var["score"] = rng.random(m)
    ad = AnnData(X=X, obs=obs, var=var)
    ad.uns["nested"] = {
        "alpha": float(rng.random()),
        "count": int(rng.integers(0, 100)),
        "name": "trial",
        "arr": rng.random(4),
        "genes": [f"gene_{j}" for j in range(min(3, m))],
        "inner": {"k": 2},
    }
    if rng.random() < 0.7:
        ad.obsm["spatial"] = rng.random((n, 2))
    if rng.random() < 0.5:
        ad.varm["pcs"] = rng.random((m, 3))
    if rng.random() < 0.7:
        ad.obsp["graph"] = sp.random(n, n, density=0.4, format="csr")
    if rng.random() < 0.5:
        ad.layers["counts"] = dense.copy()

    path = tmp_path / f"rt{seed}.h5ad"
    ad.write_h5ad(path)
    back = read_h5ad(path)

    def as_dense(v):
        return v.toarray() if sp.issparse(v) else np.asarray(v)

    np.testing.assert_allclose(as_dense(back.X), dense)
    assert sp.issparse(back.X) == sp.issparse(X)
    assert list(back.obs.index) == list(ad.obs.index)
    assert list(back.var.index) == list(ad.var.index)
    assert list(back.obs.columns) == list(ad.obs.columns)
    for col in obs.columns:
        np.testing.assert_array_equal(
            np.asarray(back.obs[col]), np.asarray(ad.obs[col]),
            err_msg=f"obs[{col}]",
        )
    for col in var.columns:
        np.testing.assert_array_equal(
            np.asarray(back.var[col]), np.asarray(ad.var[col]))
    nested = back.uns["nested"]
    assert nested["alpha"] == pytest.approx(ad.uns["nested"]["alpha"])
    assert int(nested["count"]) == ad.uns["nested"]["count"]
    assert nested["name"] == "trial"
    np.testing.assert_allclose(
        np.asarray(nested["arr"]), ad.uns["nested"]["arr"])
    assert list(nested["genes"]) == ad.uns["nested"]["genes"]
    assert int(nested["inner"]["k"]) == 2
    for grp in ("obsm", "varm", "obsp", "layers"):
        ours, theirs = getattr(ad, grp), getattr(back, grp)
        assert set(ours.keys()) == set(theirs.keys()), grp
        for k in ours:
            np.testing.assert_allclose(
                as_dense(theirs[k]), as_dense(ours[k]), err_msg=f"{grp}[{k}]"
            )


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
