"""End-to-end interop: the public API on REAL ``anndata.AnnData`` objects.

The library's AnnData-facing shell (``mapping.py``, ``evaluation.py``,
``deconv.py``) duck-types its containers so a real ``anndata.AnnData`` works
unchanged (reference contract: AnnData in / AnnData out,
``mapping_utils.py:141``). Locally the suite runs against
:mod:`tangram_tpu.adlite`; this file runs the SAME pipeline parametrized over
both container libraries, so the CI leg that installs ``anndata``
(.github/workflows/test.yml) executes the real-AnnData path end to end, and
any environment without it still executes the shared pipeline via adlite.
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import tangram_tpu as tg


def _make_pair(anndata_mod, rng, sparse=False):
    n_cells, n_spots, n_genes = 40, 25, 30
    genes = [f"Gene{i}" for i in range(n_genes)]
    X_sc = (rng.poisson(2.0, (n_cells, n_genes)) + 1).astype(np.float32)
    X_sp = (rng.poisson(3.0, (n_spots, n_genes)) + 1).astype(np.float32)
    if sparse:
        X_sc = sp.csr_matrix(X_sc)
        X_sp = sp.csr_matrix(X_sp)
    ad_sc = anndata_mod.AnnData(
        X=X_sc,
        obs=pd.DataFrame(
            {"subclass_label": rng.choice(["a", "b", "c"], n_cells)},
            index=[f"cell{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=genes),
    )
    ad_sp = anndata_mod.AnnData(
        X=X_sp,
        obs=pd.DataFrame(index=[f"spot{i}" for i in range(n_spots)]),
        var=pd.DataFrame(index=genes),
    )
    ad_sp.obsm["spatial"] = rng.random((n_spots, 2)).astype(np.float64) * 100
    return ad_sc, ad_sp


@pytest.fixture(params=["adlite", "anndata"])
def anndata_mod(request):
    if request.param == "adlite":
        from tangram_tpu import adlite

        return adlite
    return pytest.importorskip("anndata")


@pytest.mark.parametrize("sparse", [False, True])
def test_pp_map_project_pipeline(anndata_mod, sparse):
    rng = np.random.default_rng(0)
    ad_sc, ad_sp = _make_pair(anndata_mod, rng, sparse=sparse)

    tg.pp_adatas(ad_sc, ad_sp)
    assert list(ad_sc.uns["training_genes"]) == list(ad_sp.uns["training_genes"])
    assert "uniform_density" in ad_sp.obs
    assert "rna_count_based_density" in ad_sp.obs
    assert "spatial_connectivities" in ad_sp.obsp

    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, num_epochs=40, random_state=42, verbose=False,
        density_prior="uniform",
    )
    M = np.asarray(ad_map.X)
    assert M.shape == (ad_sc.X.shape[0], ad_sp.X.shape[0])
    np.testing.assert_allclose(M.sum(axis=1), 1.0, rtol=1e-4)
    assert "train_genes_df" in ad_map.uns
    assert "training_history" in ad_map.uns

    # projection back onto space accepts the real sc AnnData
    ad_ge = tg.project_genes(ad_map, ad_sc)
    assert ad_ge.X.shape == (ad_sp.X.shape[0], ad_sc.X.shape[1])
    assert "is_training" in ad_ge.var

    # annotation transfer writes into the REAL spatial AnnData's obsm
    tg.project_cell_annotations(ad_map, ad_sp, annotation="subclass_label")
    pred = ad_sp.obsm["tangram_ct_pred"]
    assert set(pred.columns) == {"a", "b", "c"}

    df = tg.compare_spatial_geneexp(ad_ge, ad_sp, ad_sc)
    assert "score" in df.columns and len(df) > 0


def test_clusters_mode_and_eval(anndata_mod):
    rng = np.random.default_rng(1)
    ad_sc, ad_sp = _make_pair(anndata_mod, rng)
    tg.pp_adatas(ad_sc, ad_sp)

    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, mode="clusters", cluster_label="subclass_label",
        num_epochs=30, random_state=42, verbose=False,
    )
    assert np.asarray(ad_map.X).shape[0] == ad_sc.obs["subclass_label"].nunique()

    # one k-fold CV step end to end through the real containers
    scores = tg.cross_val(
        ad_sc, ad_sp, mode="clusters", cluster_label="subclass_label",
        cv_mode="10fold", num_epochs=10, random_state=42, verbose=False,
    )
    assert np.isfinite(scores["avg_test_score"])
    assert np.isfinite(scores["avg_train_score"])


def test_constrained_mode(anndata_mod):
    rng = np.random.default_rng(2)
    ad_sc, ad_sp = _make_pair(anndata_mod, rng)
    tg.pp_adatas(ad_sc, ad_sp)
    n_spots = ad_sp.X.shape[0]
    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, mode="constrained", target_count=n_spots,
        lambda_f_reg=1, lambda_count=1, num_epochs=30, random_state=42,
        verbose=False,
    )
    f = np.asarray(ad_map.obs["F_out"])
    assert f.shape == (ad_sc.X.shape[0],)
    assert ((f >= 0) & (f <= 1)).all()


def test_h5ad_roundtrip_readable_by_anndata(tmp_path):
    """adlite-written h5ad must be readable by the real anndata reader."""
    anndata = pytest.importorskip("anndata")
    from tangram_tpu import adlite

    rng = np.random.default_rng(3)
    ad_sc, ad_sp = _make_pair(adlite, rng)
    tg.pp_adatas(ad_sc, ad_sp)
    path = str(tmp_path / "sc.h5ad")
    adlite.write_h5ad(path, ad_sc)
    real = anndata.read_h5ad(path)
    np.testing.assert_allclose(np.asarray(real.X), np.asarray(ad_sc.X))
    assert list(real.var_names) == list(ad_sc.var.index)
    assert list(real.uns["training_genes"]) == list(ad_sc.uns["training_genes"])
