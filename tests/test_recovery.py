"""Functional recovery: the mapper must actually solve the placement
problem, not just match the reference numerically.

Synthetic ground truth: cell types with distinct expression programs and a
spatially smooth type composition per spot. After mapping, the transferred
annotation probabilities must correlate with the true per-spot composition,
and held-out genes must be predicted well — the end-to-end claim the whole
framework exists for.
"""

import numpy as np
import pandas as pd
import pytest

import tangram_tpu as tg


@pytest.fixture(scope="module")
def ground_truth():
    rng = np.random.default_rng(1)
    n_types, n_genes = 5, 120
    n_cells, n_spots = 300, 150

    programs = rng.lognormal(0.0, 1.2, (n_types, n_genes))
    cell_types = rng.integers(0, n_types, n_cells)
    S = rng.poisson(programs[cell_types] * 2.0).astype(np.float32)

    # spot composition: each type concentrated around its own center
    coords = rng.random((n_spots, 2))
    centers = rng.random((n_types, 2))
    dist2 = ((coords[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    composition = np.exp(-dist2 / 0.05)
    composition /= composition.sum(1, keepdims=True)  # (spots, types)
    G = rng.poisson(composition @ programs * 6.0).astype(np.float32)

    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame(
            {"cell_type": pd.Categorical([f"t{t}" for t in cell_types])},
            index=[f"c{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp = tg.AnnData(
        X=G,
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n_spots)]),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp.obsm["spatial"] = coords
    tg.pp_adatas(ad_sc, ad_sp)
    return ad_sc, ad_sp, composition


def test_mapping_recovers_spot_composition(ground_truth):
    ad_sc, ad_sp, composition = ground_truth
    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, mode="cells", density_prior="rna_count_based",
        num_epochs=400, random_state=0, verbose=False,
    )
    tg.project_cell_annotations(ad_map, ad_sp, annotation="cell_type")
    pred = ad_sp.obsm["tangram_ct_pred"]
    pred = pred[[f"t{t}" for t in range(composition.shape[1])]].to_numpy()

    # per-type correlation between predicted intensity and true composition
    corrs = [
        np.corrcoef(pred[:, t], composition[:, t])[0, 1]
        for t in range(composition.shape[1])
    ]
    assert min(corrs) > 0.6, corrs
    assert float(np.mean(corrs)) > 0.8, corrs


def test_held_out_genes_predicted(ground_truth):
    """LOO-style holdout: train without a gene subset, project it, and
    demand good cosine agreement with the measured expression."""
    ad_sc, ad_sp, _ = ground_truth
    genes = list(ad_sc.uns["training_genes"])
    held_out = genes[::10]
    train_genes = [g for g in genes if g not in held_out]

    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, cv_train_genes=train_genes, mode="cells",
        density_prior="rna_count_based", num_epochs=400, random_state=0,
        verbose=False,
    )
    ad_ge = tg.project_genes(ad_map, ad_sc)
    df = tg.compare_spatial_geneexp(ad_ge, ad_sp, ad_sc)
    held_scores = df.loc[held_out, "score"]
    assert float(held_scores.mean()) > 0.8, held_scores.describe()
