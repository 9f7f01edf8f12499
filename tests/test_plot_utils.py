"""Plotting-suite smoke tests: every public plot function renders on the
Agg backend without error and produces sane artifacts."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

import tangram_tpu as tg
from tangram_tpu import plot_utils as pu


@pytest.fixture
def mapped(rng):
    n_cells, n_spots, n_genes = 40, 30, 15
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
    coords = rng.random((n_spots, 2))
    ad_sp = tg.AnnData(
        X=G,
        obs=pd.DataFrame(
            {"x": coords[:, 0], "y": coords[:, 1]},
            index=[f"s{i}" for i in range(n_spots)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp.obsm["spatial"] = coords
    tg.pp_adatas(ad_sc, ad_sp)
    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, mode="cells", num_epochs=20, random_state=0, verbose=False
    )
    # spot coordinates live in the map's var (spatial obs)
    ad_map.var["x"] = coords[:, 0]
    ad_map.var["y"] = coords[:, 1]
    return ad_sc, ad_sp, ad_map


def teardown_function(_):
    plt.close("all")


def test_q_value(rng):
    data = rng.random(100)
    vmin, vmax = pu.q_value(data, 5)
    assert vmin < vmax


def test_ordered_predictions():
    xs, ys, vs = pu.ordered_predictions([1, 2, 3], [4, 5, 6], [0.3, 0.1, 0.2])
    assert vs == sorted(vs)
    assert xs == [2, 3, 1]


def test_plot_training_scores(mapped):
    _, _, ad_map = mapped
    pu.plot_training_scores(ad_map)


def test_plot_cell_annotation(mapped):
    _, ad_sp, ad_map = mapped
    pu.plot_cell_annotation(ad_map, ad_sp, annotation="cell_type", nrows=1, ncols=2)


def test_plot_cell_annotation_sc(mapped):
    _, ad_sp, ad_map = mapped
    tg.project_cell_annotations(ad_map, ad_sp, annotation="cell_type")
    pu.plot_cell_annotation_sc(ad_sp, ["a", "b"], spot_size=30, scale_factor=1.0)


def test_plot_genes_and_quick(mapped):
    ad_sc, ad_sp, ad_map = mapped
    ad_ge = tg.project_genes(ad_map, ad_sc)
    ad_ge.obs["x"] = ad_sp.obs["x"].to_numpy()
    ad_ge.obs["y"] = ad_sp.obs["y"].to_numpy()
    genes = list(ad_sc.uns["training_genes"])[:2]
    pu.plot_genes(genes, ad_sp, ad_ge)
    pu.quick_plot_gene(genes[0], ad_sp)


def test_plot_genes_log_measured_panel_autoscales(mapped):
    """With log=True, the measured panel's color range must follow the
    log1p values (reference leaves it unclamped); a raw-value clamp would
    collapse logged counts into the bottom of the colormap."""
    ad_sc, ad_sp, ad_map = mapped
    ad_ge = tg.project_genes(ad_map, ad_sc)
    ad_ge.obs["x"] = ad_sp.obs["x"].to_numpy()
    ad_ge.obs["y"] = ad_sp.obs["y"].to_numpy()
    gene = list(ad_sc.uns["training_genes"])[0]
    fig = pu.plot_genes([gene], ad_sp, ad_ge, log=True)
    fig.canvas.draw()
    measured_ax = fig.axes[0]
    vals = np.log1p(np.asarray(ad_sp[:, gene].X).ravel())
    vmin, vmax = measured_ax.collections[0].get_clim()
    assert vmax == pytest.approx(vals.max())
    assert vmin == pytest.approx(vals.min())


def test_plot_genes_sc(mapped):
    ad_sc, ad_sp, ad_map = mapped
    ad_ge = tg.project_genes(ad_map, ad_sc)
    genes = list(ad_sc.uns["training_genes"])[:2]
    fig = pu.plot_genes_sc(
        genes, ad_sp, ad_ge, spot_size=30, scale_factor=1.0, return_figure=True
    )
    assert fig is not None


def test_plot_annotation_entropy(mapped):
    _, _, ad_map = mapped
    pu.plot_annotation_entropy(ad_map, annotation="cell_type")


def test_plot_test_scores_and_auc(mapped):
    ad_sc, ad_sp, ad_map = mapped
    ad_ge = tg.project_genes(ad_map, ad_sc)
    df = tg.compare_spatial_geneexp(ad_ge, ad_sp, ad_sc)
    pu.plot_test_scores(df.assign(is_training=False))
    pu.plot_auc(df.assign(is_training=False))


def test_plot_test_scores_missing_columns():
    with pytest.raises(ValueError, match="missing columns"):
        pu.plot_test_scores(pd.DataFrame({"score": [0.5]}))


def test_robust_perc_validation(mapped):
    _, ad_sp, ad_map = mapped
    with pytest.raises(ValueError):
        pu.plot_cell_annotation(ad_map, ad_sp, annotation="cell_type", robust=True, perc=0)
    with pytest.raises(ValueError):
        pu.quick_plot_gene("g0", ad_sp, robust=False, perc=5)


def test_mapping_colors_table():
    assert "L6 CT" in pu.mapping_colors
    assert len(pu.mapping_colors) == 27
