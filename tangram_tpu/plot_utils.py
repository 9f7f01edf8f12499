"""Plotting suite: training diagnostics, spatial maps, and evaluation curves.

Mirrors the 13 public plotting functions of the reference ``plot_utils.py``.
The reference delegates spatial rendering to ``scanpy.pl.spatial``
(``plot_utils.py:208-211, 404-428``); since the core framework carries no
scanpy dependency, an internal matplotlib renderer (:func:`_spatial_scatter`)
draws ``obsm['spatial']`` scatter maps with the same knobs (spot_size,
scale_factor, optional background image from ``uns['spatial']``), and scanpy
is used instead when it happens to be installed.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import scipy.sparse as sp

from . import utils as ut

__all__ = [
    "q_value",
    "plot_training_scores",
    "plot_gene_sparsity",
    "ordered_predictions",
    "convert_adata_array",
    "construct_obs_plot",
    "plot_cell_annotation_sc",
    "plot_cell_annotation",
    "plot_genes_sc",
    "plot_genes",
    "quick_plot_gene",
    "plot_annotation_entropy",
    "plot_test_scores",
    "plot_auc",
    "mapping_colors",
]


def _plt():
    import matplotlib.pyplot as plt

    return plt


def q_value(data, perc):
    """(vmin, vmax) colormap range from symmetric percentiles
    (reference ``plot_utils.py:22-36``)."""
    vmin = np.nanpercentile(data, perc)
    vmax = np.nanpercentile(data, 100 - perc)
    return vmin, vmax


def plot_training_scores(adata_map, bins=10, alpha=0.7):
    """4-panel training diagnosis: score histogram + score-vs-sparsity
    scatters (reference ``plot_utils.py:39-94``)."""
    import seaborn as sns

    plt = _plt()
    fig, axs = plt.subplots(1, 4, figsize=(12, 3), sharey=True)
    df = adata_map.uns["train_genes_df"]
    axs_f = axs.flatten()

    axs_f[0].set_ylim([0.0, 1.0])
    for i in range(1, len(axs_f)):
        axs_f[i].set_xlim([0.0, 1.0])
        axs_f[i].set_ylim([0.0, 1.0])

    sns.histplot(data=df, y="train_score", bins=bins, ax=axs_f[0], color="coral")
    for ax, col, title in [
        (axs_f[1], "sparsity_sc", "score vs sparsity (single cells)"),
        (axs_f[2], "sparsity_sp", "score vs sparsity (spatial)"),
        (axs_f[3], "sparsity_diff", "score vs sparsity (sp - sc)"),
    ]:
        ax.set_title(title)
        sns.scatterplot(
            data=df, y="train_score", x=col, ax=ax, alpha=alpha, color="coral"
        )
    plt.tight_layout()
    return fig


def plot_gene_sparsity(adata_1, adata_2, xlabel="adata_1", ylabel="adata_2", genes=None, s=1):
    """Scatter of per-gene sparsity between two AnnDatas
    (reference ``plot_utils.py:97-129``)."""
    from .mapping import pp_adatas

    plt = _plt()
    logging.info("Pre-processing AnnDatas...")
    pp_adatas(adata_1, adata_2, genes=genes)
    assert adata_1.uns["training_genes"] == adata_2.uns["training_genes"]
    training_genes = adata_1.uns["training_genes"]

    logging.info("Annotating sparsity...")
    ut.annotate_gene_sparsity(adata_1)
    ut.annotate_gene_sparsity(adata_2)
    xs = adata_1[:, training_genes].var["sparsity"].values
    ys = adata_2[:, training_genes].var["sparsity"].values
    fig, ax = plt.subplots(1, 1)
    ax.set_aspect(1)
    ax.set_xlabel("sparsity (" + xlabel + ")")
    ax.set_ylabel("sparsity (" + ylabel + ")")
    ax.set_title(f"Gene sparsity ({len(xs)} genes)")
    ax.scatter(xs, ys, s=s, marker="x")
    return fig


def ordered_predictions(xs, ys, preds, reverse=False):
    """Sort (x, y, value) triples by value so strong signal plots on top
    (reference ``plot_utils.py:132-155``)."""
    assert len(xs) == len(ys) == len(preds)
    order = np.argsort(np.asarray(preds))
    if reverse:
        order = order[::-1]
    xs = np.asarray(xs)[order]
    ys = np.asarray(ys)[order]
    preds = np.asarray(preds)[order]
    return list(xs), list(ys), list(preds)


def convert_adata_array(adata):
    if sp.issparse(adata.X) or hasattr(adata.X, "toarray"):
        adata.X = adata.X.toarray()


def construct_obs_plot(df_plot, adata, perc=0, suffix=None):
    """Clip to percentiles, min-max normalize, and append to ``obs``
    (reference ``plot_utils.py:163-172``)."""
    df_plot = df_plot.clip(df_plot.quantile(perc), df_plot.quantile(1 - perc), axis=1)
    df_plot = (df_plot - df_plot.min()) / (df_plot.max() - df_plot.min())
    if suffix:
        df_plot = df_plot.add_suffix(" ({})".format(suffix))
    adata.obs = pd.concat([adata.obs, df_plot], axis=1)


def _spatial_scatter(
    adata, color, spot_size=None, scale_factor=None, cmap="viridis",
    alpha_img=1.0, bw=False, ax=None, title=None,
):
    """Minimal scanpy.pl.spatial equivalent: scatter obsm['spatial'] colored
    by an obs column, with optional tissue image from uns['spatial']."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()

    coords = np.asarray(adata.obsm["spatial"], dtype=float)
    sf = 1.0
    size = spot_size

    spatial_uns = adata.uns.get("spatial")
    if isinstance(spatial_uns, dict) and spatial_uns:
        lib = next(iter(spatial_uns))
        entry = spatial_uns[lib]
        scalefactors = entry.get("scalefactors", {}) if isinstance(entry, dict) else {}
        sf = scale_factor or scalefactors.get("tissue_hires_scalef", 1.0)
        if size is None:
            size = scalefactors.get("spot_diameter_fullres", 30.0)
        images = entry.get("images", {}) if isinstance(entry, dict) else {}
        if images:
            img = images.get("hires", next(iter(images.values())))
            img = np.asarray(img)
            if bw:
                img = img.mean(axis=-1)
            ax.imshow(img, alpha=alpha_img, cmap="gray" if bw else None)
    else:
        sf = scale_factor or 1.0
        if size is None:
            size = 30.0

    values = adata.obs[color]
    sc_plot = ax.scatter(
        coords[:, 0] * sf, coords[:, 1] * sf, c=np.asarray(values, dtype=float),
        s=size, cmap=cmap,
    )
    ax.set_title(title or color)
    ax.set_aspect("equal")
    ax.invert_yaxis()
    ax.axis("off")
    plt.colorbar(sc_plot, ax=ax, shrink=0.7)
    return ax


def _have_scanpy():
    try:
        import scanpy  # noqa: F401

        return True
    except ImportError:
        return False


def plot_cell_annotation_sc(
    adata_sp, annotation_list, x="x", y="y", spot_size=None, scale_factor=None,
    perc=0, alpha_img=1.0, bw=False, ax=None,
):
    """Spatial probability maps for transferred annotations
    (reference ``plot_utils.py:175-213``)."""
    plt = _plt()
    adata_sp.obs.drop(annotation_list, inplace=True, errors="ignore", axis=1)

    df = adata_sp.obsm["tangram_ct_pred"][annotation_list]
    construct_obs_plot(df, adata_sp, perc=perc)

    if "spatial" not in adata_sp.obsm:
        coords = [[xx, yy] for xx, yy in zip(adata_sp.obs[x].values, adata_sp.obs[y].values)]
        adata_sp.obsm["spatial"] = np.array(coords)

    if "spatial" not in adata_sp.uns.keys() and spot_size is None and scale_factor is None:
        raise ValueError(
            "Spot Size and Scale Factor cannot be None when ad_sp.uns['spatial'] does not exist"
        )
    if "spatial" in adata_sp.uns.keys() and spot_size is not None and scale_factor is not None:
        raise ValueError(
            "Spot Size and Scale Factor should be None when ad_sp.uns['spatial'] exists"
        )

    if _have_scanpy():
        import scanpy as scp

        scp.pl.spatial(
            adata_sp, color=annotation_list, cmap="viridis", show=False,
            frameon=False, spot_size=spot_size, scale_factor=scale_factor,
            alpha_img=alpha_img, bw=bw, ax=ax,
        )
    else:
        if ax is None:
            _, axs = plt.subplots(1, len(annotation_list), figsize=(4 * len(annotation_list), 4))
            axs = np.atleast_1d(axs)
        else:
            axs = [ax] * len(annotation_list)
        for ann, a in zip(annotation_list, axs):
            _spatial_scatter(
                adata_sp, ann, spot_size=spot_size, scale_factor=scale_factor,
                alpha_img=alpha_img, bw=bw, ax=a,
            )

    adata_sp.obs.drop(annotation_list, inplace=True, errors="ignore", axis=1)


def plot_cell_annotation(
    adata_map, adata_sp, annotation="cell_type", x="x", y="y", nrows=1, ncols=1,
    s=5, cmap="viridis", subtitle_add=False, robust=False, perc=0, invert_y=True,
):
    """Transfer an annotation and plot per-type probability maps
    (reference ``plot_utils.py:216-313``)."""
    import matplotlib as mpl

    plt = _plt()
    if not robust and perc != 0:
        raise ValueError("Arg perc is zero when robust is False.")
    if robust and perc == 0:
        raise ValueError("Arg perc cannot be zero when robust is True.")

    ut.project_cell_annotations(adata_map, adata_sp, annotation=annotation)
    df_annotation = adata_sp.obsm["tangram_ct_pred"]

    fig, ax = plt.subplots(figsize=(4, 0.4))
    fig.subplots_adjust(top=0.5)
    cmap = plt.get_cmap(cmap)
    norm = mpl.colors.Normalize(vmin=0, vmax=1)
    mpl.colorbar.ColorbarBase(
        ax, cmap=cmap, norm=norm, orientation="horizontal", label="Probability"
    )

    if nrows is None or ncols is None:
        ncols = 1
        nrows = len(df_annotation.columns)

    fig, axs = plt.subplots(
        nrows, ncols, figsize=(ncols * 3, nrows * 3), sharex=True, sharey=True
    )
    axs_f = np.atleast_1d(axs).flatten()
    if invert_y:
        axs_f[0].invert_yaxis()
    for a in axs_f:
        a.axis("off")

    if len(df_annotation.columns) > nrows * ncols:
        logging.warning(
            "Number of panels smaller than annotations. Increase `nrows`/`ncols`."
        )

    for ann, index in zip(df_annotation.columns, range(nrows * ncols)):
        xs, ys, preds = ordered_predictions(
            adata_map.var[x], adata_map.var[y], df_annotation[ann]
        )
        vmin, vmax = q_value(preds, perc=perc if robust else 0)
        axs_f[index].scatter(x=xs, y=ys, c=preds, s=s, cmap=cmap, vmin=vmin, vmax=vmax)
        axs_f[index].set_title(ann)
        axs_f[index].set_aspect(1)

    if subtitle_add:
        fig.suptitle(annotation)
    return fig


def plot_genes_sc(
    genes, adata_measured, adata_predicted, x="x", y="y", spot_size=None,
    scale_factor=None, cmap="inferno", perc=0, alpha_img=1.0, bw=False,
    return_figure=False,
):
    """Side-by-side measured vs predicted spatial gene maps
    (reference ``plot_utils.py:316-447``)."""
    from matplotlib.gridspec import GridSpec

    plt = _plt()

    measured_cols = ["{} (measured)".format(g) for g in genes]
    predicted_cols = ["{} (predicted)".format(g) for g in genes]
    adata_measured.obs.drop(measured_cols, inplace=True, errors="ignore", axis=1)
    adata_predicted.obs.drop(predicted_cols, inplace=True, errors="ignore", axis=1)

    convert_adata_array(adata_measured)
    adata_measured.var.index = [g.lower() for g in adata_measured.var.index]
    adata_predicted.var.index = [g.lower() for g in adata_predicted.var.index]
    adata_predicted.obsm = adata_measured.obsm
    adata_predicted.uns = adata_measured.uns

    data = []
    for gene in genes:
        if gene not in adata_measured.var.index:
            data.append(np.zeros_like(np.array(adata_measured[:, 0].X).flatten()))
        else:
            data.append(np.array(adata_measured[:, gene].X).flatten())
    df = pd.DataFrame(
        data=np.array(data).T, columns=genes, index=adata_measured.obs.index
    )
    construct_obs_plot(df, adata_measured, suffix="measured")

    df = pd.DataFrame(
        data=np.array(adata_predicted[:, genes].X),
        columns=genes,
        index=adata_predicted.obs.index,
    )
    construct_obs_plot(df, adata_predicted, perc=perc, suffix="predicted")

    fig = plt.figure(figsize=(7, len(genes) * 3.5))
    gs = GridSpec(len(genes), 2, figure=fig)

    if "spatial" not in adata_measured.obsm.keys():
        for ad in (adata_measured, adata_predicted):
            coords = [[xx, yy] for xx, yy in zip(ad.obs[x].values, ad.obs[y].values)]
            ad.obsm["spatial"] = np.array(coords)

    if ("spatial" not in adata_measured.uns.keys()) and (
        spot_size is None and scale_factor is None
    ):
        raise ValueError(
            "Spot Size and Scale Factor cannot be None when ad_sp.uns['spatial'] does not exist"
        )

    for ix, gene in enumerate(genes):
        ax_m = fig.add_subplot(gs[ix, 0])
        ax_p = fig.add_subplot(gs[ix, 1])
        if _have_scanpy():
            import scanpy as scp

            scp.pl.spatial(
                adata_measured, spot_size=spot_size, scale_factor=scale_factor,
                color=["{} (measured)".format(gene)], frameon=False, ax=ax_m,
                show=False, cmap=cmap, alpha_img=alpha_img, bw=bw,
            )
            scp.pl.spatial(
                adata_predicted, spot_size=spot_size, scale_factor=scale_factor,
                color=["{} (predicted)".format(gene)], frameon=False, ax=ax_p,
                show=False, cmap=cmap, alpha_img=alpha_img, bw=bw,
            )
        else:
            _spatial_scatter(
                adata_measured, "{} (measured)".format(gene), spot_size=spot_size,
                scale_factor=scale_factor, cmap=cmap, alpha_img=alpha_img, bw=bw, ax=ax_m,
            )
            _spatial_scatter(
                adata_predicted, "{} (predicted)".format(gene), spot_size=spot_size,
                scale_factor=scale_factor, cmap=cmap, alpha_img=alpha_img, bw=bw, ax=ax_p,
            )

    adata_measured.obs.drop(measured_cols, inplace=True, errors="ignore", axis=1)
    adata_predicted.obs.drop(predicted_cols, inplace=True, errors="ignore", axis=1)
    if return_figure:
        return fig


def plot_genes(
    genes, adata_measured, adata_predicted, x="x", y="y", s=5, log=False,
    cmap="inferno", robust=False, perc=0, invert_y=True,
):
    """Measured-vs-predicted spatial patterns as raw scatters
    (reference ``plot_utils.py:450-549``)."""
    import matplotlib as mpl

    plt = _plt()
    if not robust and perc != 0:
        raise ValueError("Arg perc is zero when robust is False.")
    if robust and perc == 0:
        raise ValueError("Arg perc cannot be zero when robust is True.")

    convert_adata_array(adata_measured)
    adata_measured.var.index = [g.lower() for g in adata_measured.var.index]
    adata_predicted.var.index = [g.lower() for g in adata_predicted.var.index]

    fig, ax = plt.subplots(figsize=(4, 0.4))
    fig.subplots_adjust(top=0.5)
    cmap = plt.get_cmap(cmap)
    norm = mpl.colors.Normalize(vmin=0, vmax=1)
    mpl.colorbar.ColorbarBase(
        ax, cmap=cmap, norm=norm, orientation="horizontal", label="Expression Level"
    )

    fig, axs = plt.subplots(nrows=len(genes), ncols=2, figsize=(6, len(genes) * 3))
    axs = np.atleast_2d(axs)

    for ix, gene in enumerate(genes):
        if gene not in adata_measured.var.index:
            vs = np.zeros_like(np.array(adata_measured[:, 0].X).flatten())
        else:
            vs = np.array(adata_measured[:, gene].X).flatten()
        xs, ys, vs = ordered_predictions(
            adata_measured.obs[x], adata_measured.obs[y], vs
        )
        if log:
            vs = np.log(1 + np.asarray(vs))
        axs[ix, 0].scatter(xs, ys, c=vs, cmap=cmap, s=s)
        axs[ix, 0].set_title(gene + " (measured)")
        axs[ix, 0].axis("off")
        axs[ix, 0].set_aspect(1)

        xs, ys, vs = ordered_predictions(
            adata_predicted.obs[x],
            adata_predicted.obs[y],
            np.array(adata_predicted[:, gene].X).flatten(),
        )
        vmin, vmax = q_value(vs, perc=perc if robust else 0)
        if log:
            vs = np.log(1 + np.asarray(vs))
        axs[ix, 1].scatter(xs, ys, c=vs, cmap=cmap, s=s, vmin=vmin, vmax=vmax)
        axs[ix, 1].set_title(gene + " (predicted)")
        axs[ix, 1].axis("off")
        axs[ix, 1].set_aspect(1)

        if invert_y:
            axs[ix, 0].invert_yaxis()
            axs[ix, 1].invert_yaxis()
    return fig


def quick_plot_gene(
    gene, adata, x="x", y="y", s=50, log=False, cmap="viridis", robust=False, perc=0
):
    """Single-gene spatial scatter (reference ``plot_utils.py:552-587``)."""
    plt = _plt()
    if not robust and perc != 0:
        raise ValueError("Arg perc is zero when robust is False.")
    if robust and perc == 0:
        raise ValueError("Arg perc cannot be zero when robust is True.")

    xs, ys, vs = ordered_predictions(
        adata.obs[x], adata.obs[y], np.array(adata[:, gene].X).flatten()
    )
    vmin, vmax = q_value(vs, perc=perc if robust else 0)
    if log:
        vs = np.log(1 + np.asarray(vs))
    plt.scatter(xs, ys, c=vs, cmap=cmap, s=s, vmin=vmin, vmax=vmax)


def plot_annotation_entropy(adata_map, annotation="cell_type"):
    """Per-annotation boxplot of mapping-row entropy
    (reference ``plot_utils.py:590-606``)."""
    import seaborn as sns
    from scipy.stats import entropy

    plt = _plt()
    adata_map.obs["entropy"] = entropy(
        adata_map.X, base=adata_map.X.shape[1], axis=1
    )
    fig, ax = plt.subplots(1, 1, figsize=(10, 3))
    ax.set_ylim(0, 1)
    sns.boxenplot(x=annotation, y="entropy", data=adata_map.obs, ax=ax)
    plt.xticks(rotation=30)
    return fig


def plot_test_scores(df_gene_score, bins=10, alpha=0.7):
    """4-panel test-score diagnosis (reference ``plot_utils.py:609-659``)."""
    import seaborn as sns

    plt = _plt()
    if not set(["score", "sparsity_sc", "sparsity_sp", "sparsity_diff"]).issubset(
        set(df_gene_score.columns)
    ):
        raise ValueError(
            "There are missing columns in df_gene_score. Run `compare_spatial_geneexp` "
            "with `adata_ge`, `adata_sp`, and `adata_sc` to produce complete dataframe input."
        )

    if "is_training" in df_gene_score.keys():
        df = df_gene_score[df_gene_score["is_training"] == False].copy()
    else:
        df = df_gene_score.copy()
    df.rename({"score": "test_score"}, axis="columns", inplace=True)

    fig, axs = plt.subplots(1, 4, figsize=(12, 3), sharey=True)
    axs_f = axs.flatten()
    axs_f[0].set_ylim([0.0, 1.0])
    for i in range(1, len(axs_f)):
        axs_f[i].set_xlim([0.0, 1.0])
        axs_f[i].set_ylim([0.0, 1.0])

    sns.histplot(data=df, y="test_score", bins=bins, ax=axs_f[0])
    for ax, col, title in [
        (axs_f[1], "sparsity_sc", "score vs sparsity (single cells)"),
        (axs_f[2], "sparsity_sp", "score vs sparsity (spatial)"),
        (axs_f[3], "sparsity_diff", "score vs sparsity (sp - sc)"),
    ]:
        ax.set_title(title)
        sns.scatterplot(data=df, y="test_score", x=col, ax=ax, alpha=alpha)
    plt.tight_layout()
    return fig


def plot_auc(df_all_genes, test_genes=None):
    """AUC curve of test score vs spatial sparsity
    (reference ``plot_utils.py:662-692``)."""
    import seaborn as sns

    plt = _plt()
    metric_dict, ((pol_xs, pol_ys), (xs, ys)) = ut.eval_metric(df_all_genes, test_genes)

    fig = plt.figure(figsize=(6, 5))
    plt.plot(pol_xs, pol_ys, c="r")
    sns.scatterplot(x=xs, y=ys, alpha=0.5, edgecolors="face")

    plt.xlim([0.0, 1.0])
    plt.ylim([0.0, 1.0])
    plt.gca().set_aspect(0.5)
    plt.xlabel("score")
    plt.ylabel("spatial sparsity")
    plt.tick_params(axis="both", labelsize=8)
    plt.title("Prediction on test transcriptome")

    textstr = "auc_score={}".format(np.round(metric_dict["auc_score"], 3))
    props = dict(boxstyle="round", facecolor="wheat", alpha=0.3)
    plt.text(0.03, 0.1, textstr, fontsize=11, verticalalignment="top", bbox=props)
    return fig


# Manuscript color table for deterministic cell-type color assignment
# (reference ``plot_utils.py:696-724`` — a data table, reproduced verbatim).
mapping_colors = {
    "L6 CT": (0.19215686274509805, 0.5098039215686274, 0.7411764705882353),
    "L6 IT": (0.4196078431372549, 0.6823529411764706, 0.8392156862745098),
    "L5/6 NP": (0.6196078431372549, 0.792156862745098, 0.8823529411764706),
    "L6b": "#0000c2ff",
    "L2/3 IT": (0.9019607843137255, 0.3333333333333333, 0.050980392156862744),
    "L5 IT": (0.19215686274509805, 0.6392156862745098, 0.32941176470588235),
    "L5 ET": (0.4549019607843137, 0.7686274509803922, 0.4627450980392157),
    "Oligo": (0.4588235294117647, 0.4196078431372549, 0.6941176470588235),
    "Vip": (0.6196078431372549, 0.6039215686274509, 0.7843137254901961),
    "Astro": "#ffdd55ff",
    "Micro-PVM": "#000000ff",
    "Pvalb": (0.38823529411764707, 0.38823529411764707, 0.38823529411764707),
    "Lamp5": (0.5882352941176471, 0.5882352941176471, 0.5882352941176471),
    "Sst": (0.7411764705882353, 0.7411764705882353, 0.7411764705882353),
    "Sst Chodl": (0.8509803921568627, 0.8509803921568627, 0.8509803921568627),
    "Sncg": (0.5176470588235295, 0.23529411764705882, 0.2235294117647059),
    "Peri": (0.6784313725490196, 0.28627450980392155, 0.2901960784313726),
    "VLMC": (0.8392156862745098, 0.3803921568627451, 0.4196078431372549),
    "Endo": (0.9058823529411765, 0.5882352941176471, 0.611764705882353),
    "Meis2": "#FFA500ff",
    "SMC": "#000000ff",
    "L6 PT": "#4682B4ff",
    "L5 PT": "#a1ed7bff",
    "L5 NP": "#6B8E23ff",
    "L4": "#d61f1dff",
    "Macrophage": "#2b2d2fff",
    "CR": "#000000ff",
}
