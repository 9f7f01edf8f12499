"""Pre/post-processing, projection, evaluation and cross-validation workflows.

Mirrors the reference ``tangram/utils.py`` public surface. The headline
TPU-native change is :func:`cross_val`: the reference retrains from scratch
per fold in a Python loop (``utils.py:576-600`` — LOO over ~250 genes means
~250 full trainings); here all folds become one ``jax.vmap``-batched training
over padded gene masks, compiled once.
"""

from __future__ import annotations

import gzip
import logging
import pickle
from collections import defaultdict

import numpy as np
import pandas as pd
import scipy.sparse as sp

from . import adlite

__all__ = [
    "read_pickle",
    "annotate_gene_sparsity",
    "get_matched_genes",
    "one_hot_encoding",
    "project_cell_annotations",
    "create_segment_cell_df",
    "count_cell_annotations",
    "deconvolve_cell_annotations",
    "project_genes",
    "compare_spatial_geneexp",
    "cv_data_gen",
    "cross_val",
    "eval_metric",
    "transfer_annotations_prob",
    "transfer_annotations_prob_filter",
    "df_to_cell_types",
    "cell_type_mapping",
]


def read_pickle(filename):
    """Read a pickle file that may or may not be gzipped
    (reference ``utils.py:26-43``)."""
    try:
        with gzip.open(filename, "rb") as f:
            return pickle.load(f)
    except OSError:
        with open(filename, "rb") as f:
            return pickle.load(f)


def annotate_gene_sparsity(adata):
    """Write ``var['sparsity']`` = 1 − fraction of nonzero observations
    (reference ``utils.py:46-61``)."""
    X = adata.X
    if sp.issparse(X):
        mask_sum = np.asarray((X != 0).sum(axis=0)).ravel()
    else:
        mask_sum = (np.asarray(X) != 0).sum(axis=0)
    gene_sparsity = np.asarray(mask_sum, dtype=np.float64) / adata.n_obs
    adata.var["sparsity"] = 1 - np.reshape(gene_sparsity, (-1,))


def get_matched_genes(prior_genes_names, sn_genes_names, excluded_genes=None):
    """Indices of genes shared by two name lists (reference ``utils.py:64-102``)."""
    prior_genes_names = np.array(prior_genes_names)
    sn_genes_names = np.array(sn_genes_names)

    mask_prior_indices = []
    mask_sn_indices = []
    selected_genes = []
    if excluded_genes is None:
        excluded_genes = []
    for index, i in enumerate(sn_genes_names):
        if i in excluded_genes:
            continue
        try:
            mask_prior_indices.append(np.argwhere(prior_genes_names == i)[0][0])
            mask_sn_indices.append(index)
            selected_genes.append(i)
        except IndexError:
            pass

    assert len(mask_prior_indices) == len(mask_sn_indices)
    return mask_prior_indices, mask_sn_indices, selected_genes


def one_hot_encoding(l, keep_aggregate=False):
    """One-hot DataFrame of a categorical sequence (reference ``utils.py:105-123``)."""
    df_enriched = pd.DataFrame({"cl": l})
    for i in l.unique():
        df_enriched[i] = list(map(int, df_enriched["cl"] == i))
    if not keep_aggregate:
        del df_enriched["cl"]
    return df_enriched


def project_cell_annotations(adata_map, adata_sp, annotation="cell_type", threshold=0.5):
    """Transfer an obs annotation onto space into ``obsm['tangram_ct_pred']``.

    Matches the reference end state (``utils.py:126-153``): the F_out/threshold
    subsetting there is dead code — the result is unconditionally
    ``adata_map.X.T @ onehot`` — so ``threshold`` is accepted but unused.
    """
    del threshold
    df = one_hot_encoding(adata_map.obs[annotation])
    df_ct_prob = adata_map.X.T @ df
    df_ct_prob.index = adata_map.var.index
    adata_sp.obsm["tangram_ct_pred"] = df_ct_prob
    logging.info(
        "spatial prediction dataframe is saved in `obsm` `tangram_ct_pred` of the spatial AnnData."
    )


def create_segment_cell_df(adata_sp):
    """Explode segmentation centroids into a per-object dataframe
    (reference ``utils.py:156-202``)."""
    if "image_features" not in adata_sp.obsm.keys():
        raise ValueError(
            "Missing parameter for tangram deconvolution. Run `sqidpy.im.calculate_image_features`."
        )

    centroids = adata_sp.obsm["image_features"][["segmentation_centroid"]].copy()
    centroids["centroids_idx"] = [
        np.array([f"{k}_{j}" for j in np.arange(i)], dtype="object")
        for k, i in zip(
            adata_sp.obs.index.values,
            adata_sp.obsm["image_features"]["segmentation_label"],
        )
    ]
    centroids_idx = centroids.explode("centroids_idx")
    centroids_coords = centroids.explode("segmentation_centroid")
    segmentation_df = pd.DataFrame(
        centroids_coords["segmentation_centroid"].to_list(),
        columns=["y", "x"],
        index=centroids_coords.index,
    )
    segmentation_df["centroids"] = centroids_idx["centroids_idx"].values
    segmentation_df.index.set_names("spot_idx", inplace=True)
    segmentation_df.reset_index(drop=False, inplace=True)

    adata_sp.uns["tangram_cell_segmentation"] = segmentation_df
    adata_sp.obsm["tangram_spot_centroids"] = centroids["centroids_idx"]
    logging.info(
        "cell segmentation dataframe is saved in `uns` `tangram_cell_segmentation` of the spatial AnnData."
    )
    logging.info(
        "spot centroids is saved in `obsm` `tangram_spot_centroids` of the spatial AnnData."
    )


def count_cell_annotations(adata_map, adata_sc, adata_sp, annotation="cell_type", threshold=0.5):
    """Count per-spot cells of each annotation from the argmax assignment
    (reference ``utils.py:205-285``)."""
    if "spatial" not in adata_sp.obsm.keys():
        raise ValueError(
            "Missing spatial information in AnnDatas. Please make sure coordinates are saved with AnnData.obsm['spatial']"
        )
    if "image_features" not in adata_sp.obsm.keys():
        raise ValueError(
            "Missing parameter for tangram deconvolution. Run `sqidpy.im.calculate_image_features`."
        )
    if (
        "tangram_cell_segmentation" not in adata_sp.uns.keys()
        or "tangram_spot_centroids" not in adata_sp.obsm.keys()
    ):
        raise ValueError(
            "Missing parameter for tangram deconvolution. Run `create_segment_cell_df`."
        )

    xs = adata_sp.obsm["spatial"][:, 1]
    ys = adata_sp.obsm["spatial"][:, 0]
    cell_count = adata_sp.obsm["image_features"]["segmentation_label"]
    centroids = adata_sp.obsm["tangram_spot_centroids"]

    df_vox_cells = pd.DataFrame(
        data={"x": xs, "y": ys, "cell_n": cell_count, "centroids": centroids},
        index=list(adata_sp.obs.index),
    )

    resulting_voxels = np.argmax(adata_map.X, axis=1)

    annotations = np.asarray(adata_sc.obs[annotation])
    if "F_out" in adata_map.obs.keys():
        vox_ct = [
            (j, annotations[k])
            for i, j, k in zip(
                adata_map.obs["F_out"], resulting_voxels, range(len(adata_sc))
            )
            if i > threshold
        ]
    else:
        vox_ct = list(zip(resulting_voxels, annotations))

    df_classes = one_hot_encoding(adata_sc.obs[annotation])
    for i in df_classes.columns:
        df_vox_cells[i] = 0

    for k, v in vox_ct:
        df_vox_cells.iloc[k, df_vox_cells.columns.get_loc(v)] += 1

    adata_sp.obsm["tangram_ct_count"] = df_vox_cells
    logging.info(
        "spatial cell count dataframe is saved in `obsm` `tangram_ct_count` of the spatial AnnData."
    )


def deconvolve_cell_annotations(adata_sp, filter_cell_annotation=None):
    """Assign a cell annotation to each segmented object
    (reference ``utils.py:288-335``)."""
    if (
        "tangram_ct_count" not in adata_sp.obsm.keys()
        or "tangram_cell_segmentation" not in adata_sp.uns.keys()
    ):
        raise ValueError("Missing tangram parameters. Run `count_cell_annotations`.")

    segmentation_df = adata_sp.uns["tangram_cell_segmentation"]

    if filter_cell_annotation is None:
        filter_cell_annotation = pd.unique(
            np.asarray(adata_sp.obsm["tangram_ct_pred"].columns)
        )
    else:
        filter_cell_annotation = pd.unique(np.asarray(filter_cell_annotation))

    df_vox_cells = adata_sp.obsm["tangram_ct_count"]
    cell_types_mapped = df_to_cell_types(df_vox_cells, filter_cell_annotation)
    df_list = []
    for k in cell_types_mapped.keys():
        df = pd.DataFrame({"centroids": np.array(cell_types_mapped[k], dtype="object")})
        df["cluster"] = k
        df_list.append(df)
    cluster_df = pd.concat(df_list, axis=0)
    cluster_df.reset_index(inplace=True, drop=True)

    merged_df = segmentation_df.merge(cluster_df, on="centroids", how="inner")
    merged_df.drop(columns="spot_idx", inplace=True)
    merged_df.drop_duplicates(inplace=True)
    merged_df.dropna(inplace=True)
    merged_df.reset_index(inplace=True, drop=True)

    adata_segment = adlite.AnnData(np.zeros(merged_df.shape), obs=merged_df)
    adata_segment.obsm["spatial"] = merged_df[["y", "x"]].to_numpy()
    adata_segment.uns = adata_sp.uns

    return adata_segment


def project_genes(adata_map, adata_sc, cluster_label=None, scale=True):
    """Project the full single-cell transcriptome onto space
    (reference ``utils.py:338-374``): one matmul ``M.Xᵀ @ S``."""
    from .mapping import adata_to_cluster_expression

    adata_sc.var.index = [g.lower() for g in adata_sc.var.index]
    adata_sc.var_names_make_unique()
    adlite.filter_genes(adata_sc, min_cells=1)

    if cluster_label:
        adata_sc = adata_to_cluster_expression(adata_sc, cluster_label, scale=scale)

    if not adata_map.obs.index.equals(adata_sc.obs.index):
        raise ValueError("The two AnnDatas need to have same `obs` index.")
    X = adata_sc.X
    if hasattr(X, "toarray"):
        X = X.toarray()
    X_space = adata_map.X.T @ X
    adata_ge = adlite.AnnData(
        X=X_space, obs=adata_map.var.copy(), var=adata_sc.var.copy(), uns=dict(adata_sc.uns)
    )
    training_genes = adata_map.uns["train_genes_df"].index.values
    adata_ge.var["is_training"] = adata_ge.var.index.isin(training_genes)
    return adata_ge


def compare_spatial_geneexp(adata_ge, adata_sp, adata_sc=None, genes=None):
    """Per-gene cosine similarity between projected and measured spatial data
    (reference ``utils.py:377-463``)."""
    if not set(["training_genes", "overlap_genes"]).issubset(set(adata_sp.uns.keys())):
        raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")
    if not set(["training_genes", "overlap_genes"]).issubset(set(adata_ge.uns.keys())):
        raise ValueError(
            "Missing tangram parameters. Use `project_genes()` to get adata_ge."
        )
    assert list(adata_sp.uns["overlap_genes"]) == list(adata_ge.uns["overlap_genes"])

    if genes is None:
        overlap_genes = adata_ge.uns["overlap_genes"]
    else:
        overlap_genes = genes

    annotate_gene_sparsity(adata_sp)

    X_1 = adata_ge[:, overlap_genes].X
    if hasattr(X_1, "toarray"):
        X_1 = X_1.toarray()
    X_2 = adata_sp[:, overlap_genes].X
    if hasattr(X_2, "toarray"):
        X_2 = X_2.toarray()

    cos_sims = []
    for v1, v2 in zip(X_1.T, X_2.T):
        norm_sq = np.linalg.norm(v1) * np.linalg.norm(v2)
        cos_sims.append((v1 @ v2) / norm_sq)

    df_g = pd.DataFrame(cos_sims, overlap_genes, columns=["score"])
    for adata in [adata_ge, adata_sp]:
        if "is_training" in adata.var.keys():
            df_g["is_training"] = adata.var.is_training

    df_g["sparsity_sp"] = adata_sp[:, overlap_genes].var.sparsity

    if adata_sc is not None:
        if not set(["training_genes", "overlap_genes"]).issubset(
            set(adata_sc.uns.keys())
        ):
            raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")
        assert list(adata_sc.uns["overlap_genes"]) == list(
            adata_sp.uns["overlap_genes"]
        )
        annotate_gene_sparsity(adata_sc)
        df_g = df_g.merge(
            pd.DataFrame(adata_sc[:, overlap_genes].var["sparsity"]),
            left_index=True,
            right_index=True,
        )
        df_g.rename({"sparsity": "sparsity_sc"}, inplace=True, axis="columns")
        df_g["sparsity_diff"] = df_g["sparsity_sp"] - df_g["sparsity_sc"]
    else:
        logging.info(
            "To create dataframe with column 'sparsity_sc' or 'sparsity_diff', please also pass adata_sc to the function."
        )

    if genes is not None:
        df_g = df_g.loc[genes]

    df_g = df_g.sort_values(by="score", ascending=False)
    return df_g


def cv_data_gen(adata_sc, adata_sp, cv_mode="loo"):
    """Yield (train_genes, test_genes) folds over the training genes
    (reference ``utils.py:466-500``)."""
    if "training_genes" not in adata_sc.uns.keys():
        raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")
    if "training_genes" not in adata_sp.uns.keys():
        raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")
    if not list(adata_sp.uns["training_genes"]) == list(adata_sc.uns["training_genes"]):
        raise ValueError(
            "Unmatched training_genes field in two Anndatas. Run `pp_adatas()`."
        )

    genes_array = np.array(adata_sp.uns["training_genes"])

    if cv_mode == "loo":
        from sklearn.model_selection import LeaveOneOut

        cv = LeaveOneOut()
    elif cv_mode == "10fold":
        from sklearn.model_selection import KFold

        cv = KFold(n_splits=10)
    else:
        raise ValueError("Invalid cv_mode; use 'loo' or '10fold'.")

    for train_idx, test_idx in cv.split(genes_array):
        train_genes = list(genes_array[train_idx])
        test_genes = list(genes_array[test_idx])
        yield train_genes, test_genes


def cross_val(
    adata_sc,
    adata_sp,
    cluster_label=None,
    mode="clusters",
    scale=True,
    lambda_d=0,
    lambda_g1=1,
    lambda_g2=0,
    lambda_r=0,
    lambda_count=1,
    lambda_f_reg=1,
    target_count=None,
    num_epochs=1000,
    device=None,
    learning_rate=0.1,
    cv_mode="loo",
    return_gene_pred=False,
    density_prior=None,
    random_state=None,
    verbose=False,
    # --- TPU-native extensions ---
    batched="auto",
    fold_batch_size=64,
):
    """Gene-holdout cross-validation (reference ``utils.py:503-668``).

    TPU-native difference: with ``batched`` (default for cells/clusters
    modes), all folds train as one vmapped, jit-compiled batch over padded
    gene masks instead of a fold-per-retraining Python loop — identical math
    per fold (each fold sees exactly its training-gene columns), one compile,
    one device round-trip. Set ``batched=False`` for the reference-style loop.
    """
    if batched == "auto":
        batched = mode in ("clusters", "cells", "constrained")

    if batched:
        return _cross_val_batched(
            adata_sc,
            adata_sp,
            cluster_label=cluster_label,
            mode=mode,
            scale=scale,
            lambda_d=lambda_d,
            lambda_g1=lambda_g1,
            lambda_g2=lambda_g2,
            lambda_r=lambda_r,
            lambda_count=lambda_count,
            lambda_f_reg=lambda_f_reg,
            target_count=target_count,
            num_epochs=num_epochs,
            learning_rate=learning_rate,
            cv_mode=cv_mode,
            return_gene_pred=return_gene_pred,
            density_prior=density_prior,
            random_state=random_state,
            verbose=verbose,
            fold_batch_size=fold_batch_size,
        )

    return _cross_val_loop(
        adata_sc,
        adata_sp,
        cluster_label=cluster_label,
        mode=mode,
        scale=scale,
        lambda_d=lambda_d,
        lambda_g1=lambda_g1,
        lambda_g2=lambda_g2,
        lambda_r=lambda_r,
        lambda_count=lambda_count,
        lambda_f_reg=lambda_f_reg,
        target_count=target_count,
        num_epochs=num_epochs,
        device=device,
        learning_rate=learning_rate,
        cv_mode=cv_mode,
        return_gene_pred=return_gene_pred,
        density_prior=density_prior,
        random_state=random_state,
        verbose=verbose,
    )


def _cross_val_loop(
    adata_sc,
    adata_sp,
    cluster_label,
    mode,
    scale,
    lambda_d,
    lambda_g1,
    lambda_g2,
    lambda_r,
    lambda_count,
    lambda_f_reg,
    target_count,
    num_epochs,
    device,
    learning_rate,
    cv_mode,
    return_gene_pred,
    density_prior,
    random_state,
    verbose,
):
    """Reference-faithful fold loop (full retraining per fold)."""
    from tqdm import tqdm

    from .mapping import adata_to_cluster_expression, map_cells_to_space

    test_genes_list = []
    test_pred_list = []
    test_score_list = []
    train_score_list = []
    test_df_list = []
    curr_cv_set = 1

    if cv_mode == "loo":
        length = len(list(adata_sc.uns["training_genes"]))
    elif cv_mode == "10fold":
        length = 10

    if mode == "clusters":
        adata_sc_agg = adata_to_cluster_expression(adata_sc, cluster_label, scale)

    for train_genes, test_genes in tqdm(
        cv_data_gen(adata_sc, adata_sp, cv_mode), total=length
    ):
        adata_map = map_cells_to_space(
            adata_sc=adata_sc,
            adata_sp=adata_sp,
            cv_train_genes=train_genes,
            mode=mode,
            device=device,
            learning_rate=learning_rate,
            num_epochs=num_epochs,
            cluster_label=cluster_label,
            scale=scale,
            lambda_d=lambda_d,
            lambda_g1=lambda_g1,
            lambda_g2=lambda_g2,
            lambda_r=lambda_r,
            lambda_count=lambda_count,
            lambda_f_reg=lambda_f_reg,
            target_count=target_count,
            random_state=random_state,
            verbose=False,
            density_prior=density_prior,
        )

        cv_genes = train_genes + test_genes

        adata_ge = project_genes(
            adata_map, adata_sc[:, cv_genes], cluster_label=cluster_label, scale=scale
        )

        if cv_mode == "loo" and return_gene_pred:
            adata_ge_test = adata_ge[:, test_genes].X.T
            test_pred_list.append(adata_ge_test)

        if mode == "clusters":
            df_g = compare_spatial_geneexp(adata_ge, adata_sp, adata_sc_agg, cv_genes)
        else:
            df_g = compare_spatial_geneexp(adata_ge, adata_sp, adata_sc, cv_genes)

        test_df = df_g[df_g.index.isin(test_genes)]
        test_score = df_g.loc[test_genes]["score"].mean()
        train_score = float(list(adata_map.uns["training_history"]["main_loss"])[-1])

        test_genes_list.append(test_genes)
        test_score_list.append(test_score)
        train_score_list.append(train_score)
        test_df_list.append(test_df)

        if verbose:
            msg = "cv set: {}----train score: {:.3f}----test score: {:.3f}".format(
                curr_cv_set, train_score, test_score
            )
            print(msg)
        curr_cv_set += 1

    avg_test_score = np.nanmean(test_score_list)
    avg_train_score = np.nanmean(train_score_list)

    cv_dict = {"avg_test_score": avg_test_score, "avg_train_score": avg_train_score}

    print("cv avg test score {:.3f}".format(avg_test_score))
    print("cv avg train score {:.3f}".format(avg_train_score))

    if cv_mode == "loo" and return_gene_pred:
        test_gene_df = pd.concat(test_df_list, axis=0)
        adata_ge_cv = adlite.AnnData(
            X=np.squeeze(np.array(test_pred_list)).T,
            obs=adata_sp.obs.copy(),
            var=pd.DataFrame(
                test_score_list,
                columns=["test_score"],
                index=np.squeeze(np.array(test_genes_list, dtype=object)),
            ),
        )
        return cv_dict, adata_ge_cv, test_gene_df

    return cv_dict


def _cross_val_batched(
    adata_sc,
    adata_sp,
    cluster_label,
    mode,
    scale,
    lambda_d,
    lambda_g1,
    lambda_g2,
    lambda_r,
    num_epochs,
    learning_rate,
    cv_mode,
    return_gene_pred,
    density_prior,
    random_state,
    verbose,
    fold_batch_size,
    lambda_count=1,
    lambda_f_reg=1,
    target_count=None,
):
    """All CV folds as one vmapped training batch (TPU-native path)."""
    import jax
    import jax.numpy as jnp

    from .mapping import _densify, adata_to_cluster_expression
    from .models.mapper import fit_mapping, init_logits
    from .ops.losses import LossWeights, MapperData

    # -- argument resolution mirrors map_cells_to_space (mapping_utils.py:205-307)
    if lambda_g1 == 0:
        raise ValueError("lambda_g1 cannot be 0.")
    if density_prior is not None and (lambda_d == 0 or lambda_d is None):
        lambda_d = 1
    if mode == "clusters" and cluster_label is None:
        raise ValueError("A cluster_label must be specified if mode is 'clusters'.")
    constrained = mode == "constrained"
    if constrained and not all([target_count, lambda_f_reg, lambda_count]):
        raise ValueError(
            "target_count, lambda_f_reg and lambda_count must be specified if mode is 'constrained'."
        )

    adata_sc_orig = adata_sc
    if mode == "clusters":
        adata_sc_agg_scored = adata_to_cluster_expression(adata_sc, cluster_label, scale)
        adata_sc = adata_to_cluster_expression(
            adata_sc, cluster_label, scale, add_density=True
        )

    training_genes = list(adata_sc.uns["training_genes"])
    S = _densify(adata_sc[:, training_genes].X)
    G = _densify(adata_sp[:, training_genes].X)

    d_source = None
    if isinstance(density_prior, str) and density_prior == "rna_count_based":
        density_prior = adata_sp.obs["rna_count_based_density"]
    elif isinstance(density_prior, str) and density_prior == "uniform":
        density_prior = adata_sp.obs["uniform_density"]
    d = density_prior
    if mode in ("clusters", "constrained"):
        if mode == "clusters":
            d_source = np.array(adata_sc.obs["cluster_density"])
        if d is None:
            d = adata_sp.obs["uniform_density"]
        if lambda_d is None or lambda_d == 0:
            lambda_d = 1
    if d is not None:
        d = np.asarray(d, dtype=np.float32)

    lw = LossWeights(
        lambda_g1=float(lambda_g1),
        lambda_d=float(lambda_d),
        lambda_g2=float(lambda_g2),
        lambda_r=float(lambda_r),
        lambda_count=float(lambda_count),
        lambda_f_reg=float(lambda_f_reg),
    )

    folds = list(cv_data_gen(adata_sc, adata_sp, cv_mode))
    n_folds = len(folds)
    gene_index = {g: i for i, g in enumerate(training_genes)}
    masks = np.zeros((n_folds, len(training_genes)), dtype=np.float32)
    test_idx_lists = []
    for f, (train_genes, test_genes) in enumerate(folds):
        masks[f, [gene_index[g] for g in train_genes]] = 1.0
        test_idx_lists.append([gene_index[g] for g in test_genes])

    n_cells, n_spots = S.shape[0], G.shape[0]
    if constrained:
        # replicate MapperConstrained's init stream (seed, discarded draw,
        # M, F — mapping_optimizer.py:472-493)
        if random_state:
            np.random.seed(seed=random_state)
        np.random.normal(0, 1, (n_cells, n_spots))
        M0 = jnp.asarray(np.random.normal(0, 1, (n_cells, n_spots)), jnp.float32)
        F0 = jnp.asarray(np.random.normal(0, 1, n_cells), jnp.float32)
        params0 = (M0, F0)
    else:
        params0 = init_logits(n_cells, n_spots, random_state, method="auto")

    S_dev, G_dev = jnp.asarray(S), jnp.asarray(G)
    d_dev = None if d is None else jnp.asarray(d)
    dsrc_dev = None if d_source is None else jnp.asarray(d_source, dtype=jnp.float32)
    tc_dev = jnp.float32(target_count) if constrained else None

    def run_chunk(mask_chunk):
        data = MapperData(
            S=S_dev, G=G_dev, gene_mask=mask_chunk, d=d_dev, d_source=dsrc_dev,
            target_count=tc_dev,
        )
        in_axes = (None, MapperData(S=None, G=None, gene_mask=0))
        fit = jax.vmap(
            lambda p0, dat: fit_mapping(
                p0, dat, lw, int(num_epochs), float(learning_rate),
                constrained=constrained,
            ),
            in_axes=in_axes,
        )
        params, history = fit(params0, data)
        M_final = params[0] if constrained else params
        P = jax.nn.softmax(M_final, axis=1)  # (folds, c, s)
        G_pred = jnp.einsum("fcs,cg->fsg", P, S_dev)
        # per-fold per-gene cosine score against measured G
        dots = jnp.sum(G_pred * G_dev[None], axis=1)
        n1 = jnp.linalg.norm(G_pred, axis=1)
        n2 = jnp.linalg.norm(G_dev, axis=0)[None]
        scores = dots / (n1 * n2)  # (folds, g)
        return (
            np.asarray(scores),
            np.asarray(history["main_loss"][..., -1]),
            np.asarray(G_pred) if return_gene_pred else None,
        )

    all_scores = np.zeros((n_folds, len(training_genes)))
    train_scores = np.zeros(n_folds)
    pred_cols = {} if return_gene_pred else None

    for start in range(0, n_folds, int(fold_batch_size)):
        stop = min(start + int(fold_batch_size), n_folds)
        scores, tr, G_pred = run_chunk(jnp.asarray(masks[start:stop]))
        all_scores[start:stop] = scores
        train_scores[start:stop] = tr
        if return_gene_pred:
            for f in range(start, stop):
                for tg in test_idx_lists[f]:
                    pred_cols[tg] = G_pred[f - start, :, tg]
        if verbose:
            print(f"cv folds {start}-{stop - 1} done")

    test_score_list = [
        float(np.mean([all_scores[f, i] for i in test_idx_lists[f]]))
        for f in range(n_folds)
    ]
    avg_test_score = np.nanmean(test_score_list)
    avg_train_score = np.nanmean(train_scores)

    cv_dict = {
        "avg_test_score": float(avg_test_score),
        "avg_train_score": float(avg_train_score),
    }
    print("cv avg test score {:.3f}".format(avg_test_score))
    print("cv avg train score {:.3f}".format(avg_train_score))

    if cv_mode == "loo" and return_gene_pred:
        test_genes_flat = [folds[f][1][0] for f in range(n_folds)]
        X_pred = np.stack(
            [pred_cols[test_idx_lists[f][0]] for f in range(n_folds)], axis=1
        )
        adata_ge_cv = adlite.AnnData(
            X=X_pred,
            obs=adata_sp.obs.copy(),
            var=pd.DataFrame(
                test_score_list, columns=["test_score"], index=test_genes_flat
            ),
        )
        # test-gene dataframe matching compare_spatial_geneexp columns
        annotate_gene_sparsity(adata_sp)
        sc_for_sparsity = adata_sc_agg_scored if mode == "clusters" else adata_sc_orig
        annotate_gene_sparsity(sc_for_sparsity)
        sparsity_sp = adata_sp[:, test_genes_flat].var["sparsity"].to_numpy()
        sparsity_sc = sc_for_sparsity[:, test_genes_flat].var["sparsity"].to_numpy()
        test_gene_df = pd.DataFrame(
            {
                "score": test_score_list,
                "is_training": False,
                "sparsity_sp": sparsity_sp,
                "sparsity_sc": sparsity_sc,
                "sparsity_diff": sparsity_sp - sparsity_sc,
            },
            index=test_genes_flat,
        )
        return cv_dict, adata_ge_cv, test_gene_df

    return cv_dict


def eval_metric(df_all_genes, test_genes=None):
    """Evaluation metrics incl. the polynomial-AUC score
    (reference ``utils.py:671-758``); golden-tested against the bundled
    18k-gene table (``tests/tangram_test.py:214-216``)."""
    from sklearn.metrics import auc

    if test_genes is not None:
        if not set(test_genes).issubset(set(df_all_genes.index.values)):
            raise ValueError(
                "the input of test_genes should be subset of genes of input dataframe"
            )
        test_genes = np.unique(test_genes)
    else:
        test_genes = list(
            set(df_all_genes[df_all_genes["is_training"] == False].index.values)
        )

    if len(test_genes) == 0:
        raise ValueError(
            "No test genes found: pass `test_genes` explicitly or include rows "
            "with is_training == False in df_all_genes."
        )

    test_gene_scores = df_all_genes.loc[test_genes]["score"]
    test_gene_sparsity_sp = df_all_genes.loc[test_genes]["sparsity_sp"]
    test_score_avg = test_gene_scores.mean()
    train_score_avg = df_all_genes[df_all_genes["is_training"] == True]["score"].mean()

    test_score_sps_sp_g2 = np.sum(
        (test_gene_scores * (1 - test_gene_sparsity_sp))
        / (1 - test_gene_sparsity_sp).sum()
    )

    # degree-2 polynomial fit of (score, sparsity), clipped to the unit square,
    # extended by a real root when one lies in [0, 1] — then AUC
    xs = list(test_gene_scores)
    ys = list(test_gene_sparsity_sp)
    pol_deg = 2
    pol_cs = np.polyfit(xs, ys, pol_deg)
    pol_xs = np.linspace(0, 1, 10)
    pol = np.poly1d(pol_cs)
    pol_ys = [pol(x) for x in pol_xs]

    if pol_ys[0] > 1:
        pol_ys[0] = 1

    roots = pol.r
    root = None
    for r in roots:
        if np.isreal(r) and 0 <= r <= 1:
            root = r
            break

    if root is not None:
        pol_xs = np.append(pol_xs, root)
        pol_ys = np.append(pol_ys, 0)

    # drop points outside the unit square (positional filtering as in the
    # reference, which indexes by first value occurrence)
    del_idx = []
    for i in range(len(pol_xs)):
        if pol_xs[i] < 0 or pol_ys[i] < 0 or pol_xs[i] > 1 or pol_ys[i] > 1:
            del_idx.append(i)
    pol_xs = [x for x in pol_xs if list(pol_xs).index(x) not in del_idx]
    pol_ys = [y for y in pol_ys if list(pol_ys).index(y) not in del_idx]

    auc_test_score = np.real(auc(pol_xs, pol_ys))

    metric_dict = {
        "avg_test_score": test_score_avg,
        "avg_train_score": train_score_avg,
        "sp_sparsity_score": test_score_sps_sp_g2,
        "auc_score": auc_test_score,
    }
    auc_coordinates = ((pol_xs, pol_ys), (xs, ys))
    return metric_dict, auc_coordinates


# DEPRECATED (kept for API parity, reference ``utils.py:762-787``)
def transfer_annotations_prob(mapping_matrix, to_transfer):
    return mapping_matrix.transpose() @ to_transfer


def transfer_annotations_prob_filter(mapping_matrix, filter, to_transfer):
    tt = to_transfer * filter[:, np.newaxis]
    return mapping_matrix.transpose() @ tt


def df_to_cell_types(df, cell_types):
    """Assign voxel centroids to cell types by cumulative counts
    (reference ``utils.py:790-818``)."""
    df_cum_sums = df[cell_types].cumsum(axis=1)
    df_c = df.copy()
    for i in df_cum_sums.columns:
        df_c[i] = df_cum_sums[i]

    cell_types_mapped = defaultdict(list)
    for i_index, i in enumerate(cell_types):
        for j_index, j in df_c.iterrows():
            start_ind = 0 if i_index == 0 else j[cell_types[i_index - 1]]
            end_ind = j[i]
            cell_types_mapped[i].extend(j["centroids"][start_ind:end_ind].tolist())
    return cell_types_mapped


def cell_type_mapping(adata_map, cell_types_key="cell_types"):
    """Min-max-normalized cell-type × spot map into ``varm['ct_map']``
    (reference ``utils.py:820-842``), honoring F_out >= 0.5 in constrained mode."""
    df = one_hot_encoding(adata_map.obs[cell_types_key])
    if "F_out" in adata_map.obs.keys():
        kept = adata_map.obs["F_out"] >= 0.5
        df_ct_prob = adata_map[kept].X.T @ df[np.asarray(kept)]
    else:
        df_ct_prob = adata_map.X.T @ df
    df_ct_prob.index = adata_map.var.index
    vmin = df_ct_prob.min()
    vmax = df_ct_prob.max()
    df_ct_prob = (df_ct_prob - vmin) / (vmax - vmin)
    adata_map.varm["ct_map"] = df_ct_prob
