"""User API: preprocessing and the main mapping entry point.

Signature-compatible with the reference ``tangram/mapping_utils.py``:
``pp_adatas`` (reference ``:20-100``), ``adata_to_cluster_expression``
(``:103-139``) and ``map_cells_to_space`` (``:141-427``). AnnData in,
AnnData out — works with :class:`tangram_tpu.adlite.AnnData` or a real
``anndata.AnnData``.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import scipy.sparse as sp

from . import adlite
from . import spatial as sw
from .models.mapper import Mapper, MapperConstrained
from .utils import annotate_gene_sparsity, one_hot_encoding

__all__ = ["pp_adatas", "adata_to_cluster_expression", "map_cells_to_space"]


def _densify(X) -> np.ndarray:
    if sp.issparse(X):
        return np.asarray(X.toarray(), dtype="float32")
    if hasattr(X, "toarray") and not isinstance(X, np.ndarray):
        return np.asarray(X.toarray(), dtype="float32")
    if isinstance(X, np.ndarray):
        return np.asarray(X, dtype="float32")
    raise NotImplementedError(f"AnnData X has unrecognized type: {type(X)}")


def pp_adatas(adata_sc, adata_sp, genes=None, gene_to_lowercase=True):
    """Pre-process a single-cell / spatial AnnData pair for mapping.

    Mirrors reference ``mapping_utils.py:20-100``: drops all-zero genes,
    lowercases gene names, intersects gene sets into ``uns['training_genes']``
    and sorted ``uns['overlap_genes']``, writes the ``uniform_density`` and
    ``rna_count_based_density`` priors, and (when ``obsm['spatial']`` exists)
    builds the spot neighbor graph into ``obsp``.
    """
    adlite.filter_genes(adata_sc, min_cells=1)
    adlite.filter_genes(adata_sp, min_cells=1)

    if genes is None:
        genes = adata_sc.var.index

    if gene_to_lowercase:
        adata_sc.var.index = [g.lower() for g in adata_sc.var.index]
        adata_sp.var.index = [g.lower() for g in adata_sp.var.index]
        genes = list(g.lower() for g in genes)

    adata_sc.var_names_make_unique()
    adata_sp.var_names_make_unique()

    genes = list(set(genes) & set(adata_sc.var.index) & set(adata_sp.var.index))

    adata_sc.uns["training_genes"] = genes
    adata_sp.uns["training_genes"] = genes
    logging.info(
        "{} training genes are saved in `uns``training_genes` of both single cell and spatial Anndatas.".format(
            len(genes)
        )
    )

    overlap_genes = np.sort(
        list(set(adata_sc.var.index) & set(adata_sp.var.index))
    ).tolist()
    adata_sc.uns["overlap_genes"] = overlap_genes
    adata_sp.uns["overlap_genes"] = overlap_genes
    logging.info(
        "{} overlapped genes are saved in `uns``overlap_genes` of both single cell and spatial Anndatas.".format(
            len(overlap_genes)
        )
    )

    adata_sp.obs["uniform_density"] = (
        np.ones(adata_sp.X.shape[0]) / adata_sp.X.shape[0]
    )
    logging.info(
        "uniform based density prior is calculated and saved in `obs``uniform_density` of the spatial Anndata."
    )

    rna_count_per_spot = np.array(adata_sp.X.sum(axis=1)).squeeze()
    adata_sp.obs["rna_count_based_density"] = rna_count_per_spot / np.sum(
        rna_count_per_spot
    )
    logging.info(
        "rna count based density prior is calculated and saved in `obs``rna_count_based_density` of the spatial Anndata."
    )

    if "spatial" in adata_sp.obsm:
        logging.info(
            "Spatial neighborhood matrices for the neighborhood extensions are calculated and saved in `obsp``spatial_connectivities` and `spatial_distances` of the spatial Anndata."
        )
        sw.spatial_neighbors(adata_sp, set_diag=False)


def adata_to_cluster_expression(adata, cluster_label, scale=True, add_density=True):
    """Aggregate an AnnData to one observation per cluster
    (reference ``mapping_utils.py:103-139``): per-cluster ``sum`` when
    ``scale`` else ``mean``, plus normalized ``obs['cluster_density']``."""
    try:
        value_counts = adata.obs[cluster_label].value_counts(normalize=True)
    except KeyError:
        raise ValueError("Provided label must belong to adata.obs.")
    unique_labels = value_counts.index
    new_obs = pd.DataFrame({cluster_label: unique_labels})

    X = adata.X
    labels = np.asarray(adata.obs[cluster_label])
    X_new = np.empty((len(unique_labels), adata.shape[1]))
    for index, l in enumerate(unique_labels):
        mask = labels == l
        rows = X[mask]
        agg = rows.sum(axis=0) if scale else rows.mean(axis=0)
        X_new[index] = np.asarray(agg).ravel()

    adata_ret = adlite.AnnData(X=X_new, obs=new_obs, var=adata.var.copy(), uns=dict(adata.uns))
    if add_density:
        adata_ret.obs["cluster_density"] = adata_ret.obs[cluster_label].map(
            lambda i: value_counts[i]
        )
    return adata_ret


def map_cells_to_space(
    adata_sc,
    adata_sp,
    cv_train_genes=None,
    cluster_label=None,
    mode="cells",
    device=None,
    learning_rate=0.1,
    num_epochs=1000,
    scale=True,
    lambda_d=0,
    lambda_g1=1,
    lambda_g2=0,
    lambda_r=0,
    lambda_l1=0,
    lambda_l2=0,
    lambda_count=1,
    lambda_f_reg=1,
    target_count=None,
    lambda_neighborhood_g1=0,
    lambda_ct_islands=0,
    lambda_getis_ord=0,
    lambda_moran=0,
    lambda_geary=0,
    random_state=None,
    verbose=True,
    density_prior="rna_count_based",
    # --- TPU-native extensions (defaults preserve reference behavior) ---
    impl="auto",
    init_method="auto",
    graph_format="dense",
    mesh=None,
):
    """Map single cells onto space; reference ``mapping_utils.py:141-427``.

    Returns a cell-by-spot AnnData with mapping probabilities, per-gene
    training scores in ``uns['train_genes_df']`` and the full
    ``uns['training_history']``.

    TPU-native extensions: ``impl`` selects the fused Pallas kernel or plain
    XLA for the hot step; ``init_method`` chooses the numpy-compatible or
    on-device PRNG init; ``graph_format='knn'`` keeps spot graphs in
    structured (s, k) form instead of dense s×s matrices for atlas scale;
    ``mesh`` (a jax Mesh) shards the whole training over multiple chips
    (cells/clusters modes).
    """
    if mesh is not None and mode == "constrained":
        raise NotImplementedError(
            "mesh sharding is not yet wired for constrained mode"
        )
    if lambda_g1 == 0:
        raise ValueError("lambda_g1 cannot be 0.")

    if (type(density_prior) is str) and (
        density_prior not in ["rna_count_based", "uniform", None]
    ):
        raise ValueError("Invalid input for density_prior.")

    if density_prior is not None and (lambda_d == 0 or lambda_d is None):
        lambda_d = 1

    if lambda_d > 0 and density_prior is None:
        raise ValueError("When lambda_d is set, please define the density_prior.")

    if mode not in ["clusters", "cells", "constrained"]:
        raise ValueError('Argument "mode" must be "cells", "clusters" or "constrained')

    if mode == "clusters" and cluster_label is None:
        raise ValueError("A cluster_label must be specified if mode is 'clusters'.")

    if mode == "constrained" and not all([target_count, lambda_f_reg, lambda_count]):
        raise ValueError(
            "target_count, lambda_f_reg and lambda_count must be specified if mode is 'constrained'."
        )

    if mode == "clusters":
        adata_sc = adata_to_cluster_expression(
            adata_sc, cluster_label, scale, add_density=True
        )

    if not set(["training_genes", "overlap_genes"]).issubset(set(adata_sc.uns.keys())):
        raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")

    if not set(["training_genes", "overlap_genes"]).issubset(set(adata_sp.uns.keys())):
        raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")

    assert list(adata_sp.uns["training_genes"]) == list(adata_sc.uns["training_genes"])

    if cv_train_genes is None:
        training_genes = adata_sc.uns["training_genes"]
    else:
        if set(cv_train_genes).issubset(set(adata_sc.uns["training_genes"])):
            training_genes = cv_train_genes
        else:
            raise ValueError(
                "Given training genes list should be subset of two AnnDatas."
            )

    logging.info("Allocate tensors for mapping.")
    S = _densify(adata_sc[:, training_genes].X)
    G = _densify(adata_sp[:, training_genes].X)

    if not S.any(axis=0).all() or not G.any(axis=0).all():
        raise ValueError("Genes with all zero values detected. Run `pp_adatas()`.")

    d_source = None

    d_str = density_prior
    if type(density_prior) is np.ndarray:
        d_str = "customized"

    if isinstance(density_prior, str) and density_prior == "rna_count_based":
        density_prior = adata_sp.obs["rna_count_based_density"]
    elif isinstance(density_prior, str) and density_prior == "uniform":
        density_prior = adata_sp.obs["uniform_density"]

    d = None
    if mode == "cells":
        d = density_prior

    if mode == "clusters":
        d_source = np.array(adata_sc.obs["cluster_density"])

    if mode in ["clusters", "constrained"]:
        if density_prior is None:
            d = adata_sp.obs["uniform_density"]
            d_str = "uniform"
        else:
            d = density_prior
        if lambda_d is None or lambda_d == 0:
            lambda_d = 1

    if d is not None:
        d = np.asarray(d, dtype=np.float32)

    print_each = 100 if verbose else None

    if mode in ["cells", "clusters"]:
        voxel_weights = neighborhood_filter = ct_encode = spatial_weights = None
        build = (
            sw.neighbor_graph if graph_format == "knn" else sw.spatial_weights
        )
        if lambda_neighborhood_g1 > 0:
            voxel_weights = build(adata_sp, standardized=True, self_inclusion=True)
        if lambda_ct_islands > 0:
            if cluster_label not in adata_sc.obs.keys():
                raise ValueError(
                    "cluster_label must be specified for the cell type island extension."
                )
            neighborhood_filter = build(
                adata_sp, standardized=False, self_inclusion=False
            )
            ct_encode = one_hot_encoding(adata_sc.obs[cluster_label]).values
        # NOTE (reference quirk, ``mapping_utils.py:326-329``): Moran/Geary and
        # Getis-Ord share one weight matrix slot; when both families are
        # requested, the Getis-Ord variant wins.
        if lambda_moran > 0 or lambda_geary > 0:
            spatial_weights = build(adata_sp, standardized=True, self_inclusion=False)
        if lambda_getis_ord > 0:
            spatial_weights = build(adata_sp, standardized=False, self_inclusion=True)

        hyperparameters = {
            "lambda_d": lambda_d,
            "lambda_g1": lambda_g1,
            "lambda_g2": lambda_g2,
            "lambda_r": lambda_r,
            "lambda_l1": lambda_l1,
            "lambda_l2": lambda_l2,
            "d_source": d_source,
            "lambda_neighborhood_g1": lambda_neighborhood_g1,
            "voxel_weights": voxel_weights,
            "lambda_ct_islands": lambda_ct_islands,
            "neighborhood_filter": neighborhood_filter,
            "ct_encode": ct_encode,
            "lambda_getis_ord": lambda_getis_ord,
            "lambda_moran": lambda_moran,
            "lambda_geary": lambda_geary,
            "spatial_weights": spatial_weights,
        }

        logging.info(
            "Begin training with {} genes and {} density_prior in {} mode...".format(
                len(training_genes), d_str, mode
            )
        )
        mapper = Mapper(
            S=S,
            G=G,
            d=d,
            device=device,
            random_state=random_state,
            impl=impl,
            init_method=init_method,
            mesh=mesh,
            **hyperparameters,
        )
        mapping_matrix, training_history = mapper.train(
            learning_rate=learning_rate,
            num_epochs=num_epochs,
            print_each=print_each,
        )

    elif mode == "constrained":
        hyperparameters = {
            "lambda_d": lambda_d,
            "lambda_g1": lambda_g1,
            "lambda_g2": lambda_g2,
            "lambda_r": lambda_r,
            "lambda_count": lambda_count,
            "lambda_f_reg": lambda_f_reg,
            "target_count": target_count,
        }
        logging.info(
            "Begin training with {} genes and {} density_prior in {} mode...".format(
                len(training_genes), d_str, mode
            )
        )
        mapper = MapperConstrained(
            S=S,
            G=G,
            d=d,
            device=device,
            random_state=random_state,
            impl=impl,
            init_method=init_method,
            **hyperparameters,
        )
        mapping_matrix, F_out, training_history = mapper.train(
            learning_rate=learning_rate,
            num_epochs=num_epochs,
            print_each=print_each,
        )

    logging.info("Saving results..")
    adata_map = adlite.AnnData(
        X=mapping_matrix,
        obs=adata_sc[:, training_genes].obs.copy(),
        var=adata_sp[:, training_genes].obs.copy(),
    )

    if mode == "constrained":
        adata_map.obs["F_out"] = F_out

    # Per-gene cosine similarity of training genes (``mapping_utils.py:401-410``)
    G_predicted = adata_map.X.T @ S
    cos_sims = []
    for v1, v2 in zip(G.T, G_predicted.T):
        norm_sq = np.linalg.norm(v1) * np.linalg.norm(v2)
        cos_sims.append((v1 @ v2) / norm_sq)

    df_cs = pd.DataFrame(cos_sims, training_genes, columns=["train_score"])
    df_cs = df_cs.sort_values(by="train_score", ascending=False)
    adata_map.uns["train_genes_df"] = df_cs

    annotate_gene_sparsity(adata_sc)
    annotate_gene_sparsity(adata_sp)
    adata_map.uns["train_genes_df"]["sparsity_sc"] = adata_sc[
        :, training_genes
    ].var.sparsity
    adata_map.uns["train_genes_df"]["sparsity_sp"] = adata_sp[
        :, training_genes
    ].var.sparsity
    adata_map.uns["train_genes_df"]["sparsity_diff"] = (
        adata_sp[:, training_genes].var.sparsity
        - adata_sc[:, training_genes].var.sparsity
    )

    adata_map.uns["training_history"] = training_history

    return adata_map
