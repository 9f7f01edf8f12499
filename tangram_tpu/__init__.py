"""Tangram-TPU: a TPU-native spatial transcriptomics alignment framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
broadinstitute/Tangram: learns a probabilistic cell→spot mapping matrix by
maximizing per-gene cosine similarity between projected and measured spatial
expression, with the full family of regularizers (density KL, entropy, L1/L2,
spatial neighborhood, cell-type islands, Getis-Ord/Moran/Geary preservation,
and the constrained learned cell filter).

The public namespace is flat, like the reference (``tangram/__init__.py``):
``import tangram_tpu as tg; tg.pp_adatas(...); tg.map_cells_to_space(...)``.
"""

from . import cell_selection, checkpoint, gene_selection, parallel, profiling
from ._version import __version__
from .adlite import AnnData, read_h5ad, write_h5ad
from .mapping import adata_to_cluster_expression, map_cells_to_space, pp_adatas
from .models.mapper import Mapper, MapperConstrained, fit_mapping, init_logits
from .ops.core import NeighborGraph, graph_matmul, mapper_core
from .ops.losses import (
    LossWeights,
    MapperData,
    compute_constrained_loss,
    compute_loss,
    val_metrics,
)
from .ops.schedules import cosine_lr
from .spatial import neighbor_graph, spatial_neighbors, spatial_weights
from .utils import (
    annotate_gene_sparsity,
    cell_type_mapping,
    compare_spatial_geneexp,
    count_cell_annotations,
    create_segment_cell_df,
    cross_val,
    cv_data_gen,
    deconvolve_cell_annotations,
    df_to_cell_types,
    enable_compilation_cache,
    eval_metric,
    get_matched_genes,
    one_hot_encoding,
    project_cell_annotations,
    project_genes,
    read_pickle,
    transfer_annotations_prob,
    transfer_annotations_prob_filter,
)

# Plotting and tuning pull in optional heavyweight deps; import lazily.
_plot_names = {
    "plot_training_scores", "plot_gene_sparsity", "ordered_predictions",
    "convert_adata_array", "construct_obs_plot", "plot_cell_annotation",
    "plot_cell_annotation_sc", "plot_genes", "plot_genes_sc",
    "quick_plot_gene", "plot_annotation_entropy", "plot_test_scores",
    "plot_auc", "q_value", "mapping_colors",
}
_tune_names = {"mapping_hyperparameter_tuning", "train_multiple_Mapper",
               "pearson_corr", "vote_entropy", "consensus_entropy"}
_search_names = {"TPESampler", "nondominated_rank"}
# The lazy submodules themselves are also reachable as attributes
# (``tg.tuning.loguniform(...)``, ``tg.plot_utils``), mirroring how users
# reach ``ray.tune`` domains in the reference's tuner.
_lazy_modules = {"tuning", "plot_utils", "search", "datasets", "evaluation",
                 "deconv", "spatial", "utils", "adlite"}

__all__ = sorted(
    {name for name in dir() if not name.startswith("_")}
    | _plot_names | _tune_names | _search_names | _lazy_modules
)


def __dir__():
    return __all__


def __getattr__(name):
    if name in _plot_names:
        from . import plot_utils

        return getattr(plot_utils, name)
    if name in _tune_names:
        from . import tuning

        return getattr(tuning, name)
    if name in _search_names:
        from . import search

        return getattr(search, name)
    if name in _lazy_modules:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'tangram_tpu' has no attribute {name!r}")
