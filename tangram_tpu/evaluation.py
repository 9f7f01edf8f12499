"""Projection, scoring and cross-validation workflows.

Covers the reference evaluation surface (``project_genes`` ref utils.py:338,
``compare_spatial_geneexp`` ref utils.py:377, ``cv_data_gen``/``cross_val``
ref utils.py:466/503, ``eval_metric`` ref utils.py:671). The headline
TPU-native change is :func:`cross_val`: the reference retrains from scratch
per fold in a Python loop (LOO over ~250 genes → ~250 full trainings); here
all folds become one ``jax.vmap``-batched training over padded gene masks,
compiled once. Gene scoring is a single vectorized column-cosine, not a
per-gene loop.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from . import adlite
from .deconv import one_hot_encoding  # noqa: F401  (re-exported via utils)

__all__ = [
    "projected_expression",
    "project_genes",
    "compare_spatial_geneexp",
    "cv_data_gen",
    "cross_val",
    "eval_metric",
]


def _as_dense(X):
    return X.toarray() if hasattr(X, "toarray") else np.asarray(X)


# Above this many M entries, host BLAS becomes the projection bottleneck
# (the 100k × 50k north-star M is 5e9 entries; Mᵀ@S on a laptop-class host
# takes minutes) — stream the matmul through the accelerator instead.
_DEVICE_MM_THRESHOLD = 1 << 28


def projected_expression(M, X, backend="auto", spot_chunk=16384):
    """``Mᵀ @ X`` (spots × genes) — the projection matmul behind
    :func:`project_genes` and the per-gene training scores.

    ``backend='auto'`` keeps small products on host numpy (zero transfer
    cost) and streams atlas-scale ones through the accelerator in spot
    chunks, so neither M nor the output ever needs to fit in device memory
    at once. ``'host'``/``'device'`` force a side.

    A mesh-sharded ``M`` (what ``fit_mapping_fused_sharded`` returns — at
    pod scale it never fits one chip, and gathering it to host first would
    double the footprint) is projected in place under GSPMD: the matmul
    runs where the shards live, XLA inserts the cell-axis psum, and only
    the (spots × genes) result lands on host.
    """
    try:
        import jax

        if (
            isinstance(M, jax.Array)
            and len(getattr(M.sharding, "device_set", ())) > 1
        ):
            import jax.numpy as jnp

            X_dev = jnp.asarray(np.asarray(X, dtype=np.float32))
            # f32 accumulation: these projections feed the reported gene
            # scores, which must match the host-numpy path (TPU matmuls
            # default to bf16 inputs otherwise)
            out = jax.jit(
                lambda m, x: jnp.matmul(
                    m.astype(jnp.float32).T, x,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )(M, X_dev)
            return np.asarray(jax.device_get(out))
    except ImportError:  # pragma: no cover - jax is a hard dep in practice
        pass
    M = np.asarray(M)
    X = np.asarray(X, dtype=np.float32)
    if backend == "auto":
        import jax

        use_device = (
            jax.default_backend() != "cpu" and M.size >= _DEVICE_MM_THRESHOLD
        )
    else:
        use_device = backend == "device"
    if not use_device:
        return M.T @ X

    import jax
    import jax.numpy as jnp

    X_dev = jnp.asarray(X)
    matmul = jax.jit(
        lambda m, x: jnp.matmul(m.T, x, precision=jax.lax.Precision.HIGHEST)
    )
    out = np.empty((M.shape[1], X.shape[1]), np.float32)
    for start in range(0, M.shape[1], spot_chunk):
        stop = min(start + spot_chunk, M.shape[1])
        out[start:stop] = np.asarray(matmul(jnp.asarray(M[:, start:stop]), X_dev))
    return out


def projected_expression_from_logits(M_logits, X):
    """``softmax(M)ᵀ @ X`` computed where the trained logits already live.

    The post-training report in :func:`tangram_tpu.map_cells_to_space` needs
    the (spots × genes) projection of the mapping. Rebuilding it from the
    host copy would move the full (cells × spots) matrix to the device
    again; this recomputes the softmax from the device-resident logits
    (``Mapper.M`` after ``train`` — two cheap streamed passes over M) and
    fetches only the (spots × genes) result. A mesh-sharded ``M`` projects
    in place under GSPMD (XLA inserts the cell-axis psum).
    """
    import jax
    import jax.numpy as jnp

    X_dev = jnp.asarray(np.asarray(X, dtype=np.float32))

    def _proj(m, x):
        p = jax.nn.softmax(m.astype(jnp.float32), axis=1)
        # full-f32 accumulation: this value feeds the reported train scores,
        # which must match the host-numpy path (TPU matmuls default to bf16
        # inputs otherwise)
        return jnp.matmul(p.T, x, precision=jax.lax.Precision.HIGHEST)

    return np.asarray(jax.device_get(jax.jit(_proj)(M_logits, X_dev)))


def _column_cosine(A, B):
    """Per-column cosine similarity of two (n, g) matrices → (g,)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    dots = np.einsum("ng,ng->g", A, B)
    return dots / (np.linalg.norm(A, axis=0) * np.linalg.norm(B, axis=0))


def _require_pp(adata, hint="Run `pp_adatas()`."):
    if not {"training_genes", "overlap_genes"} <= set(adata.uns.keys()):
        raise ValueError(f"Missing tangram parameters. {hint}")


def project_genes(adata_map, adata_sc, cluster_label=None, scale=True):
    """Project the full single-cell transcriptome onto space: one matmul
    ``Mᵀ @ S`` over every gene (ref utils.py:338-374). Lowercases and
    deduplicates ``adata_sc`` gene names in place, like the reference.
    """
    from .mapping import adata_to_cluster_expression

    adata_sc.var.index = [g.lower() for g in adata_sc.var.index]
    adata_sc.var_names_make_unique()
    adlite.filter_genes(adata_sc, min_cells=1)

    if cluster_label:
        adata_sc = adata_to_cluster_expression(adata_sc, cluster_label, scale=scale)

    if not adata_map.obs.index.equals(adata_sc.obs.index):
        raise ValueError("The two AnnDatas need to have same `obs` index.")

    projected = adlite.AnnData(
        X=projected_expression(adata_map.X, _as_dense(adata_sc.X)),
        obs=adata_map.var.copy(),
        var=adata_sc.var.copy(),
        uns=dict(adata_sc.uns),
    )
    trained_on = adata_map.uns["train_genes_df"].index.values
    projected.var["is_training"] = projected.var.index.isin(trained_on)
    return projected


def compare_spatial_geneexp(adata_ge, adata_sp, adata_sc=None, genes=None):
    """Score projected vs measured spatial expression per gene
    (ref utils.py:377-463): cosine similarity over ``overlap_genes`` (or an
    explicit gene list), annotated with sparsity columns and sorted by score.
    """
    from .utils import annotate_gene_sparsity

    _require_pp(adata_sp)
    _require_pp(adata_ge, hint="Use `project_genes()` to get adata_ge.")
    assert list(adata_sp.uns["overlap_genes"]) == list(adata_ge.uns["overlap_genes"])

    scored_genes = adata_ge.uns["overlap_genes"] if genes is None else genes

    annotate_gene_sparsity(adata_sp)
    scores = _column_cosine(
        _as_dense(adata_ge[:, scored_genes].X), _as_dense(adata_sp[:, scored_genes].X)
    )

    report = pd.DataFrame({"score": scores}, index=scored_genes)
    for source in (adata_ge, adata_sp):
        if "is_training" in source.var.keys():
            report["is_training"] = source.var.is_training
    report["sparsity_sp"] = adata_sp[:, scored_genes].var.sparsity

    if adata_sc is None:
        logging.info(
            "To create dataframe with column 'sparsity_sc' or 'sparsity_diff', "
            "please also pass adata_sc to the function."
        )
    else:
        _require_pp(adata_sc)
        assert list(adata_sc.uns["overlap_genes"]) == list(
            adata_sp.uns["overlap_genes"]
        )
        annotate_gene_sparsity(adata_sc)
        report["sparsity_sc"] = adata_sc[:, scored_genes].var["sparsity"]
        report["sparsity_diff"] = report["sparsity_sp"] - report["sparsity_sc"]

    if genes is not None:
        report = report.loc[genes]
    return report.sort_values(by="score", ascending=False)


def cv_data_gen(adata_sc, adata_sp, cv_mode="loo"):
    """Yield (train_genes, test_genes) splits of the training genes
    (ref utils.py:466-500): leave-one-out or 10-fold."""
    for adata in (adata_sc, adata_sp):
        if "training_genes" not in adata.uns.keys():
            raise ValueError("Missing tangram parameters. Run `pp_adatas()`.")
    if list(adata_sp.uns["training_genes"]) != list(adata_sc.uns["training_genes"]):
        raise ValueError(
            "Unmatched training_genes field in two Anndatas. Run `pp_adatas()`."
        )

    genes = np.asarray(adata_sp.uns["training_genes"])

    if cv_mode == "loo":
        from sklearn.model_selection import LeaveOneOut as Splitter

        splitter = Splitter()
    elif cv_mode == "10fold":
        from sklearn.model_selection import KFold

        splitter = KFold(n_splits=10)
    else:
        raise ValueError("Invalid cv_mode; use 'loo' or '10fold'.")

    for train_idx, test_idx in splitter.split(genes):
        yield list(genes[train_idx]), list(genes[test_idx])


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
    fold_batch_size="auto",
    mesh=None,
    resume_path=None,
):
    """Gene-holdout cross-validation (ref utils.py:503-668).

    TPU-native difference: with ``batched`` (the default), all folds train as
    one vmapped, jit-compiled batch over padded gene masks instead of a
    fold-per-retraining Python loop — identical math per fold, one compile,
    one device round-trip. ``batched=False`` selects the reference-style
    sequential loop. ``fold_batch_size='auto'`` sizes the chunk to the
    device memory budget (each batched fold carries its own M + Adam
    moments). ``mesh`` spreads folds over the mesh axis named ``"fold"`` (or
    its first axis) — Tangram's natural data parallelism — and any REMAINING
    mesh axes tensor-shard each fold's cell dimension (hierarchical DP×TP:
    e.g. a ``("fold", "cell")`` mesh trains fold groups in parallel while
    each group's chips split the logits and Adam moments by cells), so
    per-fold problems larger than one chip's HBM still cross-validate.
    ``resume_path`` journals every completed fold chunk to a JSONL file (a
    ``<path>.preds/`` sidecar holds per-fold predictions when
    ``return_gene_pred``): a killed LOO sweep resumes where it stopped,
    recomputing at most one in-flight chunk — assuming the same arguments
    (mode / cv fold split / epochs / seed are validated; loss weights and
    the schedule are the caller's responsibility). Batched path only.
    """
    kwargs = dict(
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
    )
    if batched == "auto":
        batched = mode in ("clusters", "cells", "constrained")
    if batched:
        return _cross_val_batched(
            adata_sc, adata_sp, fold_batch_size=fold_batch_size, mesh=mesh,
            resume_path=resume_path, **kwargs
        )
    if resume_path is not None:
        raise ValueError(
            "resume_path requires the batched cross_val path "
            "(batched=True or a batched-capable mode)"
        )
    return _cross_val_loop(adata_sc, adata_sp, device=device, **kwargs)


def _cross_val_loop(
    adata_sc,
    adata_sp,
    *,
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
    """Reference-style sequential CV: one full retraining per fold."""
    from tqdm import tqdm

    from .mapping import adata_to_cluster_expression, map_cells_to_space

    n_folds = (
        len(list(adata_sc.uns["training_genes"])) if cv_mode == "loo" else 10
    )
    sc_for_scoring = (
        adata_to_cluster_expression(adata_sc, cluster_label, scale)
        if mode == "clusters"
        else adata_sc
    )

    records = []
    held_out_predictions = []

    for fold_no, (train_genes, test_genes) in enumerate(
        tqdm(cv_data_gen(adata_sc, adata_sp, cv_mode), total=n_folds), start=1
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

        fold_genes = train_genes + test_genes
        adata_ge = project_genes(
            adata_map, adata_sc[:, fold_genes], cluster_label=cluster_label, scale=scale
        )
        if cv_mode == "loo" and return_gene_pred:
            held_out_predictions.append(adata_ge[:, test_genes].X.T)

        scores = compare_spatial_geneexp(adata_ge, adata_sp, sc_for_scoring, fold_genes)
        fold = {
            "test_genes": test_genes,
            "test_df": scores[scores.index.isin(test_genes)],
            "test_score": scores.loc[test_genes]["score"].mean(),
            "train_score": float(
                list(adata_map.uns["training_history"]["main_loss"])[-1]
            ),
        }
        records.append(fold)
        if verbose:
            print(
                "cv set: {}----train score: {:.3f}----test score: {:.3f}".format(
                    fold_no, fold["train_score"], fold["test_score"]
                )
            )

    test_scores = [r["test_score"] for r in records]
    train_scores = [r["train_score"] for r in records]
    cv_dict = {
        "avg_test_score": np.nanmean(test_scores),
        "avg_train_score": np.nanmean(train_scores),
    }
    print("cv avg test score {:.3f}".format(cv_dict["avg_test_score"]))
    print("cv avg train score {:.3f}".format(cv_dict["avg_train_score"]))

    if cv_mode == "loo" and return_gene_pred:
        adata_ge_cv = adlite.AnnData(
            X=np.squeeze(np.array(held_out_predictions)).T,
            obs=adata_sp.obs.copy(),
            var=pd.DataFrame(
                test_scores,
                columns=["test_score"],
                index=np.squeeze(
                    np.array([r["test_genes"] for r in records], dtype=object)
                ),
            ),
        )
        test_gene_df = pd.concat([r["test_df"] for r in records], axis=0)
        return cv_dict, adata_ge_cv, test_gene_df

    return cv_dict


def _cross_val_batched(
    adata_sc,
    adata_sp,
    *,
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
    mesh=None,
    resume_path=None,
    lambda_count=1,
    lambda_f_reg=1,
    target_count=None,
):
    """All CV folds as one vmapped training batch (TPU-native path),
    optionally sharded over a mesh: folds ride the axis named ``"fold"`` (or
    the first axis), and any remaining axes tensor-shard each fold's cells —
    hierarchical DP×TP, so per-fold problems beyond one chip's HBM still
    batch across the pod."""
    import jax
    import jax.numpy as jnp

    from .mapping import _check_mapping_args, _densify, adata_to_cluster_expression
    from .models.mapper import fit_mapping, init_logits
    from .ops.losses import LossWeights, MapperData
    from .ops.schedules import resolve_lr
    from .utils import annotate_gene_sparsity

    # -- the SAME validator the per-fold loop path hits via
    # map_cells_to_space, so batched and loop cross_val accept/reject
    # identical arguments
    lambda_d = _check_mapping_args(
        mode, lambda_g1, lambda_d, density_prior, cluster_label,
        target_count, lambda_f_reg, lambda_count,
    )
    constrained = mode == "constrained"

    adata_sc_orig = adata_sc
    if mode == "clusters":
        # one aggregation serves both roles (add_density=True is the
        # default, so the scored and mapped views are the same object)
        adata_sc = adata_to_cluster_expression(
            adata_sc, cluster_label, scale, add_density=True
        )
        adata_sc_agg_scored = adata_sc

    training_genes = list(adata_sc.uns["training_genes"])
    S = _densify(adata_sc[:, training_genes].X)
    G = _densify(adata_sp[:, training_genes].X)

    # the same prior resolution map_cells_to_space uses, so the batched and
    # loop CV paths stay in lockstep on density semantics
    from .mapping import _resolve_density

    prior = _resolve_density(mode, density_prior, lambda_d, adata_sc, adata_sp)
    d, d_source, lambda_d = prior.d, prior.d_source, prior.lambda_d

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

    # Mesh layout: folds ride the axis named "fold" (or the mesh's first
    # axis); any REMAINING axes tensor-shard each fold's cells — hierarchical
    # DP×TP, the pod recipe (data parallelism over the slower axis, tensor
    # parallelism within it), so per-fold problems larger than one chip's
    # HBM still cross-validate. Cells must divide evenly over the cell
    # shards; otherwise TP degrades to replication (DP still applies).
    fold_axis = None
    n_cell_shards = 1
    if mesh is not None:
        fold_axis = "fold" if "fold" in mesh.axis_names else mesh.axis_names[0]
        cell_axes = tuple(a for a in mesh.axis_names if a != fold_axis)
        shards = int(np.prod([mesh.shape[a] for a in cell_axes])) if cell_axes else 1
        if cell_axes and n_cells % shards == 0:
            n_cell_shards = shards
        elif cell_axes:
            from .utils import warn_tp_replication

            warn_tp_replication(shards, cell_axes, n_cells, what="per-fold")

    if fold_batch_size == "auto":
        # each batched fold holds its own (cells × spots) logits + two Adam
        # moment buffers in f32; budget ~half the device's reported capacity
        # for them (falls back to 8 GB TPU / 2 GB CPU when the backend
        # reports no memory stats). Tensor-sharding the cell axis divides
        # the per-device share of each fold by the cell-shard count.
        from .utils import device_memory_budget

        per_fold_bytes = n_cells * n_spots * 12 // n_cell_shards
        budget = device_memory_budget()
        fold_batch_size = int(
            np.clip(budget // max(per_fold_bytes, 1), 1, 256)
        )
        if mesh is not None:
            n_dev = int(mesh.shape[fold_axis])
            fold_batch_size = max(n_dev, fold_batch_size // n_dev * n_dev)
    if constrained:
        from .models.mapper import init_constrained_logits

        params0 = init_constrained_logits(n_cells, n_spots, random_state,
                                          method="auto")
    else:
        params0 = init_logits(n_cells, n_spots, random_state, method="auto")

    S_dev, G_dev = jnp.asarray(S), jnp.asarray(G)
    d_dev = None if d is None else jnp.asarray(d)
    dsrc_dev = None if d_source is None else jnp.asarray(d_source, dtype=jnp.float32)
    tc_dev = jnp.float32(target_count) if constrained else None

    lr = resolve_lr(learning_rate, int(num_epochs))

    def run_chunk(mask_chunk):
        data = MapperData(
            S=S_dev, G=G_dev, gene_mask=mask_chunk, d=d_dev, d_source=dsrc_dev,
            target_count=tc_dev,
        )
        in_axes = (None, MapperData(S=None, G=None, gene_mask=0))
        # impl pinned to XLA: batching a custom_vjp-wrapped pallas_call under
        # vmap is a path no test exercises, and XLA batches the per-fold
        # matmuls onto the MXU just as well — the Pallas kernels exist to
        # stream a SINGLE atlas-scale problem, while vmapped folds are
        # by construction small enough to coexist in HBM.
        fit = jax.vmap(
            lambda p0, dat: fit_mapping(
                p0, dat, lw, int(num_epochs), lr,
                constrained=constrained, impl="xla",
            ),
            in_axes=in_axes,
        )
        params, history = fit(params0, data)
        M_final = params[0] if constrained else params
        # (folds, c, s): rows-over-SPOTS is the LAST axis here — axis=1
        # would renormalize over cells and silently depress every test
        # score (caught against the torch reference on the NB fixture:
        # −0.078 held-out LOO score)
        P = jax.nn.softmax(M_final, axis=-1)
        G_pred = jnp.einsum("fcs,cg->fsg", P, S_dev,
                            precision=jax.lax.Precision.HIGHEST)
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

    # crash tolerance: journal each completed fold chunk (scores as JSONL
    # rows, per-fold predictions as .npy sidecars) so an interrupted LOO
    # sweep resumes at the first incomplete chunk
    journal, done_folds, pred_store = None, {}, None
    if resume_path is not None:
        import os

        from .utils import _SweepJournal

        journal = _SweepJournal(
            resume_path,
            meta=dict(
                workload="cross_val", mode=mode, cv_mode=cv_mode,
                num_epochs=int(num_epochs), random_state=random_state,
                n_folds=n_folds, n_genes=len(training_genes),
                return_gene_pred=bool(return_gene_pred),
            ),
        )
        done_folds = {int(rec["fold"]): rec for rec in journal.load()}
        if return_gene_pred:
            pred_store = resume_path + ".preds"
            os.makedirs(pred_store, exist_ok=True)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        fold_sharding = NamedSharding(mesh, PartitionSpec(fold_axis))
        fold_axis_size = int(mesh.shape[fold_axis])
        if n_cell_shards > 1:
            # tensor-shard the unbatched per-fold operands by cells over the
            # non-fold axes; GSPMD propagates the layout through the vmapped
            # scan, so each fold group of devices holds 1/n_cell_shards of
            # its fold's logits and Adam moments
            cell_spec = cell_axes if len(cell_axes) > 1 else cell_axes[0]
            rows = NamedSharding(mesh, PartitionSpec(cell_spec, None))
            vec = NamedSharding(mesh, PartitionSpec(cell_spec))
            S_dev = jax.device_put(S_dev, rows)
            if dsrc_dev is not None:
                dsrc_dev = jax.device_put(dsrc_dev, vec)
            if constrained:
                params0 = (
                    jax.device_put(jnp.asarray(params0[0]), rows),
                    jax.device_put(jnp.asarray(params0[1]), vec),
                )
            else:
                params0 = jax.device_put(jnp.asarray(params0), rows)

    for start in range(0, n_folds, int(fold_batch_size)):
        stop = min(start + int(fold_batch_size), n_folds)
        if journal is not None and all(
            f in done_folds for f in range(start, stop)
        ):
            import os

            for f in range(start, stop):
                rec = done_folds[f]
                all_scores[f] = np.asarray(rec["gene_scores"], np.float64)
                train_scores[f] = float(rec["train_score"])
                if return_gene_pred:
                    arr = np.load(os.path.join(pred_store, f"fold{f}.npy"))
                    for k, tg in enumerate(test_idx_lists[f]):
                        pred_cols[tg] = arr[k]
            if verbose:
                print(f"cv folds {start}-{stop - 1} resumed from journal")
            continue
        chunk = jnp.asarray(masks[start:stop])
        if mesh is not None and (stop - start) % fold_axis_size == 0:
            chunk = jax.device_put(chunk, fold_sharding)
        scores, tr, G_pred = run_chunk(chunk)
        all_scores[start:stop] = scores
        train_scores[start:stop] = tr
        if return_gene_pred:
            for f in range(start, stop):
                for tg in test_idx_lists[f]:
                    pred_cols[tg] = G_pred[f - start, :, tg]
        if journal is not None:
            import os

            if return_gene_pred:
                # predictions first: the journal line is the commit point
                for f in range(start, stop):
                    np.save(
                        os.path.join(pred_store, f"fold{f}.npy"),
                        np.stack(
                            [G_pred[f - start, :, tg]
                             for tg in test_idx_lists[f]]
                        ),
                    )
            journal.append([
                {"fold": f,
                 "gene_scores": [float(x) for x in all_scores[f]],
                 "train_score": float(train_scores[f])}
                for f in range(start, stop)
            ])
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


def _first_occurrence_keep(values, dropped_positions):
    """Keep each element whose *first* occurrence position survives.

    Replicates the reference's ``list.index``-based filter
    (ref utils.py:739-741): an element is kept iff the position of its first
    appearance is not in ``dropped_positions`` — so duplicated values share
    the fate of their first occurrence.
    """
    first_pos = {}
    for i, v in enumerate(values):
        first_pos.setdefault(v, i)
    return [v for v in values if first_pos[v] not in dropped_positions]


def _polynomial_auc(scores, sparsities):
    """Area under a degree-2 fit of (score → sparsity) inside the unit square.

    Quirk-compatible with ref utils.py:710-747: 10-point grid on [0, 1];
    only the first grid value is clamped to 1; one real root in [0, 1] (if
    any) extends the curve to y=0; points outside the unit square are dropped
    by first-occurrence position before ``sklearn.metrics.auc``.
    """
    from sklearn.metrics import auc

    coeffs = np.polyfit(scores, sparsities, 2)
    grid_x = list(np.linspace(0, 1, 10))
    grid_y = [float(np.polyval(coeffs, x)) for x in grid_x]
    grid_y[0] = min(grid_y[0], 1.0)

    real_roots = [
        float(np.real(r))
        for r in np.roots(coeffs)
        if np.isreal(r) and 0 <= np.real(r) <= 1
    ]
    if real_roots:
        grid_x.append(real_roots[0])
        grid_y.append(0.0)

    outside = {
        i
        for i, (x, y) in enumerate(zip(grid_x, grid_y))
        if not (0 <= x <= 1 and 0 <= y <= 1)
    }
    kept_x = _first_occurrence_keep(grid_x, outside)
    kept_y = _first_occurrence_keep(grid_y, outside)

    return float(np.real(auc(kept_x, kept_y))), (kept_x, kept_y)


def eval_metric(df_all_genes, test_genes=None):
    """Summary metrics from a score/sparsity table (ref utils.py:671-758):
    average test/train score, spatial-sparsity-weighted score, and the
    polynomial AUC (golden 0.750597829464878 on the bundled 18k-gene CSV).

    Returns ``(metric_dict, ((curve_x, curve_y), (scores, sparsities)))``.
    """
    if test_genes is None:
        test_genes = list(
            set(df_all_genes[df_all_genes["is_training"] == False].index.values)
        )
    else:
        if not set(test_genes).issubset(set(df_all_genes.index.values)):
            raise ValueError(
                "the input of test_genes should be subset of genes of input dataframe"
            )
        test_genes = np.unique(test_genes)

    if len(test_genes) == 0:
        raise ValueError(
            "No test genes found: pass `test_genes` explicitly or include rows "
            "with is_training == False in df_all_genes."
        )

    test_rows = df_all_genes.loc[test_genes]
    scores = test_rows["score"]
    sparsities = test_rows["sparsity_sp"]
    density = 1 - sparsities

    auc_score, curve = _polynomial_auc(list(scores), list(sparsities))

    metric_dict = {
        "avg_test_score": scores.mean(),
        "avg_train_score": df_all_genes.loc[
            df_all_genes["is_training"] == True, "score"
        ].mean(),
        "sp_sparsity_score": np.sum(scores * density / density.sum()),
        "auc_score": auc_score,
    }
    return metric_dict, (curve, (list(scores), list(sparsities)))
