#!/usr/bin/env python
"""Run the torch reference optimizer side-by-side with the rebuild on the
NB-matched fixture (VERDICT r4 #3).

The round-4 bench reported NB-matched accuracy numbers (LOO-CV test score
0.4526, annotation-recovery median corr 0.272) with no reference run beside
them — nobody could say whether those are a data ceiling or a method gap.
This script answers that: it imports the reference optimizer LIVE from
/root/reference (never copied; same mechanism as tests/_reference.py) and
runs it on the *identical* fixtures, with the rebuild run in the same
process on the same arrays:

* **LOO leg** — the ``_loo_cv_seconds`` nb_matched fixture
  (``synthetic_mapping_pair(n_cells=1320, n_spots=9852, n_genes=249,
  n_types=22, random_state=5)``, clusters mode, the reference cross_val
  recipe ``/root/reference/tangram/utils.py:503``: subset to train genes,
  train 1000 epochs lr=0.1 seed=42, project all genes, cosine on the
  held-out gene). The torch loop is CPU-bound, so it runs a deterministic
  subset of folds (every ``--fold-stride``-th gene); the rebuild's scores on
  the SAME subset come from its batched LOO ``test_gene_df``.
* **Annotation-recovery leg** — a CPU-sized cells-mode draw
  (``synthetic_mapping_pair(n_cells=2600, ...)``, random_state=0,
  ``density_prior='rna_count_based'``, ``lambda_d=1`` — the headline
  ``nb_matched`` recipe at 10% of the cell count so torch finishes). Both
  sides use the numpy seed-42 init, i.e. bit-identical starting logits.

Writes ``data/NB_REFERENCE_TORCH.json``; ``bench.py`` attaches it to the
``nb_matched`` block with a parity verdict.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF_OPTIMIZER = "/root/reference/tangram/mapping_optimizer.py"


def load_reference_optimizer():
    import importlib.util

    if not os.path.exists(REF_OPTIMIZER):
        return None
    spec = importlib.util.spec_from_file_location(
        "ref_mapping_optimizer", REF_OPTIMIZER
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _cosine_per_gene(A, B):
    """Column-wise cosine similarity of two (spots × genes) matrices."""
    num = (A * B).sum(axis=0)
    den = np.linalg.norm(A, axis=0) * np.linalg.norm(B, axis=0)
    return num / np.maximum(den, 1e-30)


def loo_leg(ref, fold_stride=10, num_epochs=1000, flush_partial=None):
    """Clusters-mode LOO on the bench's nb_matched CV fixture: torch on a
    fold subset, the rebuild's batched LOO restricted to the same subset.

    ``flush_partial(partial_dict)``, when given, is called after every torch
    fold so a killed run keeps all folds completed so far (single-CPU box:
    the torch loop dominates the wall time)."""
    import tangram_tpu as tg
    from tangram_tpu.datasets import synthetic_mapping_pair
    from tangram_tpu.mapping import adata_to_cluster_expression

    nb_sc, nb_sp = synthetic_mapping_pair(
        n_cells=22 * 60, n_spots=9_852, n_genes=249, n_types=22,
        random_state=5,
    )
    tg.pp_adatas(nb_sc, nb_sp)

    # rebuild: full batched LOO with per-gene scores (jax, CPU here)
    t0 = time.perf_counter()
    cv_dict, _, test_gene_df = tg.cross_val(
        nb_sc, nb_sp, cluster_label="subclass_label", mode="clusters",
        cv_mode="loo", random_state=42, num_epochs=num_epochs,
        verbose=False, return_gene_pred=True,
    )
    jax_seconds = time.perf_counter() - t0

    # the reference cross_val data path (utils.py:503 → map_cells_to_space
    # mode='clusters'): cluster-aggregated S, uniform density prior with
    # lambda_d forced to 1, cluster_density as d_source
    sc_agg = adata_to_cluster_expression(
        nb_sc, "subclass_label", scale=True, add_density=True
    )
    training_genes = list(sc_agg.uns["training_genes"])
    S = np.asarray(sc_agg[:, training_genes].X, dtype=np.float32)
    G = np.asarray(nb_sp[:, training_genes].X, dtype=np.float32)
    d_uniform = np.asarray(nb_sp.obs["uniform_density"], dtype=np.float32)
    d_source = np.asarray(sc_agg.obs["cluster_density"], dtype=np.float32)

    subset = list(range(0, len(training_genes), fold_stride))
    torch_scores = {}
    t0 = time.perf_counter()

    def summarize(done):
        subset_genes = [training_genes[j] for j in done]
        jax_subset = [
            float(test_gene_df.loc[g, "score"]) for g in subset_genes
        ]
        torch_subset = [torch_scores[g] for g in subset_genes]
        per_gene_delta = np.asarray(jax_subset) - np.asarray(torch_subset)
        return {
            "fixture": "synthetic_mapping_pair(1320 cells, 9852 spots, 249 "
                       "genes, 22 types, random_state=5), clusters LOO, "
                       f"{num_epochs} epochs lr=0.1 seed=42",
            "n_folds_compared": len(done),
            "n_folds_planned": len(subset),
            "fold_stride": fold_stride,
            # per-fold torch scores keyed by gene name so the rebuild side
            # can be re-scored later without repeating the CPU torch loop
            "torch_per_gene": {g: round(torch_scores[g], 4)
                               for g in subset_genes},
            "rebuild_per_gene": {g: round(s, 4)
                                 for g, s in zip(subset_genes, jax_subset)},
            "reference_torch_avg_test_score": round(
                float(np.mean(torch_subset)), 4
            ),
            "rebuild_avg_test_score_same_folds": round(
                float(np.mean(jax_subset)), 4
            ),
            "rebuild_avg_test_score_all_folds": round(
                float(cv_dict["avg_test_score"]), 4
            ),
            "per_gene_abs_delta_max": round(
                float(np.abs(per_gene_delta).max()), 4
            ),
            "per_gene_delta_mean": round(float(per_gene_delta.mean()), 4),
            "reference_torch_seconds_subset_cpu": round(
                time.perf_counter() - t0, 1
            ),
            "rebuild_seconds_all_folds": round(jax_seconds, 1),
        }

    for n_done, j in enumerate(subset):
        print(f"torch LOO fold {n_done + 1}/{len(subset)} "
              f"(gene {training_genes[j]}), "
              f"{time.perf_counter() - t0:.0f}s elapsed", flush=True)
        train_idx = [i for i in range(len(training_genes)) if i != j]
        mapper = ref.Mapper(
            S=S[:, train_idx], G=G[:, train_idx],
            d=d_uniform, d_source=d_source,
            lambda_g1=1.0, lambda_d=1.0,
            device="cpu", random_state=42,
        )
        M_probs, _ = mapper.train(
            num_epochs=num_epochs, learning_rate=0.1, print_each=None
        )
        G_pred = M_probs.T @ S  # all genes, like reference project_genes
        score = _cosine_per_gene(G_pred[:, [j]], G[:, [j]])[0]
        torch_scores[training_genes[j]] = float(score)
        if flush_partial is not None:
            flush_partial(summarize(subset[: n_done + 1]))

    return summarize(subset)


def annotation_leg(ref, n_cells=2_600, num_epochs=1000):
    """Cells-mode mapping + annotation-recovery correlation on an identical
    CPU-sized NB fixture; both sides start from the identical numpy seed-42
    init (the reference's init stream, mapping_optimizer.py:148-150)."""
    import tangram_tpu as tg
    from tangram_tpu.datasets import synthetic_mapping_pair

    ad_sc, ad_sp = synthetic_mapping_pair(
        n_cells=n_cells, n_spots=9_852, n_genes=249, random_state=0
    )
    tg.pp_adatas(ad_sc, ad_sp)
    training_genes = list(ad_sc.uns["training_genes"])
    S = np.asarray(ad_sc[:, training_genes].X, dtype=np.float32)
    G = np.asarray(ad_sp[:, training_genes].X, dtype=np.float32)
    d_rna = np.asarray(ad_sp.obs["rna_count_based_density"], dtype=np.float32)

    labels = np.asarray(ad_sc.obs["subclass_label"])
    truth_df = ad_sp.uns["true_type_fractions"]
    types = list(truth_df.columns)
    onehot = np.stack([(labels == t).astype(np.float32) for t in types], 1)
    truth = truth_df.to_numpy()

    def recovery(M_probs):
        pred = M_probs.T @ onehot
        corrs = [
            float(np.corrcoef(pred[:, t], truth[:, t])[0, 1])
            for t in range(truth.shape[1])
        ]
        return float(np.median(corrs)), float(np.mean(corrs))

    # torch reference
    t0 = time.perf_counter()
    mapper = ref.Mapper(
        S=S, G=G, d=d_rna, lambda_g1=1.0, lambda_d=1.0,
        device="cpu", random_state=42,
    )
    M_ref, hist_ref = mapper.train(
        num_epochs=num_epochs, learning_rate=0.1, print_each=None
    )
    torch_seconds = time.perf_counter() - t0
    ref_median, ref_mean = recovery(M_ref)
    ref_train = float(np.asarray(hist_ref["main_loss"][-1]))

    # rebuild through the public API, same fixture, same init stream
    t0 = time.perf_counter()
    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, num_epochs=num_epochs, learning_rate=0.1,
        random_state=42, lambda_d=1.0, density_prior="rna_count_based",
        verbose=False, init_method="numpy",
    )
    jax_seconds = time.perf_counter() - t0
    jax_median, jax_mean = recovery(np.asarray(ad_map.X))
    jax_train = float(ad_map.uns["training_history"]["main_loss"][-1])

    return {
        "fixture": f"synthetic_mapping_pair({n_cells} cells, 9852 spots, "
                   "249 genes, random_state=0), cells mode, "
                   "rna_count_based prior, lambda_d=1, "
                   f"{num_epochs} epochs lr=0.1 seed=42 (identical inits)",
        "reference_torch": {
            "final_train_score": round(ref_train, 4),
            "annotation_recovery_median_corr": round(ref_median, 3),
            "annotation_recovery_mean_corr": round(ref_mean, 3),
            "seconds_cpu": round(torch_seconds, 1),
        },
        "rebuild": {
            "final_train_score": round(jax_train, 4),
            "annotation_recovery_median_corr": round(jax_median, 3),
            "annotation_recovery_mean_corr": round(jax_mean, 3),
            "seconds_rebuild": round(jax_seconds, 1),
        },
        "train_score_delta": round(jax_train - ref_train, 4),
        "recovery_median_delta": round(jax_median - ref_median, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-stride", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "NB_REFERENCE_TORCH.json"))
    args = ap.parse_args()

    ref = load_reference_optimizer()
    if ref is None:
        print("reference optimizer unavailable; nothing to do", file=sys.stderr)
        return 1

    import jax

    result = {
        # the JAX_PLATFORMS=cpu default above does NOT stick on hosts whose
        # sitecustomize pre-imports jax with a TPU plugin — record what the
        # rebuild actually ran on
        "rebuild_backend": jax.default_backend(),
        "purpose": "torch-reference side-by-side on the NB-matched fixture "
                   "(VERDICT r4 #3); reference imported live from "
                   "/root/reference, run on this host's CPU (the "
                   "reference's published hardware was a GPU — timing "
                   "columns are not a speed comparison, the score columns "
                   "are the point)",
    }

    def flush_partial():
        result["recorded_utc"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        )
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")

    # annotation leg first (shorter); flush after each leg so a killed run
    # keeps everything completed so far
    print("=== annotation-recovery leg ===", flush=True)
    result["annotation_recovery"] = annotation_leg(ref, num_epochs=args.epochs)
    flush_partial()
    print(json.dumps(result["annotation_recovery"], indent=1), flush=True)

    print("=== LOO leg ===", flush=True)

    def per_fold(partial):
        partial["partial"] = True
        result["loo_cv"] = partial
        flush_partial()

    result["loo_cv"] = loo_leg(
        ref, args.fold_stride, args.epochs, flush_partial=per_fold
    )
    result["loo_cv"].pop("partial", None)
    flush_partial()
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
