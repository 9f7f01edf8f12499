"""Tutorial: fault-tolerant, pod-parallel sweeps (cross-validation + tuner).

Two capabilities the reference delegates to Ray (and loses without it):

1. **Hierarchical DP×TP**: on a 2-D mesh, `cross_val` / the tuner put
   folds/trials on the ``"fold"``/``"trial"`` axis and tensor-shard each
   member's logits and Adam moments by cells over the remaining axes — the
   DP-over-DCN / TP-over-ICI pod layout, so per-member problems larger than
   one chip's HBM still batch.
2. **Crash tolerance** (`resume_path=`): every completed batch/chunk is
   journaled to a JSONL file; a killed sweep resumes where it stopped,
   losing at most one in-flight batch (the role Ray Tune's trial fault
   tolerance / ``Tuner.restore`` plays for the reference).

Run: ``python examples/tutorial_fault_tolerant_sweep.py [--cpu]``

Without TPU hardware this runs on a virtual 8-device CPU mesh — the same
code path a pod slice uses (set a real Mesh over ``jax.devices()`` there).
``--cpu`` pins the CPU platform without probing the accelerator (use it
when a configured remote backend is unreachable).
"""

import argparse
import os
import tempfile

# Virtual 8-device CPU mesh when no multi-chip platform is present;
# must be set before jax initializes.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import pandas as pd


def make_adatas(rng, n_cells=36, n_spots=20, n_genes=14):
    import tangram_tpu as tg

    genes = [f"g{i}" for i in range(n_genes)]
    ad_sc = tg.AnnData(
        X=(rng.poisson(2.0, (n_cells, n_genes)) + 1).astype(np.float32),
        obs=pd.DataFrame(
            {"subclass_label": rng.choice(["a", "b", "c"], n_cells)},
            index=[f"c{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=genes),
    )
    ad_sp = tg.AnnData(
        X=(rng.poisson(3.0, (n_spots, n_genes)) + 1).astype(np.float32),
        var=pd.DataFrame(index=genes),
    )
    ad_sp.obsm["spatial"] = rng.random((n_spots, 2)) * 100
    tg.pp_adatas(ad_sc, ad_sp)
    return ad_sc, ad_sp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU devices")
    args = parser.parse_args()

    import jax

    if args.cpu:
        # set BEFORE any backend probe — probing an unreachable remote
        # backend can hang
        jax.config.update("jax_platforms", "cpu")
    elif jax.default_backend() not in ("tpu", "cpu"):
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    import tangram_tpu as tg
    from tangram_tpu import tuning

    rng = np.random.default_rng(0)
    ad_sc, ad_sp = make_adatas(rng)
    workdir = tempfile.mkdtemp()

    # --- hierarchical DP×TP cross-validation --------------------------------
    # folds ride the "fold" axis (2 fold groups in parallel); each group's
    # 3 chips split every fold's logits + Adam moments by cells
    mesh = Mesh(np.asarray(jax.devices()[:6]).reshape(2, 3),
                axis_names=("fold", "cell"))
    cv_path = os.path.join(workdir, "cv_sweep.jsonl")
    cv = tg.cross_val(
        ad_sc, ad_sp, mode="cells", cv_mode="10fold", num_epochs=40,
        random_state=0, verbose=True, fold_batch_size=4, mesh=mesh,
        resume_path=cv_path,
    )
    print("cross_val:", cv)
    # a second call with the same journal retrains NOTHING — every chunk is
    # restored from the file (kill the process mid-sweep and rerun to see a
    # partial resume instead)
    cv_again = tg.cross_val(
        ad_sc, ad_sp, mode="cells", cv_mode="10fold", num_epochs=40,
        random_state=0, verbose=True, fold_batch_size=4, mesh=mesh,
        resume_path=cv_path,
    )
    assert cv_again == cv

    # --- fault-tolerant adaptive tuner over the same mesh -------------------
    tuner_path = os.path.join(workdir, "tuner_sweep.jsonl")
    mesh_t = Mesh(np.asarray(jax.devices()[:6]).reshape(2, 3),
                  axis_names=("trial", "cell"))
    result = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp,
        metric=["gene_expr_correctness", "cell_map_consistency"],
        config={
            "learning_rate": tuning.loguniform(0.02, 0.5),
            "lambda_d": tuning.uniform(0.0, 1.0),
            "num_epochs": 30,
        },
        tuner_num_samples=8, cluster_label="subclass_label",
        density_prior="uniform", random_state=0, population_batch_size=4,
        search="adaptive", mesh=mesh_t, resume_path=tuner_path,
    )
    df = result.get_results().get_dataframe()
    best = result.get_results().get_best_result(
        metric=["gene_expr_correctness", "cell_map_consistency"])
    print(df.round(4).to_string())
    print("best config:", {k: round(v, 4) for k, v in best.config.items()})
    print(f"journal: {tuner_path} ({sum(1 for _ in open(tuner_path))} lines)")


if __name__ == "__main__":
    main()
