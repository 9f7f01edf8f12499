"""Cross-validation: batched-vs-loop equivalence across modes."""

import numpy as np
import pandas as pd
import pytest

import tangram_tpu as tg


@pytest.fixture
def cv_adatas(rng):
    n_cells, n_spots, n_genes = 30, 20, 12
    centers = rng.normal(0, 1, (3, n_genes)) * 2
    labels = rng.integers(0, 3, n_cells)
    S = rng.poisson(np.exp(centers[labels] * 0.5) + 0.5).astype(np.float32)
    G = rng.poisson(
        np.exp(centers[rng.integers(0, 3, n_spots)] * 0.5) + 0.5
    ).astype(np.float32)
    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame(
            {"subclass_label": pd.Categorical([f"c{l}" for l in labels])},
            index=[f"cell{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp = tg.AnnData(
        X=G,
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n_spots)]),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    tg.pp_adatas(ad_sc, ad_sp)
    return ad_sc, ad_sp


@pytest.mark.parametrize("mode,extra", [
    ("cells", {}),
    ("clusters", {"cluster_label": "subclass_label"}),
    ("constrained", {"target_count": 15, "density_prior": "uniform"}),
])
def test_batched_matches_loop(cv_adatas, mode, extra):
    """Batched and loop CV agree. The math per fold is identical (same init,
    same masked loss — asserted tightly at the loss level elsewhere), but
    vmap changes XLA reduction order by ~1e-7/step, and on tiny
    cluster-aggregated problems Adam amplifies that into different-but-
    equivalent optima over many epochs — hence a quality-level tolerance on
    the test score and a tight one on the train score."""
    ad_sc, ad_sp = cv_adatas
    kwargs = dict(mode=mode, cv_mode="10fold", num_epochs=40,
                  random_state=42, verbose=False, **extra)
    cv_b = tg.cross_val(ad_sc, ad_sp, batched=True, **kwargs)
    cv_l = tg.cross_val(ad_sc, ad_sp, batched=False, **kwargs)
    assert cv_b["avg_train_score"] == pytest.approx(cv_l["avg_train_score"], abs=2e-3)
    # test-gene scores are evaluated at held-out genes where equivalent
    # optima differ most; constrained mode's learned filter adds further
    # multimodality — quality-level agreement is the contract
    tol = 5e-2 if mode == "constrained" else 2e-2
    assert cv_b["avg_test_score"] == pytest.approx(cv_l["avg_test_score"], abs=tol)


def test_batched_loo_per_gene_matches_loop(cv_adatas):
    """Per-gene LOO test scores from the batched path match the loop path.

    Regression guard for the batched scorer itself (as opposed to trajectory
    equivalence): the batched path once renormalized the stacked
    (folds, cells, spots) logits with softmax over axis=1 — the CELL axis —
    which passed the aggregate-score tolerance above at short horizons while
    depressing real held-out scores by −0.078 against the torch reference.
    Per-gene agreement after enough epochs for M to leave init is the
    contract that catches wrong-slice/wrong-axis scoring."""
    ad_sc, ad_sp = cv_adatas
    kwargs = dict(mode="clusters", cluster_label="subclass_label",
                  cv_mode="loo", num_epochs=250, random_state=42,
                  verbose=False, return_gene_pred=True)
    _, _, df_b = tg.cross_val(ad_sc, ad_sp, batched=True, **kwargs)
    _, _, df_l = tg.cross_val(ad_sc, ad_sp, batched=False, **kwargs)
    scores_b = df_b["score"].sort_index()
    scores_l = df_l["score"].sort_index()
    np.testing.assert_allclose(
        scores_b.to_numpy(), scores_l.to_numpy(), atol=2e-2,
        err_msg="per-gene batched LOO scores diverged from the loop path",
    )


def test_loo_return_gene_pred_batched(cv_adatas):
    ad_sc, ad_sp = cv_adatas
    cv_dict, ad_ge_cv, test_df = tg.cross_val(
        ad_sc, ad_sp, mode="cells", cv_mode="loo", num_epochs=20,
        random_state=1, return_gene_pred=True,
    )
    n_genes = len(ad_sc.uns["training_genes"])
    assert ad_ge_cv.shape == (ad_sp.n_obs, n_genes)
    assert len(test_df) == n_genes
    assert "test_score" in ad_ge_cv.var.columns
    assert (test_df["is_training"] == False).all()


def test_cv_data_gen_modes(cv_adatas):
    ad_sc, ad_sp = cv_adatas
    folds_loo = list(tg.cv_data_gen(ad_sc, ad_sp, "loo"))
    assert len(folds_loo) == len(ad_sc.uns["training_genes"])
    assert all(len(test) == 1 for _, test in folds_loo)
    folds_10 = list(tg.cv_data_gen(ad_sc, ad_sp, "10fold"))
    assert len(folds_10) == 10
    with pytest.raises(ValueError):
        list(tg.cv_data_gen(ad_sc, ad_sp, "bogus"))


def test_cross_val_fold_mesh(cv_adatas):
    """Fold-axis data parallelism: cross_val(mesh=...) must reproduce the
    single-device batched result exactly (same math, folds spread over
    devices)."""
    import jax
    from jax.sharding import Mesh

    ad_sc, ad_sp = cv_adatas
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(-1), axis_names=("fold",))
    base = tg.cross_val(ad_sc, ad_sp, mode="cells", cv_mode="10fold",
                        num_epochs=30, random_state=7, verbose=False,
                        fold_batch_size=8)
    sharded = tg.cross_val(ad_sc, ad_sp, mode="cells", cv_mode="10fold",
                           num_epochs=30, random_state=7, verbose=False,
                           fold_batch_size=8, mesh=mesh)
    assert sharded["avg_test_score"] == pytest.approx(base["avg_test_score"], abs=1e-5)
    assert sharded["avg_train_score"] == pytest.approx(base["avg_train_score"], abs=1e-5)


@pytest.mark.parametrize("mode,extra", [
    ("cells", {}),
    ("constrained", {"target_count": 15, "density_prior": "uniform"}),
])
def test_cross_val_hierarchical_mesh(cv_adatas, mode, extra):
    """Hierarchical DP×TP: on a 2-D ("fold", "cell") mesh, folds spread over
    the fold axis while each fold's logits/Adam moments are tensor-sharded by
    cells (30 cells over 3 shards) — and the result must still reproduce the
    single-device batched run exactly."""
    import jax
    from jax.sharding import Mesh

    ad_sc, ad_sp = cv_adatas
    mesh = Mesh(
        np.asarray(jax.devices()[:6]).reshape(2, 3), axis_names=("fold", "cell")
    )
    kwargs = dict(mode=mode, cv_mode="10fold", num_epochs=30, random_state=7,
                  verbose=False, fold_batch_size=8, **extra)
    base = tg.cross_val(ad_sc, ad_sp, **kwargs)
    sharded = tg.cross_val(ad_sc, ad_sp, mesh=mesh, **kwargs)
    assert sharded["avg_test_score"] == pytest.approx(base["avg_test_score"], abs=1e-5)
    assert sharded["avg_train_score"] == pytest.approx(base["avg_train_score"], abs=1e-5)


def test_cross_val_resume(cv_adatas, tmp_path):
    """resume_path journals each completed fold chunk: a killed LOO sweep
    resumes at the first incomplete chunk and reproduces the uninterrupted
    result exactly (same chunk composition → same numerics), including the
    loo gene predictions restored from the .preds sidecar."""
    ad_sc, ad_sp = cv_adatas
    kwargs = dict(mode="cells", cv_mode="loo", num_epochs=15, random_state=3,
                  verbose=False, fold_batch_size=4, return_gene_pred=True)
    base, base_ge, base_df = tg.cross_val(ad_sc, ad_sp, **kwargs)

    path = str(tmp_path / "cv.jsonl")
    full, full_ge, _ = tg.cross_val(ad_sc, ad_sp, resume_path=path, **kwargs)
    assert full == base
    np.testing.assert_array_equal(np.asarray(full_ge.X), np.asarray(base_ge.X))

    # crash after the first chunk: keep meta + 4 fold lines
    lines = open(path).read().splitlines()
    with open(path, "w") as f:
        f.write("\n".join(lines[:5]) + "\n")
    resumed, res_ge, res_df = tg.cross_val(ad_sc, ad_sp, resume_path=path,
                                           **kwargs)
    assert resumed == base
    np.testing.assert_array_equal(np.asarray(res_ge.X), np.asarray(base_ge.X))
    pd.testing.assert_frame_equal(res_df, base_df)

    # completed journal: everything restored, nothing retrained
    again, again_ge, _ = tg.cross_val(ad_sc, ad_sp, resume_path=path, **kwargs)
    assert again == base
    np.testing.assert_array_equal(np.asarray(again_ge.X), np.asarray(base_ge.X))

    # journals from different sweep settings are rejected, as is the
    # (reference-style) loop path
    with pytest.raises(ValueError, match="different sweep"):
        tg.cross_val(ad_sc, ad_sp, resume_path=path,
                     **{**kwargs, "random_state": 4})
    with pytest.raises(ValueError, match="batched"):
        tg.cross_val(ad_sc, ad_sp, resume_path=path, batched=False, **kwargs)


def test_fold_batch_auto_sizing(cv_adatas, monkeypatch):
    """'auto' fold batching fits the device budget: a (simulated) large
    problem gets batch 1, a small one the 256 cap, and the result matches an
    explicit batch size."""
    from tangram_tpu import evaluation

    ad_sc, ad_sp = cv_adatas
    base = tg.cross_val(ad_sc, ad_sp, mode="cells", cv_mode="10fold",
                        num_epochs=20, random_state=5, verbose=False,
                        fold_batch_size=4)
    auto = tg.cross_val(ad_sc, ad_sp, mode="cells", cv_mode="10fold",
                        num_epochs=20, random_state=5, verbose=False,
                        fold_batch_size="auto")
    assert auto["avg_test_score"] == pytest.approx(base["avg_test_score"], abs=1e-5)


def test_batched_validation_matches_loop(cv_adatas):
    """Both cross_val paths must accept/reject identical arguments: the
    batched path runs the same validator the loop path hits through
    map_cells_to_space."""
    import pytest

    ad_sc, ad_sp = cv_adatas
    for batched in (True, False):
        with pytest.raises(ValueError, match="density_prior"):
            tg.cross_val(ad_sc, ad_sp, mode="cells", lambda_d=1,
                         density_prior=None, num_epochs=2, verbose=False,
                         cv_mode="10fold", batched=batched)
        with pytest.raises(ValueError, match="Invalid input for density_prior"):
            tg.cross_val(ad_sc, ad_sp, mode="cells", lambda_d=1,
                         density_prior="rna_count", num_epochs=2,
                         verbose=False, cv_mode="10fold", batched=batched)


def test_cross_val_with_lr_schedule(cv_adatas):
    """cross_val accepts a per-epoch lr vector on both the batched and loop
    paths (the fold count is known, so one schedule serves every fold)."""
    ad_sc, ad_sp = cv_adatas
    lrs = tg.cosine_lr(peak=0.4, num_epochs=30, end=0.05)
    kwargs = dict(mode="cells", cv_mode="10fold", num_epochs=30,
                  random_state=42, verbose=False, learning_rate=lrs)
    cv_b = tg.cross_val(ad_sc, ad_sp, batched=True, **kwargs)
    cv_l = tg.cross_val(ad_sc, ad_sp, batched=False, **kwargs)
    assert cv_b["avg_train_score"] == pytest.approx(
        cv_l["avg_train_score"], abs=2e-3
    )
    assert 0.0 < cv_b["avg_test_score"] <= 1.0


def test_projected_expression_sharded_M(rng):
    """A mesh-sharded M (the fit_mapping_fused_sharded result at pod scale)
    projects under GSPMD without a host gather, matching the host matmul."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from tangram_tpu.evaluation import projected_expression

    M = rng.normal(0, 1, (32, 24)).astype(np.float32)
    X = rng.poisson(2.0, (32, 10)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("cell", "spot"))
    M_sh = jax.device_put(
        jnp.asarray(M), NamedSharding(mesh, PartitionSpec("cell", "spot"))
    )
    out = projected_expression(M_sh, X)
    np.testing.assert_allclose(out, M.T @ X, rtol=1e-5, atol=1e-5)


def test_cross_val_tp_fallback_warns(cv_adatas, caplog):
    """When the mesh requests cell sharding but n_cells does not divide the
    cell-shard count, TP degrades to replication — LOUDLY (VERDICT r4 #8:
    at pod scale a silent fallback means 8x the budgeted per-chip HBM,
    discovered via OOM)."""
    import logging

    import jax
    from jax.sharding import Mesh

    ad_sc, ad_sp = cv_adatas  # 30 cells: not divisible by 4
    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), axis_names=("fold", "cell")
    )
    with caplog.at_level(logging.WARNING):
        tg.cross_val(
            ad_sc, ad_sp, mode="cells", cv_mode="10fold", num_epochs=2,
            random_state=1, verbose=False, fold_batch_size=8, mesh=mesh,
        )
    msgs = [r.message for r in caplog.records if "REPLICATION" in r.message]
    assert msgs, "expected a TP-replication warning"
    assert "4-way" in msgs[0] and "n_cells=30" in msgs[0]
    # padded remedy is stated: 30 -> 32
    assert "32" in msgs[0]
