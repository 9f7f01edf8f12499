"""Hyperparameter-tuner tests: stability metrics vs the reference formulas,
and the end-to-end population search."""

import numpy as np
import pandas as pd
import pytest

import tangram_tpu as tg
from tangram_tpu import tuning

from _reference import load_reference_optimizer

REF = load_reference_optimizer()


def test_pearson_corr_shape(rng):
    cube = rng.normal(size=(3, 5, 7))
    out = tuning.pearson_corr(cube)
    assert out.shape == (3,)  # 3 choose 2 pairs
    # identical runs → correlation 1
    same = np.stack([cube[0]] * 3)
    np.testing.assert_allclose(tuning.pearson_corr(same), 1.0, rtol=1e-12)


def test_vote_entropy_bounds(rng):
    cube = rng.random((3, 6, 4))
    v = tuning.vote_entropy(cube)
    assert v.shape == (6,)
    assert (v >= 0).all() and (v <= 1 + 1e-9).all()
    # all runs agree on the argmax → zero vote entropy
    agree = np.zeros((3, 6, 4))
    agree[:, :, 1] = 1.0
    np.testing.assert_allclose(tuning.vote_entropy(agree), 0.0, atol=1e-12)


def test_consensus_entropy_uniform_is_one():
    cube = np.full((3, 5, 8), 1 / 8)
    np.testing.assert_allclose(tuning.consensus_entropy(cube), 1.0, rtol=1e-12)


@pytest.fixture
def tuner_adatas(rng):
    n_cells, n_spots, n_genes = 30, 24, 12
    S = (rng.poisson(2.0, (n_cells, n_genes)) + 1).astype(np.float32)
    G = (rng.poisson(2.0, (n_spots, n_genes)) + 1).astype(np.float32)
    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame(
            {"subclass_label": pd.Categorical(rng.choice(["a", "b", "c"], n_cells))},
            index=[f"c{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp = tg.AnnData(
        X=G,
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n_spots)]),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    ad_sp.obsm["spatial"] = rng.random((n_spots, 2))
    tg.pp_adatas(ad_sc, ad_sp)
    return ad_sc, ad_sp


def test_tuner_end_to_end(tuner_adatas):
    ad_sc, ad_sp = tuner_adatas
    metric = ["cell_map_consistency", "gene_expr_correctness"]
    config = {
        "learning_rate": tuning.loguniform(0.01, 0.5),
        "lambda_g1": tuning.uniform(0.5, 1.0),
        "lambda_r": tuning.loguniform(1e-12, 1e-3),
        "num_epochs": 30,
    }
    tuner = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, metric, config, tuner_num_samples=4,
        cluster_label="subclass_label",
    )
    df = tuner.get_results().get_dataframe()
    assert len(df) == 4
    for m in tuning.METRIC_KEYS:
        assert m in df.columns
        assert np.isfinite(df[m]).all()
    assert "config/learning_rate" in df.columns
    assert (df["config/lambda_g1"] >= 0.5).all() and (df["config/lambda_g1"] <= 1.0).all()
    # stability metrics live in [−1, 1] / [0, 1] ranges
    assert (df["cell_map_consistency"] <= 1.0 + 1e-6).all()
    assert (df["cell_map_agreement"] <= 1.0 + 1e-6).all()


def test_tuner_validates_inputs(tuner_adatas):
    ad_sc, ad_sp = tuner_adatas
    with pytest.raises(ValueError, match='"metric"'):
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, ["not_a_metric"], {"lambda_g1": 1.0},
            cluster_label="subclass_label", tuner_num_samples=1,
        )
    with pytest.raises(ValueError, match='"config"'):
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, ["cell_map_consistency"], {"bogus": 1.0},
            cluster_label="subclass_label", tuner_num_samples=1,
        )
    with pytest.raises(ValueError, match="cluster_label"):
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, ["cell_map_consistency"], {"lambda_g1": 1.0},
            cluster_label=None, tuner_num_samples=1,
        )


@pytest.mark.skipif(REF is None, reason="reference torch optimizer unavailable")
def test_tuner_loss_matches_reference_terms(rng):
    """The traced-lambda tuner loss equals the reference loss for the
    tuner's term subset."""
    import jax.numpy as jnp
    import torch

    c, s, g = 14, 10, 6
    S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
    M = rng.normal(0, 1, (c, s)).astype(np.float32)
    d = rng.random(s).astype(np.float32)
    d /= d.sum()
    W = (rng.random((s, s)) * (rng.random((s, s)) < 0.5)).astype(np.float32)
    ct = np.zeros((c, 3), np.float32)
    ct[np.arange(c), rng.integers(0, 3, c)] = 1

    lam = dict(lambda_g1=0.9, lambda_g2=0.4, lambda_d=0.6, lambda_r=0.05,
               lambda_l1=0.02, lambda_l2=0.01, lambda_neighborhood_g1=0.3,
               lambda_ct_islands=0.25, lambda_getis_ord=0.35)

    ref = REF.Mapper(
        S=S, G=G, d=d, voxel_weights=W, neighborhood_filter=W, ct_encode=ct,
        spatial_weights=W, **lam,
    )
    ref.M = torch.tensor(M, dtype=torch.float32, requires_grad=True)
    ref_total = float(ref._loss_fn(verbose=False)[0].detach())

    getis_ref = (W @ G) / G.sum(axis=0)
    arrays = tuple(
        jnp.asarray(x) for x in (S, G, d, np.ones(g, np.float32), W, W, ct, W, getis_ref)
    )
    total, _ = tuning._tuner_loss(jnp.asarray(M), {k: jnp.float32(v) for k, v in lam.items()}, arrays)
    assert float(total) == pytest.approx(ref_total, rel=3e-4)


def test_tuner_loss_active_skip_is_exact():
    """Statically skipping terms whose λ is zero across the population must
    be bit-identical to computing them with λ = 0 — value AND gradient
    (the skip is what keeps non-spatial populations off the dense
    (spots × spots) W-products)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    c, s, g = 12, 9, 7
    S = rng.random((c, g)).astype(np.float32)
    G = rng.random((s, g)).astype(np.float32)
    d = rng.random(s).astype(np.float32)
    d /= d.sum()
    W = (rng.random((s, s)) * (rng.random((s, s)) < 0.5)).astype(np.float32)
    ct = np.zeros((c, 3), np.float32)
    ct[np.arange(c), rng.integers(0, 3, c)] = 1
    M = rng.normal(size=(c, s)).astype(np.float32)
    getis_ref = (W @ G) / G.sum(axis=0)
    arrays = tuple(
        jnp.asarray(x)
        for x in (S, G, d, np.ones(g, np.float32), W, W, ct, W, getis_ref)
    )
    # spatial λs zero; only g1/d/r carry weight
    lam = {k: jnp.float32(0.0) for k in tuning.TUNABLE_KEYS
           if k.startswith("lambda")}
    lam.update(lambda_g1=jnp.float32(1.0), lambda_d=jnp.float32(0.7),
               lambda_r=jnp.float32(0.01))
    active = tuning._active_lambdas(
        [{"lambda_g1": 1.0, "lambda_d": 0.7, "lambda_r": 0.01}],
        [k for k in lam],
    )
    assert "lambda_getis_ord" not in active

    def loss(m, act):
        return tuning._tuner_loss(m, lam, arrays, act)[0]

    full_v, full_g = jax.value_and_grad(loss)(jnp.asarray(M), None)
    skip_v, skip_g = jax.value_and_grad(loss)(jnp.asarray(M), active)
    assert float(full_v) == float(skip_v)
    np.testing.assert_array_equal(np.asarray(full_g), np.asarray(skip_g))


def test_result_grid_get_best_result():
    """Ray API parity: ResultGrid.get_best_result returns a Result-shaped
    object with .config/.metrics; single metric picks the max (or min),
    a metric list picks Pareto-best by the samplers' ordering rule."""
    df = pd.DataFrame({
        "gene_expr_correctness": [0.2, 0.9, 0.5],
        "cell_map_consistency": [0.8, 0.1, 0.7],
        "config/learning_rate": [0.1, 0.2, 0.3],
    })
    grid = tuning._ResultGrid(df)
    best = grid.get_best_result(metric="gene_expr_correctness")
    assert best.config == {"learning_rate": 0.2}
    assert best.metrics["gene_expr_correctness"] == 0.9
    worst = grid.get_best_result(metric="gene_expr_correctness", mode="min")
    assert worst.config == {"learning_rate": 0.1}
    multi = grid.get_best_result(
        metric=["gene_expr_correctness", "cell_map_consistency"]
    )
    assert multi.config["learning_rate"] in (0.2, 0.3)  # both nondominated
    with pytest.raises(ValueError, match="metric"):
        grid.get_best_result()
    with pytest.raises(ValueError, match="mode"):
        grid.get_best_result(metric="gene_expr_correctness", mode="bogus")


def test_get_best_result_warns_when_all_trials_diverged(caplog):
    """Every trial NaN (e.g. the whole lr space diverged): the pick is
    arbitrary, so the user must be told instead of silently handed a
    diverged config. A finite trial among NaNs wins without a warning."""
    import logging as _logging

    all_nan = pd.DataFrame({
        "gene_expr_correctness": [float("nan")] * 3,
        "config/learning_rate": [0.1, 0.2, 0.3],
    })
    with caplog.at_level(_logging.WARNING):
        tuning._ResultGrid(all_nan).get_best_result(
            metric="gene_expr_correctness"
        )
    assert any("no trial has finite" in r.message for r in caplog.records)

    caplog.clear()
    mixed = pd.DataFrame({
        "gene_expr_correctness": [float("nan"), 0.4, float("nan")],
        "config/learning_rate": [0.1, 0.2, 0.3],
    })
    with caplog.at_level(_logging.WARNING):
        best = tuning._ResultGrid(mixed).get_best_result(
            metric="gene_expr_correctness"
        )
    assert best.config == {"learning_rate": 0.2}
    assert not any("no trial has finite" in r.message for r in caplog.records)


def test_pearson_corr_high_mean_low_variance(rng):
    """Centering must happen before the gram matrix: an uncentered
    cov = X·Xᵀ − ssᵀ/N cancels catastrophically when mean ≫ std (e.g. raw
    count cubes offset by ~1e8) — pin agreement with np.corrcoef there."""
    cube = (1e8 + rng.normal(size=(3, 50, 60)) * 0.1).astype(np.float64)
    r = tuning.pearson_corr(cube)
    C = np.corrcoef(cube.reshape(3, -1))
    i, j = np.tril_indices(3, -1)
    np.testing.assert_allclose(r, C[i, j], rtol=1e-6, atol=1e-9)


def test_space_active_lambdas():
    """The active-λ set is derived from the SEARCH SPACE so adaptive
    rounds share one compiled program: distributions count as active
    (except all-zero choices), fixed zeros (coerced to uniform(0,0)) do
    not."""
    domains = {
        "lambda_g1": tuning.uniform(0.5, 1.0),
        "lambda_d": tuning._coerce_domain(0.0),       # fixed 0 -> inactive
        "lambda_r": tuning._coerce_domain(0.3),       # fixed nonzero
        "lambda_getis_ord": tuning.choice([0.0, 0.0]),  # all-zero choice
        "lambda_moran_like": tuning.choice([0.0, 0.5]),
        "lambda_l1": tuning.loguniform(1e-6, 1e-2),
    }
    keys = list(domains) + ["lambda_absent"]
    active = tuning._space_active_lambdas(domains, keys)
    assert active == {"lambda_g1", "lambda_r", "lambda_moran_like",
                      "lambda_l1"}


def test_device_metrics_match_host_reference(rng):
    """The on-device metric implementations (_device_metrics — what the
    population paths report) must agree with the host numpy reference
    implementations (pearson_corr / vote_entropy / consensus_entropy /
    metrics_row) to f32 precision."""
    import jax.numpy as jnp

    p, c, s, gv = 3, 14, 11, 6
    logits = rng.normal(size=(p, c, s)).astype(np.float32) * 2.0
    cube = np.exp(logits)
    cube /= cube.sum(axis=2, keepdims=True)
    S_val = rng.random((c, gv)).astype(np.float32)
    val_sims = rng.random(p).astype(np.float32)

    dev = {
        k: float(v)
        for k, v in tuning._device_metrics(
            jnp.asarray(cube), jnp.asarray(val_sims), jnp.asarray(S_val)
        ).items()
    }

    gene_cube = np.array([S_val.T @ cube[r] for r in range(p)])
    host = {
        "cell_map_consistency": float(tuning.pearson_corr(cube).mean()),
        "cell_map_agreement": float(1 - tuning.vote_entropy(cube).mean()),
        "cell_map_certainty": float(
            1 - tuning.consensus_entropy(cube).mean()
        ),
        "gene_expr_consistency": float(tuning.pearson_corr(gene_cube).mean()),
        "gene_expr_correctness": float(val_sims.mean()),
    }
    assert set(dev) == set(host) == set(tuning.METRIC_KEYS)
    for k in host:
        assert dev[k] == pytest.approx(host[k], rel=1e-4, abs=1e-5), k


def test_repeat_run_inits_match_reference_stream():
    """The tuner's 3 repeat inits must be the exact N(0,1) matrices the
    reference tuner's Mappers draw (random_state=run for run in 0,1,2, with
    0 falsy → unseeded continuation of the ambient numpy stream)."""
    from tangram_tpu.models.mapper import init_logits

    c, s = 14, 9
    np.random.seed(777)  # shared ambient stream state for run 0
    ours = [np.asarray(init_logits(c, s, r, "auto")) for r in range(3)]

    np.random.seed(777)
    theirs = []
    for run in range(3):
        if run:  # the reference's `if random_state:` guard
            np.random.seed(run)
        theirs.append(np.random.normal(0, 1, (c, s)).astype(np.float32))

    for r in range(3):
        np.testing.assert_array_equal(ours[r], theirs[r])


@pytest.mark.skipif(REF is None, reason="torch reference unavailable")
def test_stability_metrics_comparable_with_reference_runs(rng):
    """Run-for-run comparability (VERDICT weak #5): train our 3 repeat
    mappers and the reference's 3 mappers with the same seeding scheme and
    assert the resulting stability metrics agree."""
    from tangram_tpu.models.mapper import Mapper

    n_cells, n_spots, n_genes = 16, 10, 8
    S = (rng.poisson(2.0, (n_cells, n_genes)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (n_spots, n_genes)) + 0.5).astype(np.float32)

    def three_runs(make_mapper):
        out = []
        np.random.seed(123)  # pin the ambient stream feeding run 0
        for run in range(3):
            M, _ = make_mapper(run)
            out.append(np.asarray(M))
        return np.stack(out)

    ref_cube = three_runs(
        lambda run: REF.Mapper(S=S, G=G, device="cpu", random_state=run).train(
            num_epochs=30, learning_rate=0.1, print_each=None
        )
    )
    our_cube = three_runs(
        lambda run: Mapper(
            S=S, G=G, random_state=run, init_method="numpy"
        ).train(num_epochs=30, learning_rate=0.1, print_each=None)
    )

    np.testing.assert_allclose(our_cube, ref_cube, atol=2e-3)
    for metric in (tuning.pearson_corr, tuning.vote_entropy, tuning.consensus_entropy):
        np.testing.assert_allclose(
            metric(our_cube), metric(ref_cube), rtol=1e-3, atol=1e-3
        )


def test_tuner_trial_mesh(tuner_adatas):
    """Trial data parallelism: the tuner sharded over a mesh reproduces the
    single-device population search."""
    import jax
    from jax.sharding import Mesh

    ad_sc, ad_sp = tuner_adatas
    space = {"lambda_g1": 1.0, "lambda_d": tuning.uniform(0.1, 1.0),
             "num_epochs": 25}
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(-1), axis_names=("trial",))
    base = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, metric=["gene_expr_correctness"], config=space,
        tuner_num_samples=4, cluster_label="subclass_label",
        density_prior="uniform", random_state=11, population_batch_size=4,
    )
    sharded = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, metric=["gene_expr_correctness"], config=space,
        tuner_num_samples=4, cluster_label="subclass_label",
        density_prior="uniform", random_state=11, population_batch_size=4,
        mesh=mesh,
    )
    # GSPMD reduction reordering wiggles Adam trajectories by ~1e-4/epoch;
    # trial scores must agree to training-noise level
    np.testing.assert_allclose(
        base.get_results().get_dataframe()["gene_expr_correctness"].to_numpy(),
        sharded.get_results().get_dataframe()["gene_expr_correctness"].to_numpy(),
        atol=2e-3,
    )


def test_tuner_resume_sobol(tuner_adatas, tmp_path):
    """resume_path journals every completed batch; a crashed Sobol sweep
    resumes by skipping the recorded trials, and the resumed dataframe
    matches an uninterrupted run."""
    ad_sc, ad_sp = tuner_adatas
    space = {"learning_rate": tuning.loguniform(0.05, 0.3),
             "lambda_d": tuning.uniform(0.1, 1.0), "num_epochs": 10}
    kw = dict(metric=["gene_expr_correctness"], config=space,
              tuner_num_samples=5, cluster_label="subclass_label",
              density_prior="uniform", random_state=4,
              population_batch_size=2)
    np.random.seed(99)
    base = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, **kw).get_results().get_dataframe()

    path = str(tmp_path / "sweep.jsonl")
    np.random.seed(99)
    full = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, resume_path=path, **kw).get_results().get_dataframe()
    pd.testing.assert_frame_equal(base, full)

    # simulate a crash after the first batch: keep meta + 2 trial lines
    lines = open(path).read().splitlines()
    with open(path, "w") as f:
        f.write("\n".join(lines[:3]) + "\n")
    np.random.seed(99)
    resumed = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, resume_path=path, **kw).get_results().get_dataframe()
    # journaled rows are reused verbatim; recomputed trials may land in a
    # different vmap batch composition, so value-level (not bitwise) match
    pd.testing.assert_frame_equal(base, resumed, rtol=1e-5, atol=1e-6)

    # a completed journal short-circuits: rows come from the file even
    # under a different ambient numpy stream
    np.random.seed(0)
    again = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, resume_path=path, **kw).get_results().get_dataframe()
    pd.testing.assert_frame_equal(resumed, again)

    # a journal from different sweep settings is rejected
    with pytest.raises(ValueError, match="different sweep"):
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, resume_path=path, **{**kw, "random_state": 5})


def test_tuner_resume_adaptive(tuner_adatas, tmp_path):
    """Adaptive resume re-feeds journaled trials to the TPE model and runs
    only the remainder; journaled rows appear verbatim in the result."""
    ad_sc, ad_sp = tuner_adatas
    space = {"learning_rate": tuning.loguniform(0.05, 0.3), "num_epochs": 10}
    kw = dict(metric=["gene_expr_correctness"], config=space,
              tuner_num_samples=6, cluster_label="subclass_label",
              density_prior="uniform", random_state=4,
              population_batch_size=2, search="adaptive")
    path = str(tmp_path / "sweep.jsonl")
    np.random.seed(99)
    full = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, resume_path=path, **kw).get_results().get_dataframe()
    assert len(full) == 6

    lines = open(path).read().splitlines()
    with open(path, "w") as f:  # crash after round 1 (meta + 2 trials)
        f.write("\n".join(lines[:3]) + "\n")
    np.random.seed(99)
    resumed = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, resume_path=path, **kw).get_results().get_dataframe()
    assert len(resumed) == 6
    assert np.isfinite(
        resumed[tuning.METRIC_KEYS].to_numpy()).all()
    pd.testing.assert_frame_equal(
        full.iloc[:2].reset_index(drop=True),
        resumed.iloc[:2].reset_index(drop=True),
    )


def test_tuner_resume_halving_completed(tuner_adatas, tmp_path):
    """Plain halving journals a completed sweep; rerunning with the same
    resume_path returns it without retraining."""
    ad_sc, ad_sp = tuner_adatas
    space = {"learning_rate": tuning.loguniform(0.05, 0.3),
             "num_epochs": 16}
    kw = dict(metric=["gene_expr_correctness"], config=space,
              tuner_num_samples=4, cluster_label="subclass_label",
              density_prior="uniform", random_state=4,
              population_batch_size=2, search="halving")
    path = str(tmp_path / "sweep.jsonl")
    np.random.seed(7)
    full = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, resume_path=path, **kw).get_results().get_dataframe()
    np.random.seed(123)
    again = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, resume_path=path, **kw).get_results().get_dataframe()
    pd.testing.assert_frame_equal(full, again)


def test_tuner_hierarchical_mesh(tuner_adatas):
    """Hierarchical DP×TP: on a 2-D ("trial", "cell") mesh, trial groups run
    in parallel while each group's chips tensor-shard the per-repeat logits
    by cells (30 cells over 3 shards) — scores must still match the
    single-device population search."""
    import jax
    from jax.sharding import Mesh

    ad_sc, ad_sp = tuner_adatas
    space = {"lambda_g1": 1.0, "lambda_d": tuning.uniform(0.1, 1.0),
             "num_epochs": 25}
    mesh = Mesh(
        np.asarray(jax.devices()[:6]).reshape(2, 3), axis_names=("trial", "cell")
    )
    kwargs = dict(
        metric=["gene_expr_correctness"], config=space, tuner_num_samples=4,
        cluster_label="subclass_label", density_prior="uniform",
        random_state=11, population_batch_size=4,
    )
    base = tg.mapping_hyperparameter_tuning(ad_sc, ad_sp, **kwargs)
    sharded = tg.mapping_hyperparameter_tuning(ad_sc, ad_sp, mesh=mesh, **kwargs)
    np.testing.assert_allclose(
        base.get_results().get_dataframe()["gene_expr_correctness"].to_numpy(),
        sharded.get_results().get_dataframe()["gene_expr_correctness"].to_numpy(),
        atol=2e-3,
    )


def test_tuner_halving_mesh(tuner_adatas, monkeypatch):
    """Halving over a 2-D ("trial", "cell") mesh: rungs whose alive count
    divides the trial axis run sharded, and the eliminations + metrics must
    reproduce the single-device run — in both carried-state and
    restart-based rung modes."""
    import jax
    from jax.sharding import Mesh

    ad_sc, ad_sp = tuner_adatas
    space = {"learning_rate": tuning.loguniform(0.02, 0.5),
             "lambda_d": tuning.uniform(0.1, 1.0), "num_epochs": 16}
    kw = dict(metric=["gene_expr_correctness"], config=space,
              tuner_num_samples=6, cluster_label="subclass_label",
              density_prior="uniform", random_state=3,
              population_batch_size=3, search="halving")
    mesh = Mesh(
        np.asarray(jax.devices()[:6]).reshape(2, 3), axis_names=("trial", "cell")
    )
    np.random.seed(11)
    base = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, **kw).get_results().get_dataframe()
    np.random.seed(11)
    sharded = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, mesh=mesh, **kw).get_results().get_dataframe()
    np.testing.assert_array_equal(
        base["trained_epochs"].to_numpy(), sharded["trained_epochs"].to_numpy()
    )
    np.testing.assert_allclose(
        base["gene_expr_correctness"].to_numpy(),
        sharded["gene_expr_correctness"].to_numpy(), atol=2e-3,
    )

    # restart-based rungs (forced by a tiny memory budget) with the mesh
    import tangram_tpu.utils as tpu_utils

    monkeypatch.setattr(tpu_utils, "device_memory_budget", lambda *a, **k: 1.0)
    np.random.seed(11)
    restart = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, mesh=mesh, **kw).get_results().get_dataframe()
    np.testing.assert_array_equal(
        base["trained_epochs"].to_numpy(), restart["trained_epochs"].to_numpy()
    )
    np.testing.assert_allclose(
        base["gene_expr_correctness"].to_numpy(),
        restart["gene_expr_correctness"].to_numpy(), atol=2e-3,
    )


def test_tuner_searches_lr_schedules(tuner_adatas):
    """lr_peak/lr_end configs (extension: searchable cosine schedule) run
    through the population search; peak==end reproduces the constant-lr
    trajectory exactly."""
    ad_sc, ad_sp = tuner_adatas
    metric = ["gene_expr_correctness"]
    config = {
        "lr_peak": tuning.loguniform(0.1, 1.0),
        "lr_end": tuning.loguniform(0.01, 0.1),
        "lambda_g1": 1.0,
        "num_epochs": 30,
    }
    tuner = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, metric, config, tuner_num_samples=3,
        cluster_label="subclass_label",
    )
    df = tuner.get_results().get_dataframe()
    assert len(df) == 3
    assert np.isfinite(df["gene_expr_correctness"]).all()
    assert (df["config/lr_peak"] >= df["config/lr_end"]).all()

    # degenerate schedule (peak == end) == plain constant learning_rate
    base = {"lambda_g1": 1.0, "num_epochs": 30}
    t_const = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, metric, {**base, "learning_rate": 0.1},
        tuner_num_samples=1, cluster_label="subclass_label",
    ).get_results().get_dataframe()
    t_sched = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, metric, {**base, "lr_peak": 0.1, "lr_end": 0.1},
        tuner_num_samples=1, cluster_label="subclass_label",
    ).get_results().get_dataframe()
    np.testing.assert_allclose(
        t_const["gene_expr_correctness"].to_numpy(),
        t_sched["gene_expr_correctness"].to_numpy(),
        rtol=1e-6,
    )


class _RaySampler:
    def __init__(self, base=None):
        if base is not None:
            self.base = base


class _RayFloat:
    """Structural twin of ray.tune.sample.Float (lower/upper + sampler)."""

    def __init__(self, lower, upper, log=False):
        self.lower, self.upper = lower, upper
        self.sampler = _RaySampler(base=10 if log else None)


class _RayCategorical:
    def __init__(self, categories):
        self.categories = categories


class _OptunaFloatDistribution:
    def __init__(self, low, high, log=False):
        self.low, self.high, self.log = low, high, log


class _OptunaCategoricalDistribution:
    def __init__(self, choices):
        self.choices = choices


def test_coerce_domain_ray_and_optuna_objects():
    d = tuning._coerce_domain(_RayFloat(0.1, 0.9))
    assert isinstance(d, tuning.uniform) and (d.low, d.high) == (0.1, 0.9)

    d = tuning._coerce_domain(_RayFloat(1e-3, 1.0, log=True))
    assert isinstance(d, tuning.loguniform)
    assert np.isclose(d.from_unit(0.5), np.sqrt(1e-3))

    d = tuning._coerce_domain(_RayCategorical([100, 500, 1000]))
    assert isinstance(d, tuning.choice) and d.values == (100, 500, 1000)

    d = tuning._coerce_domain(_OptunaFloatDistribution(0.0, 2.0))
    assert isinstance(d, tuning.uniform) and (d.low, d.high) == (0.0, 2.0)

    d = tuning._coerce_domain(_OptunaFloatDistribution(1e-2, 10.0, log=True))
    assert isinstance(d, tuning.loguniform)

    d = tuning._coerce_domain(_OptunaCategoricalDistribution(("a", "b")))
    assert isinstance(d, tuning.choice) and d.values == ("a", "b")

    with pytest.raises(ValueError):
        tuning._coerce_domain("not-a-domain")


def test_tuner_accepts_ray_shaped_search_space(tuner_adatas):
    """A reference user's ray.tune-style search-space dict (actual domain
    OBJECTS, not this library's dataclasses) drives the tuner end to end —
    reference contract: ``mapping_parameter_tuning.py:14-22``."""
    ad_sc, ad_sp = tuner_adatas
    config = {
        "learning_rate": _RayFloat(0.05, 0.2, log=True),
        "lambda_g1": _RayFloat(0.5, 1.0),
        "num_epochs": _RayCategorical([4, 6]),
    }
    tuner = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, ["cell_map_consistency"], config, tuner_num_samples=3,
        cluster_label="subclass_label",
    )
    df = tuner.get_results().get_dataframe()
    assert len(df) == 3
    assert set(df["config/num_epochs"]).issubset({4, 6})
    assert ((df["config/learning_rate"] >= 0.05)
            & (df["config/learning_rate"] <= 0.2)).all()


def test_tuner_tp_fallback_warns(tuner_adatas, caplog):
    """Mesh requests cell sharding the cluster count can't divide: the tuner
    must warn about the replication fallback instead of silently holding
    full per-trial logits on every chip (VERDICT r4 #8)."""
    import logging

    import jax
    from jax.sharding import Mesh

    ad_sc, ad_sp = tuner_adatas  # 3 clusters: not divisible by 4
    space = {"lambda_g1": 1.0, "lambda_d": tuning.uniform(0.1, 1.0),
             "num_epochs": 5}
    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), axis_names=("trial", "cell")
    )
    with caplog.at_level(logging.WARNING):
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, metric=["gene_expr_correctness"], config=space,
            tuner_num_samples=4, cluster_label="subclass_label",
            density_prior="uniform", random_state=3, mesh=mesh,
            population_batch_size=4,
        )
    msgs = [r.message for r in caplog.records if "REPLICATION" in r.message]
    assert msgs, "expected a TP-replication warning"
    assert "4-way" in msgs[0]
