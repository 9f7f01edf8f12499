"""Adaptive (TPE) hyperparameter search — the capability the reference gets
from Ray + OptunaSearch (``mapping_parameter_tuning.py:259-271``).

The acceptance criterion from the round-2 review: on a seeded synthetic
objective with a narrow optimum, the adaptive mode reaches within ε of the
best configuration in ≤ 1/4 of the trials plain Sobol needs.
"""

import numpy as np
import pandas as pd
import pytest

import tangram_tpu as tg
from tangram_tpu import tuning
from tangram_tpu.search import TPESampler, nondominated_rank


# ---------------------------------------------------------------------------
# nondominated ranking
# ---------------------------------------------------------------------------


def test_nondominated_rank_hand_example():
    Y = np.array(
        [
            [1.0, 1.0],  # dominated by (2,2)
            [2.0, 2.0],  # front
            [3.0, 0.5],  # front (trades off)
            [0.5, 3.0],  # front (trades off)
            [0.0, 0.0],  # rank 2: dominated by (1,1) too
        ]
    )
    rank = nondominated_rank(Y)
    np.testing.assert_array_equal(rank, [1, 0, 0, 0, 2])


def test_nondominated_rank_single_objective_is_sort_order():
    Y = np.array([[0.3], [0.9], [0.1], [0.9]])
    rank = nondominated_rank(Y)
    # maxima share rank 0; strictly worse values strictly higher ranks
    assert rank[1] == rank[3] == 0
    assert rank[0] > 0 and rank[2] > rank[0]


# ---------------------------------------------------------------------------
# TPE sampler mechanics
# ---------------------------------------------------------------------------


def test_tpe_startup_is_sobol_and_deterministic():
    a = TPESampler(3, seed=7, n_startup=8).ask(8)
    b = TPESampler(3, seed=7, n_startup=8).ask(8)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 3)
    assert (a >= 0).all() and (a <= 1).all()


def test_tpe_validates_shapes():
    s = TPESampler(2, seed=0)
    with pytest.raises(ValueError, match="matching first"):
        s.tell(np.zeros((3, 2)), np.zeros(2))
    with pytest.raises(ValueError, match="columns"):
        s.tell(np.zeros((3, 5)), np.zeros(3))
    with pytest.raises(ValueError):
        TPESampler(0)


def test_tpe_concentrates_near_good_observations():
    """After telling a cluster of good points, suggestions land near it far
    more often than uniform sampling would."""
    rng = np.random.default_rng(0)
    s = TPESampler(2, seed=0, n_startup=4)
    target = np.array([0.8, 0.2])
    X = rng.random((40, 2))
    y = -((X - target) ** 2).sum(axis=1)
    s.tell(X, y)
    asked = s.ask(32)
    dist = np.linalg.norm(asked - target, axis=1)
    # uniform sampling: P(dist < 0.25) ≈ π·0.25² ≈ 0.2 → expect ~6/32
    assert (dist < 0.25).mean() > 0.5


# ---------------------------------------------------------------------------
# the acceptance criterion: ≤ 1/4 of Sobol's trials on a narrow optimum
# ---------------------------------------------------------------------------

_TARGET = np.array([0.23, 0.71])
_EPS = 0.02  # "within ε of the best config" in unit-space distance


def _trials_to_hit_tpe(seed, batch=4, cap=400):
    s = TPESampler(2, seed=seed, n_startup=16)
    n = 0
    while n < cap:
        X = s.ask(batch)
        s.tell(X, -((X - _TARGET) ** 2).sum(axis=1))
        n += batch
        if (np.linalg.norm(X - _TARGET, axis=1) <= _EPS).any():
            return n
    return cap


def _trials_to_hit_sobol(seed, cap=4096):
    from scipy.stats import qmc

    X = qmc.Sobol(d=2, scramble=True, seed=seed).random(cap)
    hits = np.nonzero(np.linalg.norm(X - _TARGET, axis=1) <= _EPS)[0]
    return int(hits[0]) + 1 if len(hits) else cap


def test_adaptive_beats_sobol_by_4x_on_narrow_optimum():
    seeds = range(6)
    tpe = np.array([_trials_to_hit_tpe(s) for s in seeds])
    sobol = np.array([_trials_to_hit_sobol(s) for s in seeds])
    # the headline criterion, averaged over seeds so one lucky Sobol draw
    # can't flip the verdict
    assert tpe.mean() <= sobol.mean() / 4.0, (tpe.tolist(), sobol.tolist())
    # and every adaptive run individually converges well within budget
    assert (tpe <= 200).all(), tpe.tolist()


def test_tpe_multiobjective_steers_to_shared_peak():
    """Two objectives peaking at the same spot: the MOTPE split must steer
    suggestions there."""
    target = np.array([0.3, 0.6])
    s = TPESampler(2, seed=1, n_startup=16)
    for _ in range(20):
        X = s.ask(4)
        y1 = -np.abs(X - target).sum(axis=1)
        y2 = -((X - target) ** 2).sum(axis=1)
        s.tell(X, np.stack([y1, y2], axis=1))
    asked = s.ask(16)
    assert np.median(np.linalg.norm(asked - target, axis=1)) < 0.15


# ---------------------------------------------------------------------------
# tuner integration
# ---------------------------------------------------------------------------


@pytest.fixture
def tuner_adatas(rng):
    n_cells, n_spots, n_genes = 24, 18, 10
    S = (rng.poisson(2.0, (n_cells, n_genes)) + 1).astype(np.float32)
    G = (rng.poisson(2.0, (n_spots, n_genes)) + 1).astype(np.float32)
    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame(
            {"subclass_label": pd.Categorical(rng.choice(["a", "b"], n_cells))},
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


def test_tuner_adaptive_end_to_end(tuner_adatas):
    ad_sc, ad_sp = tuner_adatas
    metric = ["gene_expr_correctness"]
    config = {
        "learning_rate": tuning.loguniform(0.01, 0.5),
        "lambda_g1": tuning.uniform(0.5, 1.0),
        "num_epochs": 20,
    }
    # repeat-run 0 continues the ambient numpy stream (reference quirk,
    # mapping_parameter_tuning.py:121 — random_state=0 is falsy there);
    # pin it so the two tuner invocations below are comparable
    np.random.seed(99)
    tuner = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, metric, config, tuner_num_samples=6,
        cluster_label="subclass_label", population_batch_size=3,
        search="adaptive", random_state=5,
    )
    df = tuner.get_results().get_dataframe()
    assert len(df) == 6
    for m in tuning.METRIC_KEYS:
        assert np.isfinite(df[m]).all()
    assert "config/learning_rate" in df.columns
    assert (df["config/lambda_g1"] >= 0.5).all()

    # deterministic given the seed (and the pinned ambient stream)
    np.random.seed(99)
    df2 = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, metric, config, tuner_num_samples=6,
        cluster_label="subclass_label", population_batch_size=3,
        search="adaptive", random_state=5,
    ).get_results().get_dataframe()
    np.testing.assert_allclose(
        df["gene_expr_correctness"].to_numpy(),
        df2["gene_expr_correctness"].to_numpy(),
        rtol=1e-6,
    )


def test_tuner_rejects_unknown_search(tuner_adatas):
    ad_sc, ad_sp = tuner_adatas
    with pytest.raises(ValueError, match="search"):
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, ["gene_expr_correctness"], {"lambda_g1": 1.0},
            cluster_label="subclass_label", tuner_num_samples=1,
            search="genetic",
        )


# ---------------------------------------------------------------------------
# successive halving (search="halving")
# ---------------------------------------------------------------------------


def test_halving_rung_schedule():
    from tangram_tpu.tuning import _halving_rungs

    assert _halving_rungs(8, 40, 2) == [(5, 8), (10, 4), (20, 2), (40, 1)]
    assert _halving_rungs(9, 90, 3) == [(10, 9), (30, 3), (90, 1)]
    assert _halving_rungs(1, 50, 3) == [(50, 1)]
    # the last rung always reaches the full budget
    for n, R, eta in [(5, 33, 2), (16, 100, 4), (2, 7, 3)]:
        rungs = _halving_rungs(n, R, eta)
        assert rungs[-1][0] == R
        targets = [t for t, _ in rungs]
        assert targets == sorted(set(targets))


def test_select_order_single_and_multi():
    from tangram_tpu.tuning import _select_order

    order = _select_order(np.array([[0.2], [0.9], [0.5]]))
    np.testing.assert_array_equal(order, [1, 2, 0])
    # multi-objective: the all-dominating row comes first, the dominated
    # one last
    Y = np.array([[1.0, 1.0], [2.0, 2.0], [0.5, 1.5]])
    order = _select_order(Y)
    assert order[0] == 1 and order[-1] == 0 or order[0] == 1


def test_select_order_nan_trials_sort_last():
    """A diverged trial (NaN metrics) must never outrank a finite one —
    otherwise halving would carry it through every rung while eliminating
    healthy configs (NaN rows are incomparable under nondomination, so a
    naive rank puts them on the Pareto front)."""
    from tangram_tpu.tuning import _select_order

    Y = np.array([[0.9, 0.8], [np.nan, np.nan], [0.5, 0.4], [0.7, 0.9]])
    order = _select_order(Y)
    assert order[-1] == 1  # the NaN trial is eliminated first
    assert set(order[:2]) == {0, 3}  # the nondominated finite rows lead

    # single metric: same rule
    order1 = _select_order(np.array([[0.2], [np.nan], [0.7]]))
    np.testing.assert_array_equal(order1, [2, 0, 1])

    # all-NaN input stays total (everything still ordered)
    order_all = _select_order(np.full((3, 2), np.nan))
    assert sorted(order_all) == [0, 1, 2]


def test_tuner_halving_end_to_end(tuner_adatas):
    ad_sc, ad_sp = tuner_adatas
    config = {
        "learning_rate": tuning.loguniform(0.01, 0.5),
        "lambda_g1": tuning.uniform(0.5, 1.0),
        "num_epochs": 24,
    }
    np.random.seed(7)
    t = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, ["gene_expr_correctness"], config,
        tuner_num_samples=8, cluster_label="subclass_label",
        search="halving", halving_eta=2, random_state=3,
    )
    df = t.get_results().get_dataframe()
    assert len(df) == 8
    # rung structure: 4 eliminated at 3 epochs, 2 at 6, 1 at 12, winner 24
    counts = df["trained_epochs"].value_counts().to_dict()
    assert counts == {3: 4, 6: 2, 12: 1, 24: 1}
    for m in tuning.METRIC_KEYS:
        assert np.isfinite(df[m]).all()
    assert "config/learning_rate" in df.columns

    # deterministic given seeds (incl. the pinned ambient stream for run 0)
    np.random.seed(7)
    df2 = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, ["gene_expr_correctness"], config,
        tuner_num_samples=8, cluster_label="subclass_label",
        search="halving", halving_eta=2, random_state=3,
    ).get_results().get_dataframe()
    np.testing.assert_array_equal(
        df["trained_epochs"].to_numpy(), df2["trained_epochs"].to_numpy()
    )


def test_halving_winner_prefix_matches_full_training(tuner_adatas):
    """The halving winner's trajectory is the SAME trajectory a full run of
    that config produces (carried Adam state + absolute cosine schedule):
    its final metrics equal a sobol run of just that config."""
    ad_sc, ad_sp = tuner_adatas
    np.random.seed(11)
    t = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, ["gene_expr_correctness"],
        {"learning_rate": tuning.loguniform(0.05, 0.5), "num_epochs": 12},
        tuner_num_samples=4, cluster_label="subclass_label",
        search="halving", halving_eta=2, random_state=1,
    )
    df = t.get_results().get_dataframe()
    win = df[df["trained_epochs"] == 12].iloc[0]

    np.random.seed(11)
    full = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, ["gene_expr_correctness"],
        {"learning_rate": float(win["config/learning_rate"]),
         "num_epochs": 12},
        tuner_num_samples=1, cluster_label="subclass_label",
        random_state=1,
    ).get_results().get_dataframe()
    assert win["gene_expr_correctness"] == pytest.approx(
        float(full["gene_expr_correctness"].iloc[0]), abs=2e-4
    )


def test_halving_restart_mode_matches_carried(tuner_adatas, monkeypatch):
    """When the population's Adam state exceeds the device budget, halving
    falls back to restart-based rungs in population_batch_size chunks.
    Restarting from scratch to each rung target replays the exact same
    update sequence the carried state would continue, so eliminations and
    the final dataframe must match the carried path."""
    ad_sc, ad_sp = tuner_adatas
    config = {
        "learning_rate": tuning.loguniform(0.01, 0.5),
        "lambda_g1": tuning.uniform(0.5, 1.0),
        "num_epochs": 24,
    }
    kw = dict(
        metric=["gene_expr_correctness"], config=config,
        tuner_num_samples=8, cluster_label="subclass_label",
        search="halving", halving_eta=2, random_state=3,
        population_batch_size=3,  # deliberately not dividing the rung sizes
    )
    np.random.seed(7)
    carried = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, **kw
    ).get_results().get_dataframe()

    # force the restart fallback: report a budget no population fits
    import tangram_tpu.utils as tpu_utils

    monkeypatch.setattr(
        tpu_utils, "device_memory_budget", lambda *a, **k: 1.0
    )
    np.random.seed(7)
    restart = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, **kw
    ).get_results().get_dataframe()

    np.testing.assert_array_equal(
        carried["trained_epochs"].to_numpy(),
        restart["trained_epochs"].to_numpy(),
    )
    for m in tuning.METRIC_KEYS:
        np.testing.assert_allclose(
            carried[m].to_numpy(), restart[m].to_numpy(),
            rtol=1e-4, atol=1e-5,
        )


def test_adaptive_halving_end_to_end(tuner_adatas):
    """search='adaptive+halving' (the Ray OptunaSearch + pruning-scheduler
    composition): TPE-sampled brackets, each pruned by successive halving;
    deterministic given seeds; every bracket carries the halving rung
    structure."""
    ad_sc, ad_sp = tuner_adatas
    config = {
        "learning_rate": tuning.loguniform(0.01, 0.5),
        "lambda_g1": tuning.uniform(0.5, 1.0),
        "num_epochs": 24,
    }
    kw = dict(
        metric=["gene_expr_correctness"], config=config,
        tuner_num_samples=8, cluster_label="subclass_label",
        search="adaptive+halving", halving_eta=2, random_state=3,
        population_batch_size=4,
    )
    np.random.seed(7)
    df = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, **kw).get_results().get_dataframe()
    assert len(df) == 8
    assert "trained_epochs" in df.columns
    # two brackets of 4, each with rungs (6 epochs: 2 trials) ->
    # per bracket: 2 eliminated at 6, 1 at 12, winner 24
    counts = df["trained_epochs"].value_counts().to_dict()
    assert counts == {6: 4, 12: 2, 24: 2}
    for m in tuning.METRIC_KEYS:
        assert np.isfinite(df[m]).all()

    np.random.seed(7)
    df2 = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, **kw).get_results().get_dataframe()
    pd.testing.assert_frame_equal(df, df2)


def test_adaptive_halving_reuses_one_compiled_trainer(tuner_adatas):
    """Every TPE bracket replays the same rung shapes, so _run_halving must
    reuse the setup-cached jitted trainer across brackets instead of
    rebuilding (and re-tracing) it per call."""
    ad_sc, ad_sp = tuner_adatas
    returned = []
    orig = tuning._PopulationSetup.fit_halving

    def spy(self, num_epochs, active=None):
        fn = orig(self, num_epochs, active)
        returned.append(fn)
        return fn

    config = {
        "learning_rate": tuning.loguniform(0.01, 0.5),
        "num_epochs": 24,
    }
    np.random.seed(7)
    try:
        tuning._PopulationSetup.fit_halving = spy
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, metric=["gene_expr_correctness"], config=config,
            tuner_num_samples=8, cluster_label="subclass_label",
            search="adaptive+halving", halving_eta=2, random_state=3,
            population_batch_size=4,
        )
    finally:
        tuning._PopulationSetup.fit_halving = orig
    assert len(returned) >= 2  # one per bracket
    assert all(fn is returned[0] for fn in returned)


def test_adaptive_halving_concentrates_later_brackets(tuner_adatas):
    """The composition's mechanism: metrics fed back from pruned brackets
    steer later brackets' samples toward the best-observed region, so the
    last bracket's configs sit closer (in log-lr) to the best trial than
    the first (Sobol-startup) bracket's."""
    ad_sc, ad_sp = tuner_adatas
    config = {
        "learning_rate": tuning.loguniform(1e-4, 2.0),  # wide; optimum inside
        "num_epochs": 16,
    }
    np.random.seed(5)
    df = tg.mapping_hyperparameter_tuning(
        ad_sc, ad_sp, ["gene_expr_correctness"], config,
        tuner_num_samples=24, cluster_label="subclass_label",
        search="adaptive+halving", halving_eta=2, random_state=0,
        population_batch_size=4,
    ).get_results().get_dataframe()
    assert len(df) == 24
    lr = np.log10(df["config/learning_rate"].to_numpy())
    best = lr[int(np.argmax(df["gene_expr_correctness"].to_numpy()))]
    first, last = lr[:4], lr[-4:]
    assert np.median(np.abs(last - best)) < np.median(np.abs(first - best))


def test_halving_requires_fixed_num_epochs(tuner_adatas):
    ad_sc, ad_sp = tuner_adatas
    with pytest.raises(ValueError, match="FIXED num_epochs"):
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, ["gene_expr_correctness"],
            {"learning_rate": 0.1, "num_epochs": tuning.choice([10, 20])},
            tuner_num_samples=4, cluster_label="subclass_label",
            search="halving",
        )


def test_halving_rejects_degenerate_eta(tuner_adatas):
    """eta < 2 would never eliminate anything (and eta=1 would loop
    forever in the rung builder) — reject it up front."""
    ad_sc, ad_sp = tuner_adatas
    with pytest.raises(ValueError, match="halving_eta"):
        tg.mapping_hyperparameter_tuning(
            ad_sc, ad_sp, ["gene_expr_correctness"],
            {"learning_rate": 0.1, "num_epochs": 10},
            tuner_num_samples=4, cluster_label="subclass_label",
            search="halving", halving_eta=1,
        )


def test_adaptive_search_over_trial_mesh(tuner_adatas):
    """search='adaptive' composes with trial data parallelism: each ask/tell
    round's batch shards over the mesh and reproduces the single-device
    scores to training-noise level."""
    import jax
    from jax.sharding import Mesh

    ad_sc, ad_sp = tuner_adatas
    config = {"lambda_g1": 1.0, "lambda_d": tuning.uniform(0.1, 1.0),
              "num_epochs": 20}
    kw = dict(
        metric=["gene_expr_correctness"], config=config,
        tuner_num_samples=8, cluster_label="subclass_label",
        density_prior="uniform", random_state=4, population_batch_size=4,
        search="adaptive",
    )
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(-1),
                axis_names=("trial",))
    np.random.seed(21)
    base = tg.mapping_hyperparameter_tuning(ad_sc, ad_sp, **kw)
    np.random.seed(21)
    sharded = tg.mapping_hyperparameter_tuning(ad_sc, ad_sp, mesh=mesh, **kw)
    np.testing.assert_allclose(
        base.get_results().get_dataframe()["gene_expr_correctness"].to_numpy(),
        sharded.get_results().get_dataframe()["gene_expr_correctness"].to_numpy(),
        atol=2e-3,
    )
