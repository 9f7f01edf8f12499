"""Randomized fuzz of the tuner's search modes (a tool, not a CI test —
the CI suite carries seeded versions; run this for a deeper sweep).

Random shapes, search spaces (including spatial λs, schedules, fixed
zeros), and search modes through ``mapping_hyperparameter_tuning``,
checking per trial:

* result frame shape/columns, metric finiteness for sane lr ranges;
* same-seed determinism (full dataframe equality on a repeat run);
* ``search="halving"``: carried-state and restart-mode rungs produce the
  same eliminations and metrics (restart forced via a tiny memory budget).

Usage::

    python scripts/fuzz_tuner.py [seed] [n_trials]

Runs on the virtual 8-device CPU mesh; exits nonzero on any divergence.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import pandas as pd

import tangram_tpu as tg
from tangram_tpu import tuning


def make_adatas(rng, c, s, g, n_types):
    genes = [f"g{i}" for i in range(g)]
    ad_sc = tg.AnnData(
        X=(rng.poisson(2.0, (c, g)) + 1).astype(np.float32),
        obs=pd.DataFrame(
            {"subclass_label": rng.choice(
                [f"t{t}" for t in range(n_types)], c)},
            index=[f"c{i}" for i in range(c)],
        ),
        var=pd.DataFrame(index=genes),
    )
    ad_sp = tg.AnnData(
        X=(rng.poisson(3.0, (s, g)) + 1).astype(np.float32),
        var=pd.DataFrame(index=genes),
    )
    ad_sp.obsm["spatial"] = rng.random((s, 2)) * 100
    tg.pp_adatas(ad_sc, ad_sp)
    return ad_sc, ad_sp


def random_space(rng):
    config = {"learning_rate": tuning.loguniform(0.02, 0.5)}
    optional = {
        "lambda_g1": lambda: tuning.uniform(0.5, 1.0),
        "lambda_d": lambda: tuning.uniform(0.0, 1.0),
        "lambda_r": lambda: tuning.loguniform(1e-10, 1e-3),
        "lambda_l1": lambda: float(rng.choice([0.0, 1e-4])),
        "lambda_l2": lambda: tuning.choice([0.0, 1e-4, 1e-3]),
        "lambda_neighborhood_g1": lambda: float(rng.choice([0.0, 0.3])),
        "lambda_ct_islands": lambda: tuning.uniform(0.0, 0.5),
        "lambda_getis_ord": lambda: float(rng.choice([0.0, 0.2])),
        "lr_peak": lambda: tuning.loguniform(0.2, 1.0),
        "lr_end": lambda: tuning.loguniform(0.01, 0.1),
    }
    for key, maker in optional.items():
        if rng.random() < 0.4:
            config[key] = maker()
    if "lr_peak" in config and "lr_end" not in config:
        config["lr_end"] = tuning.loguniform(0.01, 0.1)
    config["num_epochs"] = int(rng.choice([8, 12, 20]))
    return config


def run(seed: int, n_trials: int) -> int:
    rng = np.random.default_rng(seed)
    fails = 0
    for trial in range(n_trials):
        c = int(rng.integers(12, 40))
        s = int(rng.integers(6, 24))
        g = int(rng.integers(6, 16))
        n_types = int(rng.integers(2, 5))
        search = str(rng.choice(
            ["sobol", "adaptive", "halving", "adaptive+halving"]
        ))
        n_samples = int(rng.integers(3, 9))
        batch = int(rng.integers(2, 5))
        metric = list(rng.choice(
            tuning.METRIC_KEYS, size=int(rng.integers(1, 3)), replace=False
        ))
        config = random_space(rng)
        if "halving" in search:
            config["num_epochs"] = 16  # fixed budget required
        seed_t = int(rng.integers(0, 2**31))

        ad_sc, ad_sp = make_adatas(rng, c, s, g, n_types)
        kw = dict(
            metric=metric, config=config, tuner_num_samples=n_samples,
            cluster_label="subclass_label", search=search,
            population_batch_size=batch, random_state=seed_t,
        )
        label = (f"[{trial}] {search} c={c} s={s} g={g} n={n_samples} "
                 f"keys={sorted(k for k in config if k != 'num_epochs')}")
        try:
            np.random.seed(seed_t % (2**31))
            df1 = tg.mapping_hyperparameter_tuning(
                ad_sc, ad_sp, **kw).get_results().get_dataframe()
            assert len(df1) == n_samples, f"row count {len(df1)}"
            for m in tuning.METRIC_KEYS:
                assert m in df1.columns, f"missing {m}"
                assert np.isfinite(df1[m]).all(), f"non-finite {m}"
            # determinism
            np.random.seed(seed_t % (2**31))
            df2 = tg.mapping_hyperparameter_tuning(
                ad_sc, ad_sp, **kw).get_results().get_dataframe()
            pd.testing.assert_frame_equal(df1, df2)
            if rng.random() < 0.5:
                # mesh trial-DP (randomly hierarchical: a 2-D mesh also
                # tensor-shards each trial's cells when divisible) must
                # reproduce the unsharded run to GSPMD-noise level — for
                # halving modes including the per-rung eliminations
                from jax.sharding import Mesh

                if rng.random() < 0.5:
                    mesh = Mesh(
                        np.asarray(jax.devices()[:4]), ("trial",)
                    )
                else:
                    mesh = Mesh(
                        np.asarray(jax.devices()[:6]).reshape(2, 3),
                        ("trial", "cell"),
                    )
                np.random.seed(seed_t % (2**31))
                dfm = tg.mapping_hyperparameter_tuning(
                    ad_sc, ad_sp, mesh=mesh, **kw
                ).get_results().get_dataframe()
                if "trained_epochs" in df1.columns:
                    np.testing.assert_array_equal(
                        df1["trained_epochs"].to_numpy(),
                        dfm["trained_epochs"].to_numpy(),
                        err_msg=f"mesh {mesh.axis_names} eliminations",
                    )
                for m in tuning.METRIC_KEYS:
                    np.testing.assert_allclose(
                        df1[m].to_numpy(), dfm[m].to_numpy(), atol=5e-3,
                        err_msg=f"mesh {mesh.axis_names} {m}",
                    )
            if "halving" in search:
                # restart-mode rungs must reproduce carried-state results
                import tangram_tpu.utils as tpu_utils

                orig = tpu_utils.device_memory_budget
                tpu_utils.device_memory_budget = lambda *a, **k: 1.0
                try:
                    np.random.seed(seed_t % (2**31))
                    df3 = tg.mapping_hyperparameter_tuning(
                        ad_sc, ad_sp, **kw).get_results().get_dataframe()
                finally:
                    tpu_utils.device_memory_budget = orig
                np.testing.assert_array_equal(
                    df1["trained_epochs"].to_numpy(),
                    df3["trained_epochs"].to_numpy(),
                )
                for m in tuning.METRIC_KEYS:
                    np.testing.assert_allclose(
                        df1[m].to_numpy(), df3[m].to_numpy(),
                        rtol=1e-4, atol=1e-5,
                    )
            print(f"{label}: ok", flush=True)
        except Exception as err:
            fails += 1
            print(f"{label}: FAIL {type(err).__name__}: {err}", flush=True)
    print(f"{n_trials} trials, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sys.exit(run(seed, n))
