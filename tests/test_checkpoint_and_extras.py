"""Checkpoint/resume, cell-selection, profiling, and sharding dry-run tests."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

import tangram_tpu as tg
from tangram_tpu import cell_selection, checkpoint, profiling
from tangram_tpu.models.mapper import fit_mapping, init_logits
from tangram_tpu.ops.losses import LossWeights, MapperData


@pytest.fixture
def problem(rng):
    c, s, g = 20, 14, 10
    S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
    d = np.full(s, 1 / s, np.float32)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d))
    M0 = init_logits(c, s, 42, "numpy")
    return M0, data, lw


def test_opt_state_resume_is_bit_exact(problem):
    """20 epochs in one scan == 10 + 10 with carried Adam state."""
    M0, data, lw = problem
    p_full, h_full = fit_mapping(M0, data, lw, 20, 0.1)

    p1, opt1, h1 = fit_mapping(M0, data, lw, 10, 0.1, return_opt_state=True)
    p2, h2 = fit_mapping(p1, data, lw, 10, 0.1, opt_state=opt1)

    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p_full))
    np.testing.assert_allclose(
        np.concatenate([np.asarray(h1["total_loss"]), np.asarray(h2["total_loss"])]),
        np.asarray(h_full["total_loss"]),
    )


def test_train_checkpointed_resume(problem, tmp_path):
    M0, data, lw = problem
    ckpt_dir = tmp_path / "ckpts"

    p_full, _ = fit_mapping(M0, data, lw, 30, 0.1)

    # run 30 epochs in chunks of 10 with checkpoints
    p_ck, hist = checkpoint.train_checkpointed(
        M0, data, lw, 30, 0.1, checkpoint_dir=ckpt_dir, checkpoint_every=10
    )
    np.testing.assert_array_equal(np.asarray(p_ck), np.asarray(p_full))
    assert len(hist["total_loss"]) == 30
    assert checkpoint.latest_epoch(ckpt_dir) == 30

    # simulate a crash at epoch 30 of a 50-epoch run → resume completes it
    p_resumed, hist2 = checkpoint.train_checkpointed(
        M0, data, lw, 50, 0.1, checkpoint_dir=ckpt_dir, checkpoint_every=10
    )
    p_50, h_50 = fit_mapping(M0, data, lw, 50, 0.1)
    np.testing.assert_array_equal(np.asarray(p_resumed), np.asarray(p_50))
    # resumed history covers the FULL run (restored prefix + new chunks)
    assert len(hist2["total_loss"]) == 50
    np.testing.assert_allclose(
        hist2["total_loss"], np.asarray(h_50["total_loss"]), rtol=1e-6
    )


def test_restore_raises_when_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        checkpoint.restore(tmp_path / "nope")


# --- cell selection ---


@pytest.fixture
def sc_sp_pair(rng):
    c, s, g = 60, 20, 15
    centers = rng.normal(0, 1, (3, g)) * 1.5
    labels = rng.integers(0, 3, c)
    S = rng.poisson(np.exp(centers[labels] * 0.5) + 1).astype(np.float32)
    mix = rng.dirichlet([1, 1, 1], s)
    G = rng.poisson((mix @ np.exp(centers * 0.5)) * 5 + 1).astype(np.float32)
    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame(
            {"cell_subclass": pd.Categorical([f"t{l}" for l in labels])},
            index=[f"c{i}" for i in range(c)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(g)]),
    )
    ad_sp = tg.AnnData(X=G, var=pd.DataFrame(index=[f"g{i}" for i in range(g)]))
    return ad_sc, ad_sp


def test_fraction_estimation_sums_to_one(sc_sp_pair):
    ad_sc, ad_sp = sc_sp_pair
    fr = cell_selection.estimate_cell_type_fractions(ad_sc, ad_sp, "cell_subclass")
    assert fr.sum() == pytest.approx(1.0)
    assert (fr >= 0).all()
    assert set(fr.index) == {"t0", "t1", "t2"}


def test_cell_number_estimation(sc_sp_pair):
    _, ad_sp = sc_sp_pair
    counts = cell_selection.estimate_cell_number_rna_reads(ad_sp, mean_cell_numbers=5)
    assert counts.min() >= 1
    assert counts.mean() == pytest.approx(5, abs=1.5)


def test_downsample_transcripts(rng):
    X = rng.poisson(10, (5, 40)).astype(np.float64) * 100
    out = cell_selection.downsample_transcripts(X, max_transcripts_per_cell=200)
    assert (out.sum(axis=1) <= 200 + 1e-9).all()


def test_cell_sampling_end_to_end(sc_sp_pair):
    ad_sc, ad_sp = sc_sp_pair
    out = cell_selection.cell_sampling(ad_sc, ad_sp, cell_type_key="cell_subclass",
                                       mean_cell_numbers=3, max_transcripts_per_cell=500)
    assert out.n_obs == out.uns["cell_sampling"]["number_of_cells"] or out.n_obs > 0
    assert out.n_vars == ad_sc.n_vars
    assert set(out.obs["cell_subclass"]).issubset({"t0", "t1", "t2"})


# --- profiling ---


def test_benchmark_mapping_runs():
    out = profiling.benchmark_mapping(32, 24, n_genes=8, num_epochs=5)
    assert out["seconds"] > 0
    assert out["epochs_per_s"] > 0


def test_step_timer():
    timer = profiling.StepTimer()
    with timer("io"):
        pass
    with timer("io"):
        pass
    assert "io" in timer.summary()


# --- sharding dry run (the driver's multichip validation, in-suite) ---


def test_dryrun_multichip_in_suite():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_unsharded(problem):
    from tangram_tpu.parallel import make_mesh, fit_mapping_sharded

    M0, data, lw = problem
    p_ref, h_ref = fit_mapping(M0, data, lw, 15, 0.1)
    mesh = make_mesh(n_cell_shards=2, n_spot_shards=2)
    p_sh, h_sh = fit_mapping_sharded(M0, data, lw, 15, 0.1, mesh=mesh)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]), rtol=1e-4, atol=1e-5
    )


def test_train_checkpointed_on_mesh(problem, tmp_path):
    """Sharded atlas runs survive preemption: chunked fused-sharded training
    with Orbax checkpoints resumes to the same trajectory as one pass."""
    import jax
    from jax.sharding import Mesh

    from tangram_tpu.parallel import fit_mapping_fused_sharded

    M0, data, lw = problem
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(-1), axis_names=("cell",))
    ckpt_dir = tmp_path / "mesh_ckpts"

    p_full, _ = fit_mapping_fused_sharded(M0, data, lw, 30, 0.1, mesh=mesh)

    p_ck, hist = checkpoint.train_checkpointed(
        M0, data, lw, 30, 0.1, checkpoint_dir=ckpt_dir, checkpoint_every=10,
        mesh=mesh,
    )
    np.testing.assert_allclose(np.asarray(p_ck), np.asarray(p_full), atol=1e-6)
    assert len(hist["total_loss"]) == 30

    # crash-at-30 of a 50-epoch run → resume from disk completes it
    p_resumed, hist2 = checkpoint.train_checkpointed(
        M0, data, lw, 50, 0.1, checkpoint_dir=ckpt_dir, checkpoint_every=10,
        mesh=mesh,
    )
    p_50, _ = fit_mapping_fused_sharded(M0, data, lw, 50, 0.1, mesh=mesh)
    np.testing.assert_allclose(np.asarray(p_resumed), np.asarray(p_50), atol=1e-6)
    assert len(hist2["total_loss"]) == 50


def test_train_checkpointed_with_lr_schedule(problem, tmp_path):
    """A scheduled run interrupted mid-way resumes exactly on-schedule: the
    chunked/resumed trajectory equals one uninterrupted scheduled scan."""
    from tangram_tpu.ops.schedules import cosine_lr

    M0, data, lw = problem
    lrs = cosine_lr(0.3, 30, end=0.03)
    p_full, h_full = fit_mapping(M0, data, lw, 30, lrs)

    ckpt_dir = tmp_path / "ckpts_sched"
    # first invocation "crashes" after 20 of 30 epochs (two chunks)
    checkpoint.train_checkpointed(
        M0, data, lw, 20, lrs[:20], checkpoint_dir=ckpt_dir,
        checkpoint_every=10,
    )
    assert checkpoint.latest_epoch(ckpt_dir) == 20
    # resume with the full schedule: continues at lrs[20:]
    p_res, hist = checkpoint.train_checkpointed(
        M0, data, lw, 30, lrs, checkpoint_dir=ckpt_dir, checkpoint_every=10
    )
    np.testing.assert_array_equal(np.asarray(p_res), np.asarray(p_full))
    np.testing.assert_allclose(
        hist["total_loss"], np.asarray(h_full["total_loss"]), rtol=1e-6
    )
