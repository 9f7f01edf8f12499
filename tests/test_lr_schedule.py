"""Learning-rate schedules (ops/schedules.py).

The reference trains at a constant Adam lr (``mapping_utils.py:148-149``);
that stays the default. These tests pin the opt-in per-epoch-vector support:
a schedule run must equal the same constant-lr runs chained through the
checkpoint/resume path (which preserves Adam moments bit-exactly), and every
training path — XLA, fused Pallas, GSPMD mesh, fused 1-D and 2-D meshes —
must agree on the scheduled trajectory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tangram_tpu.models.mapper import Mapper, fit_mapping, init_logits
from tangram_tpu.ops.losses import LossWeights, MapperData
from tangram_tpu.ops.schedules import cosine_lr, resolve_lr


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def make_problem(rng, c=24, s=16, g=8):
    S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
    d = rng.random(s).astype(np.float32)
    d /= d.sum()
    M0 = rng.normal(0, 1, (c, s)).astype(np.float32)
    return jnp.asarray(M0), MapperData(
        S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d)
    )


def test_cosine_lr_shape_and_endpoints():
    lr = cosine_lr(1.0, 100, end=0.1, warmup=10)
    assert lr.shape == (100,) and lr.dtype == np.float32
    np.testing.assert_allclose(lr[:10], np.linspace(0.1, 1.0, 10), rtol=1e-6)
    assert lr[10] == pytest.approx(1.0)
    assert lr[-1] == pytest.approx(0.1, abs=1e-3)
    assert (np.diff(lr[10:]) <= 1e-7).all()
    with pytest.raises(ValueError):
        cosine_lr(1.0, 10, warmup=11)


def test_resolve_lr_forms():
    assert resolve_lr(0.1, 5) == 0.1
    vec = resolve_lr([0.1] * 5, 5)
    assert vec.shape == (5,) and vec.dtype == np.float32
    fn = resolve_lr(lambda t: 0.2 * (t + 1), 4)
    np.testing.assert_allclose(fn, [0.2, 0.4, 0.6, 0.8], rtol=1e-6)
    with pytest.raises(ValueError):
        resolve_lr([0.1] * 4, 5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_vector_lr_equals_chained_constant_runs(rng, impl):
    """A two-phase lr vector must reproduce two constant-lr runs chained via
    opt_state resume (Adam moments carried) exactly."""
    M0, data = make_problem(rng)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_r=0.01)

    lrs = np.asarray([0.1] * 6 + [0.02] * 6, np.float32)
    p_vec, h_vec = fit_mapping(M0, data, lw, 12, lrs, impl=impl)

    p_a, opt, h_a = fit_mapping(
        M0, data, lw, 6, 0.1, impl=impl, return_opt_state=True
    )
    p_b, h_b = fit_mapping(
        p_a, data, lw, 6, 0.02, impl=impl, opt_state=opt, step_offset=6
    )
    np.testing.assert_allclose(np.asarray(p_vec), np.asarray(p_b), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h_vec["total_loss"]),
        np.concatenate(
            [np.asarray(h_a["total_loss"]), np.asarray(h_b["total_loss"])]
        ),
        atol=1e-6,
    )


def test_vector_lr_constrained(rng):
    """Constrained (M, F) training honors a schedule on both impls."""
    M0, data = make_problem(rng)
    F0 = jnp.asarray(rng.normal(0, 1, (M0.shape[0],)).astype(np.float32))
    data = data._replace(target_count=jnp.float32(10.0))
    lw = LossWeights(lambda_g1=1.0, lambda_count=1.0, lambda_f_reg=1.0)
    lrs = np.asarray([0.2] * 4 + [0.05] * 4, np.float32)
    (M_x, F_x), h_x = fit_mapping(
        (M0, F0), data, lw, 8, lrs, constrained=True, impl="xla"
    )
    (M_p, F_p), h_p = fit_mapping(
        (M0, F0), data, lw, 8, lrs, constrained=True, impl="pallas", fused=True
    )
    np.testing.assert_allclose(np.asarray(M_x), np.asarray(M_p), atol=5e-5)
    np.testing.assert_allclose(np.asarray(F_x), np.asarray(F_p), atol=5e-5)
    # the schedule actually changed the trajectory vs constant lr
    (_, _), h_const = fit_mapping(
        (M0, F0), data, lw, 8, 0.2, constrained=True, impl="xla"
    )
    assert not np.allclose(
        np.asarray(h_x["total_loss"])[-1], np.asarray(h_const["total_loss"])[-1]
    )


@pytest.mark.parametrize("mesh_kind", ["1d", "2d"])
def test_vector_lr_fused_sharded(rng, mesh_kind):
    """The fused mesh paths follow the same scheduled trajectory as the
    single-device fused path."""
    from tangram_tpu.parallel import fit_mapping_fused_sharded

    M0, data = make_problem(rng, c=32, s=24)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    lrs = cosine_lr(0.5, 10, end=0.05)

    p_ref, h_ref = fit_mapping(M0, data, lw, 10, lrs, impl="pallas", fused=True)
    if mesh_kind == "1d":
        mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("cell",))
    else:
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    axis_names=("cell", "spot"))
    p_sh, h_sh = fit_mapping_fused_sharded(M0, data, lw, 10, lrs, mesh=mesh)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        atol=5e-5,
    )


def test_mapper_train_callable_schedule_with_print_chunks(rng, capsys):
    """Mapper.train accepts a callable schedule and chunked live printing
    slices the vector correctly (chunked == unchunked)."""
    c, s, g = 20, 12, 8
    S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
    sched = lambda t: 0.3 * 0.9 ** t

    m1 = Mapper(S=S, G=G, random_state=5)
    out1, hist1 = m1.train(num_epochs=12, learning_rate=sched, print_each=4)
    assert capsys.readouterr().out.count("Gene-voxel score:") == 3
    m2 = Mapper(S=S, G=G, random_state=5)
    out2, hist2 = m2.train(num_epochs=12, learning_rate=sched, print_each=None)
    np.testing.assert_allclose(out1, out2, atol=1e-6)
    np.testing.assert_allclose(
        hist1["main_loss"], hist2["main_loss"], atol=1e-6
    )


def test_mapper_train_mesh_vector_lr(rng):
    """Mapper.train(mesh=...) accepts a schedule; matches single device."""
    c, s, g = 32, 24, 8
    S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
    lrs = cosine_lr(0.4, 15, end=0.04)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                axis_names=("cell", "spot"))
    m_mesh = Mapper(S=S, G=G, random_state=2, mesh=mesh)
    out_mesh, _ = m_mesh.train(num_epochs=15, learning_rate=lrs,
                               print_each=None)
    m_one = Mapper(S=S, G=G, random_state=2)
    out_one, _ = m_one.train(num_epochs=15, learning_rate=lrs,
                             print_each=None)
    np.testing.assert_allclose(out_mesh, out_one, atol=5e-4)


def test_fit_mapping_validates_and_resolves_lr(rng):
    """The functional core rejects wrong-length vectors (lax gather would
    silently clamp) and resolves callables itself."""
    M0, data = make_problem(rng)
    lw = LossWeights(lambda_g1=1.0)
    with pytest.raises(ValueError, match="learning_rate vector"):
        fit_mapping(M0, data, lw, 6, np.asarray([0.1, 0.2], np.float32))
    p_fn, _ = fit_mapping(M0, data, lw, 4, lambda t: 0.1, impl="xla")
    p_c, _ = fit_mapping(M0, data, lw, 4, 0.1, impl="xla")
    np.testing.assert_allclose(np.asarray(p_fn), np.asarray(p_c), atol=1e-6)

    from tangram_tpu.parallel import fit_mapping_fused_sharded

    with pytest.raises(ValueError, match="learning_rate vector"):
        fit_mapping_fused_sharded(
            M0, data, lw, 6, np.asarray([0.1, 0.2], np.float32)
        )


class TestEarlyStopping:
    """Mapper.train(early_stop_tol=...) — window-chunked convergence check
    (an extension; the reference always runs the full epoch budget)."""

    def _problem(self, rng, c=20, s=12, g=8):
        S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
        G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
        return S, G

    def test_stops_early_and_prefix_matches(self, rng):
        S, G = self._problem(rng)
        m = Mapper(S=S, G=G, random_state=3)
        out, hist = m.train(num_epochs=2000, learning_rate=0.1,
                            print_each=None, early_stop_tol=1e-4,
                            early_stop_window=50)
        n_run = len(hist["main_loss"])
        assert n_run < 2000 and n_run % 50 == 0
        # the run is a bit-exact prefix of the uninterrupted trajectory
        m_full = Mapper(S=S, G=G, random_state=3)
        _, hist_full = m_full.train(num_epochs=n_run, learning_rate=0.1,
                                    print_each=None)
        np.testing.assert_allclose(
            hist["main_loss"], hist_full["main_loss"], atol=1e-6
        )
        # and it stopped because the score converged
        assert (
            max(hist["main_loss"][-50:]) - max(hist["main_loss"][:-50]) < 1e-4
        )

    def test_nan_score_stops_first_window(self, rng):
        """A diverged (NaN) score must stop the window loop immediately:
        NaN makes `chunk_best - best < tol` False, which without the
        isfinite guard would train garbage to the full epoch budget."""
        S, G = self._problem(rng)
        S[0, 0] = np.nan  # poisons every score from epoch 0
        m = Mapper(S=S, G=G, random_state=3)
        with np.testing.suppress_warnings():
            _, hist = m.train(num_epochs=500, learning_rate=0.1,
                              print_each=None, early_stop_tol=1e-4,
                              early_stop_window=50)
        assert len(hist["main_loss"]) == 50  # first window, not 500
        assert not np.isfinite(hist["main_loss"][-1])

    def test_runs_full_budget_when_improving(self, rng):
        S, G = self._problem(rng)
        m = Mapper(S=S, G=G, random_state=3)
        _, hist = m.train(num_epochs=60, learning_rate=0.1, print_each=None,
                          early_stop_tol=1e-12, early_stop_window=30)
        assert len(hist["main_loss"]) == 60

    def test_mesh_early_stop_matches_single_device(self, rng):
        S, G = self._problem(rng, c=32, s=24)
        mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("cell",))
        m_mesh = Mapper(S=S, G=G, random_state=4, mesh=mesh)
        out_mesh, h_mesh = m_mesh.train(
            num_epochs=1000, learning_rate=0.1, print_each=None,
            early_stop_tol=1e-4, early_stop_window=50,
        )
        m_one = Mapper(S=S, G=G, random_state=4)
        out_one, h_one = m_one.train(
            num_epochs=1000, learning_rate=0.1, print_each=None,
            early_stop_tol=1e-4, early_stop_window=50,
        )
        assert len(h_mesh["main_loss"]) == len(h_one["main_loss"])
        # hundreds of epochs accumulate ~1e-3 reduction-order drift between
        # the sharded and single-device fused paths; per-step equivalence is
        # asserted tightly in test_fused_sharded.py
        np.testing.assert_allclose(out_mesh, out_one, atol=5e-3)

    def test_map_cells_to_space_early_stop(self, rng):
        import pandas as pd

        import tangram_tpu as tg

        S, G = self._problem(rng)
        genes = [f"g{i}" for i in range(S.shape[1])]
        ad_sc = tg.AnnData(X=S, var=pd.DataFrame(index=genes))
        ad_sp = tg.AnnData(X=G, var=pd.DataFrame(index=genes))
        tg.pp_adatas(ad_sc, ad_sp)
        ad_map = tg.map_cells_to_space(
            ad_sc, ad_sp, num_epochs=2000, random_state=1, verbose=False,
            early_stop_tol=1e-4, early_stop_window=50,
        )
        assert len(ad_map.uns["training_history"]["main_loss"]) < 2000
        with pytest.raises(ValueError, match="constrained"):
            tg.map_cells_to_space(
                ad_sc, ad_sp, mode="constrained", target_count=10,
                num_epochs=100, verbose=False, early_stop_tol=1e-4,
            )


def test_vector_lr_gspmd_sharded(rng):
    """The GSPMD mesh path (fit_mapping_sharded) follows the scheduled
    trajectory of the unsharded XLA run — the lr vector rides along
    replicated."""
    from tangram_tpu.parallel import fit_mapping_sharded

    M0, data = make_problem(rng, c=32, s=24)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    lrs = cosine_lr(0.5, 10, end=0.05)
    p_ref, h_ref = fit_mapping(M0, data, lw, 10, lrs, impl="xla")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                axis_names=("cell", "spot"))
    p_sh, h_sh = fit_mapping_sharded(M0, data, lw, 10, lrs, mesh=mesh)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(h_sh["total_loss"]), np.asarray(h_ref["total_loss"]),
        atol=5e-5,
    )

def test_early_stop_with_schedule_prefix_matches(rng):
    """Early stopping composes with a per-epoch schedule: the stopped run is
    a bit-exact prefix of the uninterrupted scheduled trajectory."""
    c, s, g = 20, 12, 8
    S = (rng.poisson(2.0, (c, g)) + 0.5).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.5).astype(np.float32)
    lrs = cosine_lr(0.5, 600, end=0.01)
    m = Mapper(S=S, G=G, random_state=9)
    _, hist = m.train(num_epochs=600, learning_rate=lrs, print_each=None,
                      early_stop_tol=1e-4, early_stop_window=50)
    n_run = len(hist["main_loss"])
    assert 0 < n_run < 600 and n_run % 50 == 0
    m2 = Mapper(S=S, G=G, random_state=9)
    _, hist_full = m2.train(num_epochs=n_run, learning_rate=lrs[:n_run],
                            print_each=None)
    np.testing.assert_allclose(
        hist["main_loss"], hist_full["main_loss"], atol=1e-6
    )

def test_tuner_cosine_matches_cosine_lr():
    """The tuner's traced per-step schedule and tg.cosine_lr share one
    formula: values agree at every epoch."""
    from tangram_tpu.ops.schedules import cosine_value

    peak, end, n = 0.7, 0.05, 37
    vec = cosine_lr(peak, n, end=end)
    at = np.array([cosine_value(float(t), peak, end, n) for t in range(n)],
                  np.float32)
    np.testing.assert_allclose(vec, at, rtol=1e-6)
