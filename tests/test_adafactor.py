"""optimizer='adafactor' — the factored-second-moment option.

Semantics contract: ``models.mapper.make_adafactor`` (optax.adafactor with
min_dim_size_to_factor=2, no parameter-scale multiply, no clipping, no
momentum). The fused Pallas path (ops/fused_step.py) must reproduce it.

Tolerance design: Adafactor's update is LINEAR in the gradient (u = g ·
rowf ⊗ colf), so the ~1e-3-relative float differences between the fused
epilogue's cotangents and the XLA loss gradient (cancellation-amplified,
same as the Adam paths, see test_fused_step.py's 3e-3 parameter atol) pass
straight into the update and compound over steps — unlike Adam, whose
g/sqrt(v) self-normalization damps them. Long-trajectory assertions are
therefore made at the loss level (where both trajectories agree to ~1e-3)
plus tight single-step / kernel-exactness checks, not on 40-step parameter
deltas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import tangram_tpu as tg
from tangram_tpu.models.mapper import (
    fit_mapping,
    init_logits,
    make_adafactor,
)
from tangram_tpu.ops.losses import LossWeights, MapperData, compute_loss


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _problem(rng, c=13, s=21, g=7, seed=42):
    S = jnp.asarray(rng.poisson(1.0, (c, g)) + 1.0, jnp.float32)
    G = jnp.asarray(rng.poisson(2.0, (s, g)) + 1.0, jnp.float32)
    d = jnp.asarray(np.asarray(G).sum(axis=1) / np.asarray(G).sum(), jnp.float32)
    data = MapperData(S=S, G=G, d=d)
    return data, init_logits(c, s, random_state=seed)


def _optax_loop(M0, data, lw, steps, lr):
    opt = make_adafactor(lr)
    state = opt.init(M0)
    M = M0
    for _ in range(steps):
        (_, _t), grads = jax.value_and_grad(
            lambda p: compute_loss(p, data, lw, impl="xla"), has_aux=True
        )(M)
        updates, state = opt.update(grads, state, M)
        M = optax.apply_updates(M, updates)
    return M, state


def test_factored_rms_vectors_match_optax(rng):
    """Given IDENTICAL gradients, the XLA-side factor bookkeeping must equal
    optax's scale_by_factored_rms exactly (both orientations)."""
    from tangram_tpu.ops.fused_step import factored_rms_vectors

    for c, s in ((13, 21), (21, 13)):
        g = jnp.asarray(rng.normal(0, 1e-2, (c, s)), jnp.float32)
        M = jnp.zeros((c, s), jnp.float32)
        opt = make_adafactor(1.0)
        state = opt.init(M)
        updates, state2 = opt.update(g, state, M)

        gsq = g * g
        vr_sum = jnp.sum(gsq, axis=1)
        vc_sum = jnp.sum(gsq, axis=0)
        vr_new, vc_new, rowf, colf = factored_rms_vectors(
            jnp.zeros((), jnp.int32), jnp.zeros((c,)), jnp.zeros((s,)),
            vr_sum, vc_sum, c, s,
        )
        u = g * rowf[:, None] * colf[None, :]
        np.testing.assert_allclose(
            np.asarray(u), -np.asarray(updates), rtol=1e-5, atol=1e-8
        )
        fstate = state2[0]
        v_row, v_col = ((vr_new, vc_new) if s >= c else (vc_new, vr_new))
        np.testing.assert_allclose(np.asarray(v_row), np.asarray(fstate.v_row),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(v_col), np.asarray(fstate.v_col),
                                   rtol=1e-6)


def test_gsq_kernel_matches_grad_squares(rng):
    """The grad² accumulation kernel's row/col sums equal the squared XLA
    loss gradient's sums (gradient-pipeline float noise tolerance)."""
    from tangram_tpu.ops.fused_step import (
        _gsq,
        _unconstrained_cotangents,
        initial_stats,
    )

    data, M0 = _problem(rng)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    (_, _t), grads = jax.value_and_grad(
        lambda p: compute_loss(p, data, lw, impl="xla"), has_aux=True
    )(M0)
    stats = initial_stats(M0, lw)
    A_p, w, m, l, dY_p, dq, dh, r, _terms, _norms, with_dh = (
        _unconstrained_cotangents(M0, stats, data, lw, jnp.float32)
    )
    vr_sum, vc_sum = _gsq(M0, A_p, w, m, l, dY_p, dq, dh, r, 0.0, 0.0,
                          with_dh=with_dh)
    gsq = np.asarray(grads) ** 2
    np.testing.assert_allclose(np.asarray(vr_sum), gsq.sum(axis=1),
                               rtol=2e-2, atol=1e-10)
    np.testing.assert_allclose(np.asarray(vc_sum), gsq.sum(axis=0),
                               rtol=2e-2, atol=1e-10)


def test_update_kernel_exact(rng):
    """Given identical (g, rowf, colf) inputs, the fused update kernel equals
    the closed-form M − lr · g·rowf⊗colf (extracted by running the kernel
    with unit factors to recover its g)."""
    from tangram_tpu.ops.fused_step import (
        _dm_adafactor,
        _gsq,
        _unconstrained_cotangents,
        factored_rms_vectors,
        initial_stats,
    )

    data, M0 = _problem(rng)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    stats = initial_stats(M0, lw)
    A_p, w, m, l, dY_p, dq, dh, r, _terms, _norms, with_dh = (
        _unconstrained_cotangents(M0, stats, data, lw, jnp.float32)
    )
    c, s = M0.shape
    ones_sc = jnp.asarray([[1.0, 1.0]], jnp.float32)
    out = _dm_adafactor(M0, A_p, w, m, l, dY_p, dq, dh, r,
                        jnp.ones((c,)), jnp.ones((s,)), ones_sc,
                        0.0, 0.0, with_norms=False, sr=False, with_dh=with_dh)
    g_fused = M0 - out[0]

    vr_sum, vc_sum = _gsq(M0, A_p, w, m, l, dY_p, dq, dh, r, 0.0, 0.0,
                          with_dh=with_dh)
    _, _, rowf, colf = factored_rms_vectors(
        jnp.zeros((), jnp.int32), jnp.zeros((c,)), jnp.zeros((s,)),
        vr_sum, vc_sum, c, s,
    )
    sc = jnp.asarray([[0.1, 1.0]], jnp.float32)
    out = _dm_adafactor(M0, A_p, w, m, l, dY_p, dq, dh, r, rowf, colf, sc,
                        0.0, 0.0, with_norms=False, sr=False, with_dh=with_dh)
    manual = M0 - 0.1 * (g_fused * rowf[:, None] * colf[None, :])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(manual),
                               atol=1e-4)


@pytest.mark.parametrize("c,s", [(13, 21), (21, 13)])
def test_fused_one_step_matches_optax(rng, c, s):
    """One full fused step vs one optax step from the same M0, both
    orientations of the factored stats."""
    data, M0 = _problem(rng, c=c, s=s)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M_opt, _ = _optax_loop(M0, data, lw, 1, 0.1)
    M_fused, _ = fit_mapping(M0, data, lw, 1, 0.1, impl="pallas",
                             optimizer="adafactor")
    np.testing.assert_allclose(np.asarray(M_fused), np.asarray(M_opt),
                               atol=5e-3)


@pytest.mark.parametrize(
    "lw",
    [
        LossWeights(lambda_g1=1.0, lambda_d=1.0),
        LossWeights(lambda_g1=1.0, lambda_g2=1.0, lambda_r=0.5,
                    lambda_l1=0.01, lambda_l2=0.01),
    ],
)
def test_fused_trajectory_tracks_generic(rng, lw):
    """40-step fused vs generic: losses agree to ~1e-3 (parameters are only
    compared loosely — see the module docstring on linear g-sensitivity)."""
    data, M0 = _problem(rng)
    M_f, h_f = fit_mapping(M0, data, lw, 40, 0.1, impl="pallas",
                           optimizer="adafactor")
    M_x, h_x = fit_mapping(M0, data, lw, 40, 0.1, impl="xla",
                           optimizer="adafactor")
    np.testing.assert_allclose(
        np.asarray(h_f["main_loss"]), np.asarray(h_x["main_loss"]),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(h_f["total_loss"][-1]), np.asarray(h_x["total_loss"][-1]),
        rtol=5e-3, atol=5e-3,
    )


def test_generic_matches_raw_optax(rng):
    """The generic (XLA) fit_mapping path with optimizer='adafactor' equals a
    hand-rolled optax.adafactor loop exactly (same pipeline both sides)."""
    data, M0 = _problem(rng)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M_ref, _ = _optax_loop(M0, data, lw, 25, 0.1)
    M_gen, _ = fit_mapping(M0, data, lw, 25, 0.1, impl="xla",
                           optimizer="adafactor")
    # jit/scan vs eager op ordering costs a few ulps per step
    np.testing.assert_allclose(np.asarray(M_gen), np.asarray(M_ref),
                               atol=5e-5)


def test_fused_resume_opt_state(rng):
    """10 + 10 steps with the FactoredState round-trip equals 20 straight
    steps (bit-exact resume — same pipeline both sides)."""
    data, M0 = _problem(rng)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M_full, _ = fit_mapping(M0, data, lw, 20, 0.1, impl="pallas",
                            optimizer="adafactor")
    M_half, st, _ = fit_mapping(M0, data, lw, 10, 0.1, impl="pallas",
                                optimizer="adafactor",
                                return_opt_state=True)
    M_res, _ = fit_mapping(M_half, data, lw, 10, 0.1, impl="pallas",
                           optimizer="adafactor", opt_state=st,
                           step_offset=10)
    np.testing.assert_allclose(np.asarray(M_res), np.asarray(M_full),
                               atol=1e-6)


def test_multi_tile_grid(rng):
    """Shapes spanning several kernel tiles (c > TC, s > TS) exercise the
    grad² row accumulation across spot tiles and the column-partial layout
    across cell tiles."""
    from tangram_tpu.ops.pallas_core import TC, TS

    c, s, g = TC + 70, TS + 150, 5
    data, M0 = _problem(rng, c=c, s=s, g=g)
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M_f, h_f = fit_mapping(M0, data, lw, 3, 0.1, impl="pallas",
                           optimizer="adafactor")
    M_x, h_x = fit_mapping(M0, data, lw, 3, 0.1, impl="xla",
                           optimizer="adafactor")
    np.testing.assert_allclose(
        np.asarray(h_f["main_loss"]), np.asarray(h_x["main_loss"]),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(M_f), np.asarray(M_x), atol=5e-3)


def test_lr_schedule_and_bf16(rng):
    """Vector learning rates and bf16 parameter storage compose with
    adafactor; stochastic rounding is accepted on the fused path."""
    data, M0 = _problem(rng)
    lw = LossWeights(lambda_g1=1.0)
    sched = tg.cosine_lr(0.2, 30, end=0.02)
    M_s, h_s = fit_mapping(M0, data, lw, 30, sched, impl="pallas",
                           optimizer="adafactor")
    assert np.isfinite(float(h_s["main_loss"][-1]))

    M_16, h_16 = fit_mapping(M0, data, lw, 30, 0.1, impl="pallas",
                             optimizer="adafactor", param_dtype="bfloat16",
                             rounding="stochastic")
    assert M_16.dtype == jnp.bfloat16
    M_32, h_32 = fit_mapping(M0, data, lw, 30, 0.1, impl="pallas",
                             optimizer="adafactor")
    np.testing.assert_allclose(
        float(h_16["main_loss"][-1]), float(h_32["main_loss"][-1]), atol=5e-2
    )


def test_constrained_runs_generic(rng):
    """Constrained mode + adafactor takes the generic optax path (M factored,
    F full-v) and trains."""
    from tangram_tpu.models.mapper import MapperConstrained

    data, M0 = _problem(rng)
    mapper = MapperConstrained(
        S=np.asarray(data.S), G=np.asarray(data.G), d=np.asarray(data.d),
        target_count=10, random_state=42, optimizer="adafactor",
    )
    M_probs, F_probs, history = mapper.train(20, 0.1, print_each=None)
    assert np.isfinite(history["total_loss"][-1])
    np.testing.assert_allclose(M_probs.sum(axis=1), 1.0, rtol=1e-4)


def test_public_api_and_validation(rng):
    """optimizer= through map_cells_to_space; bad values raise."""
    import pandas as pd

    c, s, g = 12, 18, 8
    genes = [f"g{i}" for i in range(g)]
    ad_sc = tg.AnnData(
        X=(rng.poisson(1.0, (c, g)) + 1).astype(np.float32),
        obs=pd.DataFrame(index=[f"c{i}" for i in range(c)]),
        var=pd.DataFrame(index=genes),
    )
    ad_sp = tg.AnnData(
        X=(rng.poisson(2.0, (s, g)) + 1).astype(np.float32),
        var=pd.DataFrame(index=genes),
    )
    tg.pp_adatas(ad_sc, ad_sp)
    ad_map = tg.map_cells_to_space(
        ad_sc, ad_sp, num_epochs=15, random_state=42, verbose=False,
        optimizer="adafactor",
    )
    np.testing.assert_allclose(np.asarray(ad_map.X).sum(axis=1), 1.0,
                               rtol=1e-4)
    assert np.isfinite(ad_map.uns["training_history"]["main_loss"][-1])

    with pytest.raises(ValueError, match="optimizer"):
        tg.map_cells_to_space(
            ad_sc, ad_sp, num_epochs=2, verbose=False, optimizer="sgd",
        )
    data, M0 = _problem(rng)
    with pytest.raises(ValueError, match="optimizer"):
        fit_mapping(M0, data, LossWeights(lambda_g1=1.0), 2, 0.1,
                    optimizer="rmsprop")


def test_mesh_gspmd_fallback(rng):
    """On a cell mesh, adafactor warns and runs GSPMD; the result tracks the
    single-device generic trajectory."""
    import logging as _logging

    from jax.sharding import Mesh

    from tangram_tpu.models.mapper import Mapper

    data, M0 = _problem(rng, c=16, s=24)
    devices = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("cell",))
    mapper = Mapper(
        S=np.asarray(data.S), G=np.asarray(data.G), d=np.asarray(data.d),
        lambda_d=1.0, random_state=42, mesh=mesh, optimizer="adafactor",
    )
    with _log_capture() as records:
        M_mesh, hist = mapper.train(20, 0.1, print_each=None)
    assert any("GSPMD" in r.getMessage() for r in records), (
        "expected a loud fused-mesh degradation warning"
    )

    single = Mapper(
        S=np.asarray(data.S), G=np.asarray(data.G), d=np.asarray(data.d),
        lambda_d=1.0, random_state=42, optimizer="adafactor", impl="xla",
    )
    M_single, _ = single.train(20, 0.1, print_each=None)
    np.testing.assert_allclose(M_mesh, M_single, atol=5e-3)


class _log_capture:
    def __enter__(self):
        import logging as _logging

        self.records = []
        self.handler = _logging.Handler()
        self.handler.emit = self.records.append
        _logging.getLogger().addHandler(self.handler)
        return self.records

    def __exit__(self, *exc):
        import logging as _logging

        _logging.getLogger().removeHandler(self.handler)
        return False
