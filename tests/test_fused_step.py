"""Fused backward+Adam step equivalence: the Pallas fused path must produce
the exact optax-Adam trajectory of the generic XLA path."""

import numpy as np
import pytest

import jax.numpy as jnp

from tangram_tpu.models.mapper import fit_mapping, init_logits
from tangram_tpu.ops.losses import LossWeights, MapperData


def make_problem(rng, c=40, s=72, g=9, with_d=True):
    S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
    d = None
    if with_d:
        d = rng.random(s).astype(np.float32)
        d /= d.sum()
    data = MapperData(
        S=jnp.asarray(S),
        G=jnp.asarray(G),
        d=None if d is None else jnp.asarray(d),
    )
    M0 = init_logits(c, s, 3, "numpy")
    return M0, data


@pytest.mark.parametrize(
    "lw",
    [
        LossWeights(lambda_g1=1.0),
        LossWeights(lambda_g1=1.0, lambda_d=1.0),
        LossWeights(lambda_g1=1.0, lambda_g2=0.7, lambda_d=0.5, lambda_r=0.05),
        LossWeights(lambda_g1=1.0, lambda_l1=0.01, lambda_l2=0.005),
    ],
)
def test_fused_matches_generic(rng, lw):
    with_d = lw.lambda_d > 0
    M0, data = make_problem(rng, with_d=with_d)

    p_xla, h_xla = fit_mapping(M0, data, lw, 25, 0.1, impl="xla")
    p_fused, h_fused = fit_mapping(M0, data, lw, 25, 0.1, impl="pallas", fused=True)

    np.testing.assert_allclose(
        np.asarray(h_fused["total_loss"]),
        np.asarray(h_xla["total_loss"]),
        rtol=3e-4, atol=3e-5,
    )
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_xla), atol=3e-3)
    # single-step check is tight (no accumulation): first recorded loss
    assert float(h_fused["total_loss"][0]) == pytest.approx(
        float(h_xla["total_loss"][0]), rel=1e-5
    )


def test_fused_constrained_matches_generic(rng):
    """The fused (M, F) step — Adam on M in-kernel, F's gradient recovered
    from the rbar reduction — must track the generic optax path."""
    import jax

    M0, data = make_problem(rng)
    data = data._replace(target_count=jnp.float32(25.0))
    F0 = jnp.asarray(
        np.random.default_rng(7).normal(size=M0.shape[0]), jnp.float32
    )
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_r=0.01,
                     lambda_count=1.0, lambda_f_reg=1.0)

    p_xla, h_xla = fit_mapping((M0, F0), data, lw, 25, 0.1, constrained=True,
                               impl="xla")
    p_fused, h_fused = fit_mapping((M0, F0), data, lw, 25, 0.1,
                                   constrained=True, impl="pallas", fused=True)

    # The |sum(sigmoid F) - target| kink makes long constrained trajectories
    # sensitive; the pre-kink prefix must match tightly, the full softmax
    # output loosely.
    np.testing.assert_allclose(
        np.asarray(h_fused["total_loss"][:8]),
        np.asarray(h_xla["total_loss"][:8]),
        rtol=3e-4, atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(p_fused[0], axis=1)),
        np.asarray(jax.nn.softmax(p_xla[0], axis=1)),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(p_fused[1])),
        np.asarray(jax.nn.sigmoid(p_xla[1])),
        atol=5e-3,
    )


def test_fused_constrained_resume_opt_state(rng):
    M0, data = make_problem(rng)
    data = data._replace(target_count=jnp.float32(25.0))
    F0 = jnp.asarray(
        np.random.default_rng(7).normal(size=M0.shape[0]), jnp.float32
    )
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_count=1.0,
                     lambda_f_reg=1.0)
    p_full, _ = fit_mapping((M0, F0), data, lw, 20, 0.1, constrained=True,
                            impl="pallas", fused=True)
    p1, opt1, _ = fit_mapping((M0, F0), data, lw, 10, 0.1, constrained=True,
                              impl="pallas", fused=True, return_opt_state=True)
    p2, _ = fit_mapping(p1, data, lw, 10, 0.1, constrained=True,
                        impl="pallas", fused=True, opt_state=opt1)
    np.testing.assert_allclose(np.asarray(p2[0]), np.asarray(p_full[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2[1]), np.asarray(p_full[1]), atol=1e-6)


def test_bf16_moments_track_f32(rng):
    """bf16 Adam moments must track the f32 trajectory closely (values are
    computed in f32 in-kernel; only storage is bf16)."""
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M0, data = make_problem(rng)
    p32, h32 = fit_mapping(M0, data, lw, 30, 0.1, impl="pallas", fused=True)
    p16, h16 = fit_mapping(
        M0, data, lw, 30, 0.1, impl="pallas", fused=True, moment_dtype="bfloat16"
    )
    np.testing.assert_allclose(
        np.asarray(h16["total_loss"]), np.asarray(h32["total_loss"]),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=2e-2)


def test_bf16_compute_tracks_f32(rng):
    """bf16 A/dY matmul inputs (f32 accumulation) must track the f32
    trajectory within bf16 input-rounding tolerance."""
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M0, data = make_problem(rng)
    p32, h32 = fit_mapping(M0, data, lw, 30, 0.1, impl="pallas", fused=True)
    p16, h16 = fit_mapping(
        M0, data, lw, 30, 0.1, impl="pallas", fused=True,
        compute_dtype="bfloat16", moment_dtype="bfloat16",
    )
    np.testing.assert_allclose(
        np.asarray(h16["main_loss"]), np.asarray(h32["main_loss"]),
        rtol=2e-2, atol=2e-2,
    )


def test_fused_resume_opt_state(rng):
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M0, data = make_problem(rng)
    p_full, h_full = fit_mapping(M0, data, lw, 20, 0.1, impl="pallas", fused=True)
    p1, opt1, _ = fit_mapping(M0, data, lw, 10, 0.1, impl="pallas", fused=True, return_opt_state=True)
    p2, h2 = fit_mapping(p1, data, lw, 10, 0.1, impl="pallas", fused=True, opt_state=opt1)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_full), atol=1e-6)


def test_fused_with_spatial_regularizers(rng):
    """Neighborhood/ct-island/autocorr terms flow through the epilogue VJP —
    the fused path must match the generic path with them active."""
    from tangram_tpu.ops.losses import spatial_local_indicators

    c, s, g = 30, 48, 8
    M0, data = make_problem(rng, c=c, s=s, g=g)
    W = (rng.random((s, s)) * (rng.random((s, s)) < 0.3)).astype(np.float32)
    ct = np.zeros((c, 3), np.float32)
    ct[np.arange(c), rng.integers(0, 3, c)] = 1

    lw = LossWeights(
        lambda_g1=1.0, lambda_d=1.0, lambda_neighborhood_g1=0.4,
        lambda_ct_islands=0.5, lambda_moran=0.3,
    )
    getis, moran, geary = spatial_local_indicators(data.G, jnp.asarray(W), lw)
    data = data._replace(
        voxel_weights=jnp.asarray(W),
        neighborhood_filter=jnp.asarray(W),
        ct_encode=jnp.asarray(ct),
        spatial_weights=jnp.asarray(W),
        moran_ref=moran,
    )
    p_xla, h_xla = fit_mapping(M0, data, lw, 15, 0.1, impl="xla")
    p_fused, h_fused = fit_mapping(M0, data, lw, 15, 0.1, impl="pallas", fused=True)
    np.testing.assert_allclose(
        np.asarray(h_fused["total_loss"]), np.asarray(h_xla["total_loss"]),
        rtol=5e-4, atol=5e-5,
    )
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_xla), atol=3e-3)


def test_bf16_params_track_f32(rng):
    """bf16 parameter storage (param_dtype option: 2x capacity, ~30% less
    step bandwidth) must track the f32 trajectory within storage-rounding
    tolerance; updates still run in f32 in-kernel."""
    import jax

    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M0, data = make_problem(rng)
    p32, h32 = fit_mapping(M0, data, lw, 30, 0.1, impl="pallas", fused=True)
    p16, h16 = fit_mapping(
        M0, data, lw, 30, 0.1, impl="pallas", fused=True,
        param_dtype="bfloat16", moment_dtype="bfloat16",
        compute_dtype="bfloat16",
    )
    assert p16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(h16["main_loss"]), np.asarray(h32["main_loss"]),
        rtol=3e-2, atol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(p16.astype(jnp.float32), axis=1)),
        np.asarray(jax.nn.softmax(p32, axis=1)),
        atol=5e-2,
    )


def test_bf16_params_with_validation(rng):
    """Regression: val_metrics builds its marginal weight vector in f32 even
    when M is stored bf16 — the Pallas stat blocks reject bf16 vector
    operands, so bf16 storage + val_each used to crash at compile."""
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M0, data = make_problem(rng)
    val_data = MapperData(S=data.S[:, :4], G=data.G[:, :4])
    p16, h16 = fit_mapping(
        M0, data, lw, 12, 0.1, impl="pallas", fused=True,
        param_dtype="bfloat16", with_val=True, val_data=val_data, val_each=4,
    )
    vg = np.asarray(h16["val_gene_sim"], np.float32)
    assert np.isfinite(vg[::4]).all()
    # matches the f32-param validation history to storage tolerance
    _, h32 = fit_mapping(
        M0, data, lw, 12, 0.1, impl="pallas", fused=True,
        with_val=True, val_data=val_data, val_each=4,
    )
    np.testing.assert_allclose(
        vg[::4], np.asarray(h32["val_gene_sim"], np.float32)[::4], atol=3e-2
    )


# --- stochastic rounding (rounding="stochastic") ---


def test_sr_cast_unbiased_and_deterministic():
    """_sr_cast is an unbiased f32→bf16 quantizer: for a value halfway
    between bf16 neighbors, E[stored] equals the value (not the nearest)."""
    import jax.numpy as jnp

    from tangram_tpu.ops.fused_step import _sr_cast

    lo = np.float32(1.0)
    hi = np.float32(np.nextafter(jnp.bfloat16(1.0).astype(np.float32), 2.0))
    hi = np.asarray(jnp.asarray(1.0, jnp.bfloat16), np.float32)
    # halfway between bf16(1.0) and the next bf16 up
    import ml_dtypes

    nxt = np.nextafter(np.asarray(1.0, ml_dtypes.bfloat16),
                       np.asarray(2.0, ml_dtypes.bfloat16))
    half = (1.0 + float(nxt)) / 2.0
    val = jnp.full((64, 256), half, jnp.float32)

    out = np.asarray(_sr_cast(val, jnp.bfloat16, jnp.uint32(7)), np.float32)
    uniq = np.unique(out)
    assert set(uniq) <= {1.0, float(nxt)}  # rounds to a neighbor, never away
    frac_up = (out == float(nxt)).mean()
    assert 0.4 < frac_up < 0.6  # unbiased: ~half round up
    # identical seed -> identical draw; different seed -> different draw
    out2 = np.asarray(_sr_cast(val, jnp.bfloat16, jnp.uint32(7)), np.float32)
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(_sr_cast(val, jnp.bfloat16, jnp.uint32(8)), np.float32)
    assert (out != out3).any()

    # f32 target is the identity
    same = _sr_cast(val, jnp.float32, jnp.uint32(7))
    np.testing.assert_array_equal(np.asarray(same), np.asarray(val))


def test_sr_training_tracks_f32(rng):
    """bf16 params+moments with stochastic rounding trains to within a loose
    tolerance of the f32 trajectory, and is reproducible."""
    from tangram_tpu.models.mapper import fit_mapping, init_logits
    from tangram_tpu.ops.losses import LossWeights, MapperData

    c, s, g = 48, 40, 12
    S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
    d = rng.random(s).astype(np.float32)
    d /= d.sum()
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d))
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)
    M0 = init_logits(c, s, 3, "numpy")

    kw = dict(impl="pallas", fused=True)
    _, h32 = fit_mapping(M0, data, lw, 60, 0.1, **kw)
    _, hsr = fit_mapping(M0, data, lw, 60, 0.1, param_dtype="bfloat16",
                         moment_dtype="bfloat16", rounding="stochastic", **kw)
    _, hsr2 = fit_mapping(M0, data, lw, 60, 0.1, param_dtype="bfloat16",
                          moment_dtype="bfloat16", rounding="stochastic", **kw)

    a = np.asarray(h32["main_loss"])
    b = np.asarray(hsr["main_loss"])
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b[-1], a[-1], atol=2e-2)  # loose: bf16 storage
    np.testing.assert_array_equal(b, np.asarray(hsr2["main_loss"]))


def test_sr_sharded_runs_and_tracks(rng):
    """Stochastic rounding through the sharded 1-D path: per-shard tile ids
    give different draws than single-device, so assert tracking (not
    equality) and determinism."""
    import jax
    from jax.sharding import Mesh

    from tangram_tpu.models.mapper import fit_mapping, init_logits
    from tangram_tpu.ops.losses import LossWeights, MapperData
    from tangram_tpu.parallel.fused_sharded import fit_mapping_fused_sharded

    c, s, g = 64, 32, 8
    S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G))
    lw = LossWeights(lambda_g1=1.0)
    M0 = init_logits(c, s, 3, "numpy").astype(jnp.bfloat16)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(-1), axis_names=("cell",))

    _, href = fit_mapping(M0, data, lw, 30, 0.1, impl="pallas", fused=True,
                          param_dtype="bfloat16", moment_dtype="bfloat16",
                          rounding="stochastic")
    _, hsh = fit_mapping_fused_sharded(
        M0, data, lw, 30, 0.1, mesh=mesh, moment_dtype=jnp.bfloat16,
        rounding="stochastic",
    )
    a, b = np.asarray(href["main_loss"]), np.asarray(hsh["main_loss"])
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b[-1], a[-1], atol=3e-2)


def test_rounding_validation(rng):
    """Invalid or silently-unsupported rounding configurations are rejected
    instead of training with biased round-to-nearest stores."""
    import pytest

    from tangram_tpu.models.mapper import Mapper, fit_mapping, init_logits
    from tangram_tpu.ops.losses import LossWeights, MapperData

    c, s, g = 24, 20, 8
    S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G))
    lw = LossWeights(lambda_g1=1.0)
    M0 = init_logits(c, s, 3, "numpy")

    # typo'd value fails fast at the constructor
    with pytest.raises(ValueError, match="rounding"):
        Mapper(S=S, G=G, rounding="Stochastic")
    # the XLA path stores round-to-nearest; requesting SR there must raise
    with pytest.raises(ValueError, match="stochastic"):
        fit_mapping(M0, data, lw, 5, 0.1, impl="xla",
                    param_dtype="bfloat16", rounding="stochastic")
    # SR only supports f32/bf16 storage
    with pytest.raises(ValueError, match="float32/bfloat16"):
        fit_mapping(M0, data, lw, 5, 0.1, impl="pallas", fused=True,
                    param_dtype="float16", rounding="stochastic")
    with pytest.raises(ValueError, match="float32/bfloat16"):
        Mapper(S=S, G=G, param_dtype="float16", rounding="stochastic")

    # a mesh without a "cell" axis trains through GSPMD, which stores
    # round-to-nearest — requesting SR there must raise, not silently bias
    import jax
    from jax.sharding import Mesh

    from tangram_tpu.models.mapper import MapperConstrained

    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("spot",))
    m = Mapper(S=S, G=G, mesh=mesh, param_dtype="bfloat16",
               rounding="stochastic")
    with pytest.raises(ValueError, match="stochastic"):
        m.train(num_epochs=2, print_each=None)
    d = np.full(s, 1.0 / s, np.float32)
    mc = MapperConstrained(S=S, G=G, d=d, mesh=mesh, param_dtype="bfloat16",
                           rounding="stochastic")
    with pytest.raises(ValueError, match="stochastic"):
        mc.train(num_epochs=2, print_each=None)
