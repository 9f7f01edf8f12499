"""Pallas fused-core equivalence tests (interpret mode on CPU).

The Pallas kernels must match the XLA reference implementation of
``mapper_core`` — values AND gradients — including ragged (non-tile-multiple)
shapes and the gene-axis padding path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tangram_tpu.ops.core import _mapper_core_xla
from tangram_tpu.ops.pallas_core import mapper_core_pallas


def make_inputs(rng, c, s, k):
    M = rng.normal(0, 1, (c, s)).astype(np.float32)
    A = rng.normal(0, 1, (c, k)).astype(np.float32)
    w = rng.random(c).astype(np.float32)
    return jnp.asarray(M), jnp.asarray(A), jnp.asarray(w)


@pytest.mark.parametrize(
    "c,s,k",
    [
        (8, 16, 4),          # tiny
        (300, 600, 7),       # ragged in every dimension
        (256, 512, 128),     # exact single tile
        (257, 513, 129),     # one past a tile boundary
    ],
)
def test_forward_matches_xla(rng, c, s, k):
    M, A, w = make_inputs(rng, c, s, k)
    Y0, q0, h0 = _mapper_core_xla(M, A, w)
    Y1, q1, h1 = mapper_core_pallas(M, A, w)
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Y0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("c,s,k", [(24, 40, 5), (300, 600, 7)])
def test_gradients_match_xla(rng, c, s, k):
    M, A, w = make_inputs(rng, c, s, k)
    # a scalar loss touching all three outputs with distinct weights
    cY = jnp.asarray(rng.normal(0, 1, (s, k)).astype(np.float32))
    cq = jnp.asarray(rng.normal(0, 1, (s,)).astype(np.float32))
    ch = jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32))

    def loss(core):
        def f(M, A, w):
            Y, q, h = core(M, A, w)
            return jnp.sum(Y * cY) + jnp.sum(q * cq) + jnp.sum(h * ch)

        return f

    g0 = jax.grad(loss(_mapper_core_xla), argnums=(0, 1, 2))(M, A, w)
    g1 = jax.grad(loss(mapper_core_pallas), argnums=(0, 1, 2))(M, A, w)
    for a, b, name in zip(g1, g0, "M A w".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_full_loss_gradient_through_pallas(rng):
    """compute_loss(impl='pallas') must match impl='xla' end to end."""
    from tangram_tpu.ops.losses import LossWeights, MapperData, compute_loss

    c, s, g = 40, 96, 9
    S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
    M = rng.normal(0, 1, (c, s)).astype(np.float32)
    d = rng.random(s).astype(np.float32)
    d /= d.sum()

    lw = LossWeights(lambda_g1=1.0, lambda_d=0.7, lambda_g2=0.5, lambda_r=0.1)
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d))

    def total(M, impl):
        return compute_loss(jnp.asarray(M), data, lw, impl=impl)[0]

    t_xla = float(total(M, "xla"))
    t_pal = float(total(M, "pallas"))
    assert t_pal == pytest.approx(t_xla, rel=1e-4)

    g_xla = jax.grad(lambda m: total(m, "xla"))(jnp.asarray(M))
    g_pal = jax.grad(lambda m: total(m, "pallas"))(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla), rtol=2e-4, atol=2e-5)


def test_constrained_loss_gradient_through_pallas(rng):
    from tangram_tpu.ops.losses import LossWeights, MapperData, compute_constrained_loss

    c, s, g = 32, 64, 6
    S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
    M = rng.normal(0, 1, (c, s)).astype(np.float32)
    F = rng.normal(0, 1, (c,)).astype(np.float32)
    d = np.full(s, 1 / s, np.float32)

    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0, lambda_g2=1.0, lambda_r=0.05,
                     lambda_count=0.5, lambda_f_reg=0.3)
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d),
                      target_count=jnp.float32(20))

    def total(params, impl):
        return compute_constrained_loss(params, data, lw, impl=impl)[0]

    params = (jnp.asarray(M), jnp.asarray(F))
    assert float(total(params, "pallas")) == pytest.approx(float(total(params, "xla")), rel=1e-4)
    gM_x, gF_x = jax.grad(lambda p: total(p, "xla"))(params)
    gM_p, gF_p = jax.grad(lambda p: total(p, "pallas"))(params)
    np.testing.assert_allclose(np.asarray(gM_p), np.asarray(gM_x), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gF_p), np.asarray(gF_x), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("seed", range(6))
def test_mapper_core_random_shapes(seed):
    """Shape fuzz: ragged tiles on every axis, forward and gradients must
    match the XLA reference implementation."""
    import jax

    from tangram_tpu.ops.core import _mapper_core_xla
    from tangram_tpu.ops.pallas_core import mapper_core_pallas

    rng = np.random.default_rng(100 + seed)
    c = int(rng.integers(3, 1200))
    s = int(rng.integers(3, 900))
    k = int(rng.integers(1, 300))
    M = jnp.asarray(rng.normal(size=(c, s)), jnp.float32)
    A = jnp.asarray(rng.normal(size=(c, k)), jnp.float32)
    w = jnp.asarray(rng.random(c), jnp.float32)

    Yx, qx, hx = _mapper_core_xla(M, A, w)
    Yp, qp, hp = mapper_core_pallas(M, A, w)
    np.testing.assert_allclose(np.asarray(Yp), np.asarray(Yx), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(qx), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hx), rtol=2e-4, atol=2e-4)

    ctY = jnp.asarray(rng.normal(size=(s, k)), jnp.float32)
    ctq = jnp.asarray(rng.normal(size=(s,)), jnp.float32)
    cth = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

    def loss(core):
        def f(M, A, w):
            Y, q, h = core(M, A, w)
            return jnp.sum(Y * ctY) + jnp.sum(q * ctq) + jnp.sum(h * cth)
        return f

    gx = jax.grad(loss(_mapper_core_xla), argnums=(0, 1, 2))(M, A, w)
    gp = jax.grad(loss(mapper_core_pallas), argnums=(0, 1, 2))(M, A, w)
    for a, b, name in zip(gp, gx, "MAw"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad wrt {name} (c={c}, s={s}, k={k})",
        )
