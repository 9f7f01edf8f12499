"""Per-term loss unit tests: closed-form numpy checks + torch reference parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tangram_tpu.ops.losses import (
    LossWeights,
    MapperData,
    compute_constrained_loss,
    compute_loss,
    cosine_similarity,
    kl_div_sum,
    spatial_local_indicators,
    val_metrics,
)

from _reference import load_reference_optimizer

REF = load_reference_optimizer()


def make_problem(rng, c=12, s=9, g=7):
    S = rng.poisson(2.0, (c, g)).astype(np.float32) + 0.1
    G = rng.poisson(3.0, (s, g)).astype(np.float32) + 0.1
    M = rng.normal(0, 1, (c, s)).astype(np.float32)
    d = rng.random(s).astype(np.float32)
    d /= d.sum()
    d_source = rng.random(c).astype(np.float32)
    d_source /= d_source.sum()
    W = rng.random((s, s)).astype(np.float32)
    W *= rng.random((s, s)) < 0.4
    ct = np.zeros((c, 3), np.float32)
    ct[np.arange(c), rng.integers(0, 3, c)] = 1
    return S, G, M, d, d_source, W, ct


def np_softmax(M):
    e = np.exp(M - M.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def test_cosine_similarity_closed_form(rng):
    x = rng.normal(size=(10, 4)).astype(np.float32)
    y = rng.normal(size=(10, 4)).astype(np.float32)
    got = np.asarray(cosine_similarity(jnp.asarray(x), jnp.asarray(y), axis=0))
    want = (x * y).sum(0) / (np.linalg.norm(x, axis=0) * np.linalg.norm(y, axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kl_div_closed_form():
    target = np.array([0.5, 0.25, 0.25, 0.0], np.float32)
    pred = np.array([0.3, 0.3, 0.2, 0.2], np.float32)
    got = float(kl_div_sum(jnp.log(pred), jnp.asarray(target)))
    want = sum(t * (np.log(t) - np.log(p)) for t, p in zip(target, pred) if t > 0)
    assert got == pytest.approx(want, rel=1e-4)


def test_gv_term_closed_form(rng):
    S, G, M, *_ = make_problem(rng)
    lw = LossWeights(lambda_g1=1.0)
    total, terms = compute_loss(jnp.asarray(M), MapperData(S=jnp.asarray(S), G=jnp.asarray(G)), lw)
    P = np_softmax(M)
    Gp = P.T @ S
    want = np.mean(
        (Gp * G).sum(0) / (np.linalg.norm(Gp, axis=0) * np.linalg.norm(G, axis=0))
    )
    assert float(terms["main_loss"]) == pytest.approx(want, rel=1e-4)
    assert float(total) == pytest.approx(-want, rel=1e-4)


def test_geary_streamed_identity(rng):
    """The streamed Geary's C equals the O(s²·g) broadcast definition."""
    S, G, M, d, ds, W, ct = make_problem(rng)
    lw = LossWeights(lambda_geary=1.0)
    _, _, geary = spatial_local_indicators(jnp.asarray(G), jnp.asarray(W), lw)
    s, g = G.shape
    m2 = ((G - G.mean(axis=0)) ** 2).sum(axis=0) / (s - 1)
    diffs = (G[None, :, :] - G[:, None, :]) ** 2  # (i, j, g): (G_j - G_i)^2
    want = (W[:, :, None] * diffs).sum(axis=(0, 1)) / (2 * m2)
    np.testing.assert_allclose(np.asarray(geary), want, rtol=2e-4)


def test_gene_mask_equals_subset(rng):
    """Padded gene masking must equal training on the gene subset."""
    S, G, M, d, ds, W, ct = make_problem(rng, g=8)
    keep = np.array([1, 1, 0, 1, 0, 1, 1, 0], np.float32)
    idx = np.where(keep > 0)[0]
    lw = LossWeights(lambda_g1=1.0, lambda_g2=0.7, lambda_d=0.5, lambda_r=0.1)
    t_mask, terms_mask = compute_loss(
        jnp.asarray(M),
        MapperData(S=jnp.asarray(S), G=jnp.asarray(G), gene_mask=jnp.asarray(keep), d=jnp.asarray(d)),
        lw,
    )
    t_sub, terms_sub = compute_loss(
        jnp.asarray(M),
        MapperData(S=jnp.asarray(S[:, idx]), G=jnp.asarray(G[:, idx]), d=jnp.asarray(d)),
        lw,
    )
    assert float(t_mask) == pytest.approx(float(t_sub), rel=1e-4)
    assert float(terms_mask["main_loss"]) == pytest.approx(float(terms_sub["main_loss"]), rel=1e-4)
    assert float(terms_mask["vg_reg"]) == pytest.approx(float(terms_sub["vg_reg"]), rel=1e-4)


@pytest.mark.skipif(REF is None, reason="reference torch optimizer unavailable")
@pytest.mark.parametrize(
    "kwargs",
    [
        dict(lambda_g1=1.0),
        dict(lambda_g1=1.0, lambda_g2=0.8),
        dict(lambda_g1=1.0, lambda_d=0.5, use_d=True),
        dict(lambda_g1=1.0, lambda_d=0.5, use_d=True, use_d_source=True),
        dict(lambda_g1=1.0, lambda_r=0.3),
        dict(lambda_g1=1.0, lambda_l1=0.2, lambda_l2=0.1),
        dict(lambda_g1=1.0, lambda_neighborhood_g1=0.4, use_voxel_w=True),
        dict(lambda_g1=1.0, lambda_ct_islands=0.6, use_ct=True),
        dict(lambda_g1=1.0, lambda_getis_ord=0.5, use_spatial_w=True),
        dict(lambda_g1=1.0, lambda_moran=0.5, use_spatial_w=True),
        dict(lambda_g1=1.0, lambda_geary=0.5, use_spatial_w=True),
        dict(
            lambda_g1=1.0, lambda_g2=0.3, lambda_d=0.2, use_d=True, lambda_r=0.1,
            lambda_l1=0.05, lambda_l2=0.02, lambda_neighborhood_g1=0.4,
            use_voxel_w=True, lambda_ct_islands=0.6, use_ct=True,
            lambda_getis_ord=0.5, lambda_moran=0.25, lambda_geary=0.15,
            use_spatial_w=True,
        ),
    ],
)
def test_loss_matches_reference(rng, kwargs):
    """Every individual term (and the total) matches the torch reference."""
    import torch

    S, G, M, d, d_source, W, ct = make_problem(rng)
    use_d = kwargs.pop("use_d", False)
    use_d_source = kwargs.pop("use_d_source", False)
    use_voxel_w = kwargs.pop("use_voxel_w", False)
    use_ct = kwargs.pop("use_ct", False)
    use_spatial_w = kwargs.pop("use_spatial_w", False)

    ref_mapper = REF.Mapper(
        S=S,
        G=G,
        d=d if use_d else None,
        d_source=d_source if use_d_source else None,
        voxel_weights=W if use_voxel_w else None,
        neighborhood_filter=W if use_ct else None,
        ct_encode=ct if use_ct else None,
        spatial_weights=W if use_spatial_w else None,
        **kwargs,
    )
    ref_mapper.M = torch.tensor(M, dtype=torch.float32, requires_grad=True)
    ref_total, ref_main, ref_vg, ref_kl, ref_ent = ref_mapper._loss_fn(verbose=False)
    ref_total = ref_total.detach()  # float() on a grad-carrying tensor warns

    lw = LossWeights(**{k: float(v) for k, v in kwargs.items()})
    data = MapperData(
        S=jnp.asarray(S),
        G=jnp.asarray(G),
        d=jnp.asarray(d) if use_d else None,
        d_source=jnp.asarray(d_source) if use_d_source else None,
        voxel_weights=jnp.asarray(W) if use_voxel_w else None,
        neighborhood_filter=jnp.asarray(W) if use_ct else None,
        ct_encode=jnp.asarray(ct) if use_ct else None,
        spatial_weights=jnp.asarray(W) if use_spatial_w else None,
    )
    if use_spatial_w:
        getis, moran, geary = spatial_local_indicators(jnp.asarray(G), jnp.asarray(W), lw)
        data = data._replace(getis_ord_ref=getis, moran_ref=moran, geary_ref=geary)

    total, terms = compute_loss(jnp.asarray(M), data, lw, impl="xla")

    assert float(total) == pytest.approx(float(ref_total), rel=2e-4, abs=1e-5)
    assert float(terms["main_loss"]) == pytest.approx(ref_main, rel=2e-4)
    if not np.isnan(ref_kl):
        assert float(terms["kl_reg"]) == pytest.approx(ref_kl, rel=2e-4, abs=1e-5)
    if kwargs.get("lambda_g2", 0):
        assert float(terms["vg_reg"]) == pytest.approx(ref_vg, rel=2e-4)
    if kwargs.get("lambda_r", 0):
        assert float(terms["entropy_reg"]) == pytest.approx(ref_ent, rel=2e-4)


@pytest.mark.skipif(REF is None, reason="reference torch optimizer unavailable")
def test_constrained_loss_matches_reference(rng):
    import torch

    S, G, M, d, *_ = make_problem(rng)
    F = rng.normal(0, 1, S.shape[0]).astype(np.float32)

    ref = REF.MapperConstrained(
        S=S, G=G, d=d, lambda_d=0.5, lambda_g1=1.0, lambda_g2=0.7, lambda_r=0.2,
        lambda_count=0.8, lambda_f_reg=0.4, target_count=6,
    )
    ref.M = torch.tensor(M, dtype=torch.float32, requires_grad=True)
    ref.F = torch.tensor(F, dtype=torch.float32, requires_grad=True)
    out = ref._loss_fn(verbose=False)
    ref_total, ref_main, ref_vg, ref_kl, ref_ent, ref_count, ref_freg = out
    ref_total = ref_total.detach()  # float() on a grad-carrying tensor warns

    lw = LossWeights(
        lambda_g1=1.0, lambda_d=0.5, lambda_g2=0.7, lambda_r=0.2,
        lambda_count=0.8, lambda_f_reg=0.4,
    )
    data = MapperData(
        S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d),
        target_count=jnp.float32(6),
    )
    total, terms = compute_constrained_loss(
        (jnp.asarray(M), jnp.asarray(F)), data, lw, impl="xla"
    )
    assert float(total) == pytest.approx(float(ref_total), rel=2e-4)
    assert float(terms["main_loss"]) == pytest.approx(ref_main, rel=2e-4)
    assert float(terms["vg_reg"]) == pytest.approx(ref_vg, rel=2e-4)
    assert float(terms["kl_reg"]) == pytest.approx(ref_kl, rel=2e-4, abs=1e-5)
    assert float(terms["entropy_reg"]) == pytest.approx(ref_ent, rel=2e-4)
    assert float(terms["count_reg"]) == pytest.approx(ref_count, rel=2e-4, abs=1e-5)
    assert float(terms["lambda_f_reg"]) == pytest.approx(ref_freg, rel=2e-4)


@pytest.mark.skipif(REF is None, reason="reference torch optimizer unavailable")
def test_val_metrics_match_reference(rng):
    import torch

    S, G, M, *_ = make_problem(rng)
    ref = REF.Mapper(S=S, G=G)
    ref.M = torch.tensor(M, dtype=torch.float32, requires_grad=True)
    ref_expr, ref_gv, ref_spw, ref_ent = ref._val_loss_fn(verbose=False)

    m = val_metrics(jnp.asarray(M), jnp.asarray(S), jnp.asarray(G))
    assert float(m["val_total_loss"]) == pytest.approx(ref_expr, rel=2e-4)
    assert float(m["val_gene_sim"]) == pytest.approx(ref_gv, rel=2e-4)
    assert float(m["val_sp_sparsity_weighted_sim"]) == pytest.approx(ref_spw, rel=2e-4)
    assert float(m["val_entropy"]) == pytest.approx(ref_ent, rel=2e-4)


def test_spatial_indicators_neighbor_graph_matches_dense(rng):
    """Getis-Ord / Moran / Geary computed through a structured NeighborGraph
    (row_sums/col_sums/graph_matmul branches) must equal the dense-W forms,
    including the gradients that flow into training."""
    import jax

    from tangram_tpu.ops.core import neighbor_graph_from_dense

    S, G, M, d, ds, W, ct = make_problem(rng)
    lw = LossWeights(lambda_getis_ord=1.0, lambda_moran=1.0, lambda_geary=1.0)
    graph = neighbor_graph_from_dense(W)

    dense = spatial_local_indicators(jnp.asarray(G), jnp.asarray(W), lw)
    structured = spatial_local_indicators(jnp.asarray(G), graph, lw)
    for a, b, name in zip(structured, dense, ("getis", "moran", "geary")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5, err_msg=name)

    def total(Gv, Wv):
        g1, m1, c1 = spatial_local_indicators(Gv, Wv, lw)
        return jnp.sum(g1) + jnp.sum(m1) + jnp.sum(c1)

    gd = jax.grad(total)(jnp.asarray(G), jnp.asarray(W))
    gs = jax.grad(total)(jnp.asarray(G), graph)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=5e-4,
                               atol=5e-5)
