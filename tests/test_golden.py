"""Pinned golden regression at the reference's operating point.

Mirrors /root/reference/tests/tangram_test.py:67-103 (clusters mode,
random_state=42, 500 epochs, 9 loss parametrizations) on a deterministic
synthetic fixture — the reference's own h5ad fixtures are absent from the
snapshot. The pinned values in ``data/golden_mapping.json`` were produced by
the live torch reference optimizer (``scripts/gen_goldens.py``); this test
asserts them WITHOUT torch, so numeric drift in the JAX optimizer or the
data-prep chain is caught in any environment.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

import tangram_tpu as tg

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "data", "golden_mapping.json")

# (lambda_g1, lambda_g2, lambda_d, density_prior, scale) — the reference's
# 9 golden parametrizations (tangram_test.py:68-80).
PARAMS = [
    (1, 0, 0, None, True),
    (1, 0, 0, None, False),
    (1, 1, 0, None, True),
    (1, 1, 0, None, False),
    (1, 1, 1, "uniform", True),
    (1, 1, 1, "uniform", False),
    (1, 0, 2, "uniform", True),
    (1, 0, 1, "rna_count_based", True),
    (1, 0, 1, "uniform", True),
]


def build_fixture():
    """Deterministic synthetic sc/sp pair with 4 annotated subclasses."""
    rng = np.random.default_rng(2026)
    n_cells, n_spots, n_genes = 60, 40, 35
    S = (rng.negative_binomial(2, 0.3, (n_cells, n_genes)) + 0).astype(np.float32)
    G = (rng.negative_binomial(2, 0.3, (n_spots, n_genes)) + 0).astype(np.float32)
    # anchor one positive count per gene on each side so pp_adatas keeps all
    S[0] += 1
    G[0] += 1
    labels = pd.Categorical(
        np.asarray(["exc", "inh", "glia", "endo"])[np.arange(n_cells) % 4]
    )
    ad_sc = tg.AnnData(
        X=S,
        obs=pd.DataFrame({"subclass_label": labels},
                         index=[f"c{i}" for i in range(n_cells)]),
        var=pd.DataFrame(index=[f"gene{i}" for i in range(n_genes)]),
    )
    ad_sp = tg.AnnData(
        X=G,
        obs=pd.DataFrame(index=[f"s{i}" for i in range(n_spots)]),
        var=pd.DataFrame(index=[f"gene{i}" for i in range(n_genes)]),
    )
    tg.pp_adatas(ad_sc, ad_sp)
    return ad_sc, ad_sp


def prep_mapper_inputs(ad_sc, ad_sp, prior, scale, lambda_d):
    """The exact (S, G, d, d_source, lambda_d) map_cells_to_space hands the
    optimizer in clusters mode — shared with scripts/gen_goldens.py so the
    torch reference trains on identical inputs."""
    from tangram_tpu.mapping import (
        _check_mapping_args,
        _densify,
        _resolve_density,
        adata_to_cluster_expression,
    )

    lam = _check_mapping_args(
        "clusters", 1, lambda_d, prior, "subclass_label", None, 1, 1
    )
    ad_agg = adata_to_cluster_expression(
        ad_sc, "subclass_label", scale, add_density=True
    )
    genes = ad_agg.uns["training_genes"]
    S = _densify(ad_agg[:, genes].X)
    G = _densify(ad_sp[:, genes].X)
    resolved = _resolve_density("clusters", prior, lam, ad_agg, ad_sp)
    return S, G, resolved.d, resolved.d_source, resolved.lambda_d


@pytest.fixture(scope="module")
def fixture_pair():
    return build_fixture()


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as f:
        return {tuple(g["params"]): g for g in json.load(f)}


@pytest.mark.parametrize("lambda_g1, lambda_g2, lambda_d, prior, scale", PARAMS)
def test_golden_mapping_values(
    fixture_pair, goldens, lambda_g1, lambda_g2, lambda_d, prior, scale
):
    ad_sc, ad_sp = fixture_pair
    gold = goldens[(lambda_g1, lambda_g2, lambda_d, prior, scale)]

    ad_map = tg.map_cells_to_space(
        adata_sc=ad_sc,
        adata_sp=ad_sp,
        mode="clusters",
        cluster_label="subclass_label",
        lambda_g1=lambda_g1,
        lambda_g2=lambda_g2,
        lambda_d=lambda_d,
        density_prior=prior,
        scale=scale,
        random_state=42,
        num_epochs=500,
        verbose=False,
    )

    # the reference's own assertion style (3 decimals on X[0, 0]) ...
    assert round(float(ad_map.X[0, 0]), 3) == round(gold["x00"], 3)
    # ... plus tighter probes on the leading row and the converged score
    np.testing.assert_allclose(
        np.asarray(ad_map.X[0, :3], dtype=np.float64),
        np.asarray(gold["row0_head"], dtype=np.float64),
        atol=1e-3,
    )
    ours_final = float(list(ad_map.uns["training_history"]["main_loss"])[-1])
    assert ours_final == pytest.approx(gold["final_main_loss"], abs=1e-3)
