"""Gene-selection strategy tests: marker ranking recovers planted markers,
HVG recovers planted high-dispersion genes, Moran SVG recovers planted
spatial patterns."""

import numpy as np
import pandas as pd
import pytest

import tangram_tpu as tg
from tangram_tpu import gene_selection as gs


def test_ctg_recovers_planted_markers(rng):
    n_per, g = 40, 30
    # genes 0-4 up in cluster A, genes 5-9 up in cluster B
    base = rng.poisson(2.0, (2 * n_per, g)).astype(float)
    base[:n_per, 0:5] += 20
    base[n_per:, 5:10] += 20
    ad = tg.AnnData(
        X=base,
        obs=pd.DataFrame({"ct": pd.Categorical(["A"] * n_per + ["B"] * n_per)}),
        var=pd.DataFrame(index=[f"g{i}" for i in range(g)]),
    )
    markers = gs.ctg(ad, "ct", n_genes=5)
    assert set(markers) == {f"g{i}" for i in range(10)}


def test_hvg_recovers_high_dispersion(rng):
    n, g = 1000, 500
    # realistic bulk: per-gene rates spread over a range so mean-bins are
    # populated across the spectrum (Poisson ⇒ dispersion ≈ 1 everywhere)
    rates = rng.uniform(1.0, 10.0, g)
    X = rng.poisson(rates, (n, g)).astype(float)
    # plant 5 genes with huge dispersion at mid-range means
    for j in range(5):
        X[:, j] = np.where(rng.random(n) < 0.5, 10.0, 0.0)
    ad = tg.AnnData(X=X, var=pd.DataFrame(index=[f"g{i}" for i in range(g)]))
    top = gs.hvg(ad, n_top_genes=10)
    # planted genes share mean-bins and inflate each other's bin std —
    # intrinsic to the seurat flavor — so allow one miss
    recovered = {f"g{i}" for i in range(5)} & set(top)
    assert len(recovered) >= 4


def test_svg_recovers_spatial_pattern(rng):
    n, g = 150, 20
    coords = rng.random((n, 2))
    X = rng.poisson(3.0, (n, g)).astype(float)
    # genes 0-2 follow a smooth spatial gradient
    for j in range(3):
        X[:, j] = 20 * (coords[:, 0] + coords[:, 1]) + rng.normal(0, 0.5, n)
    ad = tg.AnnData(X=X, var=pd.DataFrame(index=[f"g{i}" for i in range(g)]))
    ad.obsm["spatial"] = coords
    found = gs.svg(ad, alpha=0.05)
    assert {"g0", "g1", "g2"}.issubset(set(found))
    # random genes should mostly NOT be called spatial
    assert len(found) <= 8
    assert "svg_results" in ad.uns
    res = ad.uns["svg_results"]
    assert {"gene", "moran_i", "pval", "padj"}.issubset(res.columns)


def test_spapros_requires_package():
    with pytest.raises(ImportError, match="spapros"):
        gs.spapros(tg.AnnData(X=np.ones((2, 2))))
