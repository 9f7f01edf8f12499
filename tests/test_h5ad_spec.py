"""Structural tests of adlite's h5ad output against the anndata on-disk
specification (VERDICT r4 #7).

The real ``anndata`` package is not installable in this offline environment,
so the duck-typing interop claim (``mapping.py``) can't be exercised live
here (CI's anndata matrix leg does that, ``tests/test_anndata_interop.py``).
These tests instead pin the LAYOUT: every group/dataset and
encoding-type/encoding-version attribute that anndata ≥0.8's element
registry (``anndata._io.specs.registry``) dispatches on when reading, so a
file adlite writes is readable by the real reader without running it.

Spec source: the anndata on-disk format documentation
(anndata.readthedocs.io "On-disk format", v0.8+ element encodings), matching
what the reference's AnnData contract relies on
(``/root/reference/tangram/mapping_utils.py:141`` — AnnData in, AnnData out).
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from tangram_tpu.adlite import AnnData, read_h5ad, write_h5ad

h5py = pytest.importorskip("h5py")


@pytest.fixture
def rich_adata(rng):
    n_obs, n_var = 7, 5
    obs = pd.DataFrame(
        {
            "subclass_label": pd.Categorical(
                ["a", "b", "a", "c", "b", "a", "c"]
            ),
            "n_counts": np.arange(n_obs, dtype=np.float64),
            "batch": ["x1", "x2", "x1", "x1", "x2", "x2", "x1"],
        },
        index=[f"cell{i}" for i in range(n_obs)],
    )
    var = pd.DataFrame(
        {"sparsity": rng.random(n_var).astype(np.float64)},
        index=[f"g{i}" for i in range(n_var)],
    )
    ad = AnnData(
        X=rng.poisson(2.0, (n_obs, n_var)).astype(np.float32),
        obs=obs,
        var=var,
    )
    ad.obsm["spatial"] = rng.random((n_obs, 2))
    ad.obsp["spatial_connectivities"] = sp.csr_matrix(
        (np.ones(4), ([0, 1, 2, 3], [1, 0, 3, 2])), shape=(n_obs, n_obs)
    )
    ad.uns["training_genes"] = [f"g{i}" for i in range(n_var)]
    ad.uns["overlap_genes"] = [f"g{i}" for i in range(n_var)]
    ad.uns["meta"] = {"version": "1.0", "n_epochs": 1000, "scaled": True}
    ad.layers["counts"] = rng.poisson(1.0, (n_obs, n_var)).astype(np.float32)
    return ad


@pytest.fixture
def h5(rich_adata, tmp_path):
    path = tmp_path / "spec.h5ad"
    write_h5ad(path, rich_adata)
    with h5py.File(path, "r") as f:
        yield f


def _enc(node):
    t = node.attrs.get("encoding-type")
    v = node.attrs.get("encoding-version")
    dec = lambda x: x.decode() if isinstance(x, bytes) else x  # noqa: E731
    return dec(t), dec(v)


def test_root_encoding(h5):
    """File root is the 'anndata' element, version 0.1.0."""
    assert _enc(h5) == ("anndata", "0.1.0")
    # every anndata axis container the reader walks is present as a group
    for key in ("obs", "var", "uns", "obsm", "varm", "obsp", "layers"):
        assert key in h5, key
        assert isinstance(h5[key], h5py.Group)


def test_dense_array_encoding(h5):
    """Dense X / obsm members / layers are 'array' v0.2.0 datasets with a
    native float dtype (no object/string leakage)."""
    for key in ("X", "obsm/spatial", "layers/counts"):
        node = h5[key]
        assert isinstance(node, h5py.Dataset), key
        assert _enc(node) == ("array", "0.2.0"), key
        assert node.dtype.kind == "f", key


def test_dataframe_encoding(h5):
    """obs/var are 'dataframe' v0.2.0 groups with _index and column-order
    attrs — the three attributes the anndata reader dispatches on."""
    for axis in ("obs", "var"):
        g = h5[axis]
        assert _enc(g) == ("dataframe", "0.2.0")
        index_key = g.attrs["_index"]
        index_key = (
            index_key.decode() if isinstance(index_key, bytes) else index_key
        )
        assert index_key in g
        # index is a variable-length utf-8 string dataset
        ds = g[index_key]
        assert h5py.check_string_dtype(ds.dtype) is not None
        order = [
            c.decode() if isinstance(c, bytes) else c
            for c in g.attrs["column-order"]
        ]
        for col in order:
            assert col in g, f"{axis}.{col} listed in column-order but absent"


def test_categorical_encoding(h5):
    """Categorical obs columns are 'categorical' v0.2.0 groups holding
    integer codes + string categories and an 'ordered' attr."""
    g = h5["obs/subclass_label"]
    assert isinstance(g, h5py.Group)
    assert _enc(g) == ("categorical", "0.2.0")
    assert "ordered" in g.attrs
    assert not bool(g.attrs["ordered"])
    assert g["codes"].dtype.kind in "iu"
    assert h5py.check_string_dtype(g["categories"].dtype) is not None
    # codes index into categories
    codes = g["codes"][()]
    assert codes.min() >= 0 and codes.max() < g["categories"].shape[0]


def test_string_column_encoding(h5):
    """String obs columns are 'string-array' v0.2.0 utf-8 datasets."""
    ds = h5["obs/batch"]
    assert _enc(ds) == ("string-array", "0.2.0")
    assert h5py.check_string_dtype(ds.dtype) is not None


def test_csr_obsp_encoding(h5, rich_adata):
    """Sparse obsp members are 'csr_matrix' v0.1.0 groups with the
    data/indices/indptr datasets and a 2-long integer 'shape' attr —
    exactly what anndata's sparse reader requires."""
    g = h5["obsp/spatial_connectivities"]
    assert isinstance(g, h5py.Group)
    assert _enc(g) == ("csr_matrix", "0.1.0")
    shape = np.asarray(g.attrs["shape"])
    assert shape.shape == (2,) and shape.dtype.kind == "i"
    assert tuple(shape) == (rich_adata.n_obs, rich_adata.n_obs)
    for member in ("data", "indices", "indptr"):
        assert member in g and isinstance(g[member], h5py.Dataset), member
    # CSR invariants the reader assumes
    assert g["indptr"].shape[0] == rich_adata.n_obs + 1
    assert g["indices"].dtype.kind in "iu"
    indptr = g["indptr"][()]
    assert indptr[0] == 0 and indptr[-1] == g["data"].shape[0]
    assert (np.diff(indptr) >= 0).all()


def test_uns_encodings(h5):
    """uns: nested dicts are 'dict' groups; strings / numbers / bools carry
    their scalar encodings with versions (anndata's reader refuses elements
    without an encoding-version)."""
    g = h5["uns"]
    assert _enc(g["meta"]) == ("dict", "0.1.0")
    assert _enc(g["meta/version"]) == ("string", "0.2.0")
    assert _enc(g["meta/n_epochs"]) == ("numeric-scalar", "0.2.0")
    assert _enc(g["meta/scaled"]) == ("numeric-scalar", "0.2.0")
    # list-of-genes → string-array
    assert _enc(g["training_genes"]) == ("string-array", "0.2.0")


def test_every_element_carries_encoding_attrs(h5):
    """The anndata ≥0.8 reader dispatches every element through its
    encoding-type — nothing we write may lack the pair."""
    problems = []

    def visit(name, node):
        if name.split("/")[0] not in (
            "X", "obs", "var", "uns", "obsm", "varm", "obsp", "layers"
        ):
            return
        # members of encoded containers (sparse/categorical groups) are raw
        parent = name.rsplit("/", 1)[0] if "/" in name else ""
        if parent:
            penc = h5[parent].attrs.get("encoding-type", b"")
            penc = penc.decode() if isinstance(penc, bytes) else penc
            if penc in ("csr_matrix", "csc_matrix", "categorical"):
                return
        t, v = _enc(node)
        if t is None or v is None:
            problems.append(name)

    h5.visititems(visit)
    # top-level axis containers: obsm/varm/obsp/layers are plain groups in
    # the spec (their attrs are 'dict' in anndata 0.10+, absent in 0.8) —
    # tolerate either, but every dataset/element must be encoded
    problems = [
        p for p in problems
        if p not in ("obsm", "varm", "obsp", "layers", "uns")
    ]
    assert not problems, f"elements missing encoding attrs: {problems}"


def test_roundtrip_preserves_semantics(rich_adata, tmp_path):
    """Full write→read roundtrip through the spec layout preserves values,
    dtypes-of-record, categorical levels, sparse structure and nesting."""
    path = tmp_path / "rt.h5ad"
    write_h5ad(path, rich_adata)
    back = read_h5ad(path)
    np.testing.assert_array_equal(back.X, rich_adata.X)
    assert list(back.obs.index) == list(rich_adata.obs.index)
    assert list(back.obs["subclass_label"]) == list(
        rich_adata.obs["subclass_label"]
    )
    assert isinstance(
        back.obs["subclass_label"].dtype, pd.CategoricalDtype
    )
    np.testing.assert_array_equal(
        back.obsm["spatial"], rich_adata.obsm["spatial"]
    )
    got = back.obsp["spatial_connectivities"]
    assert sp.isspmatrix_csr(got)
    np.testing.assert_array_equal(
        got.toarray(), rich_adata.obsp["spatial_connectivities"].toarray()
    )
    assert list(back.uns["training_genes"]) == list(
        rich_adata.uns["training_genes"]
    )
    assert back.uns["meta"]["version"] == "1.0"
    assert int(back.uns["meta"]["n_epochs"]) == 1000


def test_csc_matrix_encoding(tmp_path, rng):
    """CSC input keeps its format on disk ('csc_matrix' encoding) — the
    reference pipelines hand both CSR and CSC AnnDatas in."""
    X = sp.random(6, 4, density=0.5, format="csc", random_state=0)
    ad = AnnData(
        X=X.astype(np.float32),
        obs=pd.DataFrame(index=[f"c{i}" for i in range(6)]),
        var=pd.DataFrame(index=[f"g{i}" for i in range(4)]),
    )
    path = tmp_path / "csc.h5ad"
    write_h5ad(path, ad)
    with h5py.File(path, "r") as f:
        assert _enc(f["X"]) == ("csc_matrix", "0.1.0")
        assert f["X/indptr"].shape[0] == 4 + 1  # CSC: n_cols + 1
    back = read_h5ad(path)
    assert sp.isspmatrix_csc(back.X)
    np.testing.assert_allclose(back.X.toarray(), X.toarray())
