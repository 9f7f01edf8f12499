"""Spatial neighbor graphs and weight matrices.

Self-contained replacements for the reference's external graph dependencies:

* ``spatial_neighbors`` replaces ``squidpy.gr.spatial_neighbors`` (used by the
  reference at ``mapping_utils.py:95-100``): builds KNN or Delaunay spot
  graphs into ``obsp['spatial_connectivities']`` / ``obsp['spatial_distances']``.
  AnnDatas preprocessed by real squidpy work unchanged — only the ``obsp``
  matrices are consumed downstream.
* ``spatial_weights`` replaces the reference ``spatial_weights.py:5-29``
  (squidpy output + sklearn normalize + libpysal W round-trip) with direct
  scipy-sparse arithmetic producing the identical dense matrix.
* ``neighbor_graph`` produces the structured k-NN form
  (:class:`~tangram_tpu.ops.core.NeighborGraph`) so W @ X products scale past
  dense O(spots²) storage.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

from .ops.core import NeighborGraph

__all__ = ["spatial_neighbors", "spatial_weights", "neighbor_graph"]


#: a lattice neighbor sits at 1× the grid pitch; the second hex ring starts
#: at √3 ≈ 1.73× (2× for square grids) — any cutoff between leaves exactly
#: the first ring
_GRID_RING_CUTOFF = 1.3


def spatial_neighbors(
    adata_sp,
    n_neighs: int = 6,
    coord_type: Optional[str] = None,
    delaunay: bool = False,
    set_diag: bool = False,
    spatial_key: str = "spatial",
    radius=None,
    percentile: Optional[float] = None,
    n_rings: int = 1,
):
    """Compute a spot adjacency graph from ``obsm[spatial_key]`` coordinates.

    Writes ``obsp['spatial_connectivities']`` (binary CSR) and
    ``obsp['spatial_distances']`` (CSR), the two matrices the reference
    pipeline reads (``spatial_weights.py:15-16``). Parameter surface follows
    ``squidpy.gr.spatial_neighbors`` (the reference's graph builder,
    ``mapping_utils.py:95-100``).

    ``coord_type``:

    * ``"generic"`` — k-nearest-neighbor graph, euclidean distances.
      ``radius`` as a float switches to a fixed-radius graph; as an
      ``(rmin, rmax)`` pair it prunes the KNN edges to that distance
      interval. ``percentile`` (0–100) prunes KNN edges whose distance
      exceeds that percentile of all edge distances.
    * ``"grid"`` — Visium-style lattice adjacency: of the ``n_neighs``
      nearest candidates, only those within the first lattice ring are kept
      (cutoff between the measured grid pitch and the second ring at
      √3×pitch), so border/island spots keep their true lattice degree
      instead of back-filling with second-ring spots. ``n_rings`` extends
      adjacency to the n-th lattice ring; distances are the ring index
      (squidpy's grid semantics: on the uniform Visium lattice the
      standardized weights are 1/degree either way).
    * ``"delaunay"`` — Delaunay triangulation adjacency.
    * ``None`` (default) — auto-select like squidpy
      (``squidpy.gr.spatial_neighbors``, called by the reference at
      ``mapping_utils.py:100``): ``"grid"`` when the AnnData carries Visium
      library metadata in ``uns["spatial"]``, ``"generic"`` otherwise. The
      hexagonal Visium array has 6 lattice neighbors, squidpy's (and this
      function's) default ``n_neighs``.
    """
    if spatial_key not in adata_sp.obsm:
        raise ValueError(
            f"Missing spatial coordinates in `obsm[{spatial_key!r}]`."
        )
    if coord_type is None:
        uns = getattr(adata_sp, "uns", {})
        coord_type = "grid" if "spatial" in uns else "generic"
    # percentile / (rmin, rmax) radius pruning applies to euclidean edge
    # lengths, so it's valid for the generic KNN graph and for Delaunay edges
    # (squidpy documents percentile as the delaunay companion) — including
    # delaunay=True on a Visium AnnData whose coord_type auto-resolved to
    # "grid", since delaunay overrides the lattice recipe entirely
    delaunay_active = delaunay or coord_type == "delaunay"
    if percentile is not None and coord_type != "generic" and not delaunay_active:
        raise ValueError(
            "percentile is only valid with coord_type='generic' or a "
            "Delaunay graph (delaunay=True / coord_type='delaunay')."
        )
    if radius is not None and coord_type != "generic" and not delaunay_active:
        raise ValueError(
            "radius is only valid with coord_type='generic' or a "
            "Delaunay graph (delaunay=True / coord_type='delaunay')."
        )
    if n_rings > 1 and coord_type != "grid":
        raise ValueError("n_rings > 1 is only valid with coord_type='grid'.")
    coords = np.asarray(adata_sp.obsm[spatial_key], dtype=np.float64)
    n = coords.shape[0]

    if delaunay_active:
        from scipy.spatial import Delaunay

        if np.isscalar(radius) and radius is not None:
            raise ValueError(
                "a scalar radius selects a radius-neighbors graph and "
                "cannot be combined with delaunay=True; pass a (rmin, rmax) "
                "tuple to prune Delaunay edges by distance interval."
            )
        tri = Delaunay(coords)
        indptr, indices = tri.vertex_neighbor_vertices
        rows = np.repeat(np.arange(n), np.diff(indptr))
        cols = indices
        d = np.linalg.norm(coords[rows] - coords[cols], axis=1)
        # squidpy semantics: percentile (and a (rmin, rmax) radius interval)
        # prune long triangulation edges — percentile is documented there as
        # the delaunay companion, trimming the border/hull artifacts
        if radius is not None:
            rmin, rmax = radius
            keep = (d >= float(rmin)) & (d <= float(rmax))
            rows, cols, d = rows[keep], cols[keep], d[keep]
        if percentile is not None and len(d):
            keep = d <= np.percentile(d, percentile)
            rows, cols, d = rows[keep], cols[keep], d[keep]
    elif np.isscalar(radius):
        # fixed-radius graph (squidpy: radius as a single float)
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(radius=float(radius)).fit(coords)
        dist, idx = nn.radius_neighbors(coords)
        counts = np.asarray([len(ix) for ix in idx])
        rows = np.repeat(np.arange(n), counts)
        cols = np.concatenate(idx) if len(idx) else np.zeros(0, np.int64)
        d = np.concatenate(dist) if len(dist) else np.zeros(0)
        keep = rows != cols  # drop self-edges
        rows, cols, d = rows[keep], cols[keep], d[keep]
    else:
        from sklearn.neighbors import NearestNeighbors

        k = min(n_neighs + 1, n)
        nn = NearestNeighbors(n_neighbors=k).fit(coords)
        dist, idx = nn.kneighbors(coords)
        # Drop each point's self-edge by identity, not position: with
        # duplicated coordinates sklearn may order a tied zero-distance
        # neighbor before the point itself, and dropping column 0 would then
        # keep a self-loop while losing a real neighbor.
        is_self = idx == np.arange(n)[:, None]
        missing_self = ~is_self.any(axis=1)
        # rows whose self entry got crowded out by >k zero-distance
        # duplicates: drop one tied zero-distance column instead
        is_self[missing_self, 0] = True
        rows = np.repeat(np.arange(n), k - 1)
        cols = idx[~is_self]
        d = np.linalg.norm(coords[rows] - coords[cols], axis=1)

        if coord_type == "grid" and len(d):
            # lattice pitch = the typical nearest-neighbor distance (median
            # over spots is robust to isolated spots and detached tissue
            # fragments); keep only first-ring edges
            nearest = d.reshape(n, k - 1)[:, 0]
            pitch = float(np.median(nearest))
            keep = d <= pitch * _GRID_RING_CUTOFF
            rows, cols = rows[keep], cols[keep]
            d = np.ones(keep.sum(), dtype=np.float64)  # ring index
        elif radius is not None:
            # (rmin, rmax) interval pruning of the KNN edges (squidpy:
            # radius as a tuple)
            rmin, rmax = radius
            keep = (d >= float(rmin)) & (d <= float(rmax))
            rows, cols, d = rows[keep], cols[keep], d[keep]
        elif percentile is not None:
            keep = d <= np.percentile(d, percentile)
            rows, cols, d = rows[keep], cols[keep], d[keep]

    conn = sp.csr_matrix((np.ones_like(d, dtype=np.float64), (rows, cols)), shape=(n, n))
    dists = sp.csr_matrix((d, (rows, cols)), shape=(n, n))
    conn.sum_duplicates()
    dists.sum_duplicates()
    conn.data[:] = 1.0

    if coord_type == "grid" and n_rings > 1:
        # BFS by boolean matrix powers of the 1-ring adjacency: ring r =
        # spots first reachable in r hops; distance entries = ring index
        # (squidpy grid semantics for n_rings)
        one_ring = conn.copy()
        seen = (conn + sp.eye(n, format="csr")).sign().tocsr()
        dists = conn.copy()
        frontier = conn
        for r in range(2, n_rings + 1):
            reach = (frontier @ one_ring).sign().tocsr()
            new = (reach - reach.multiply(seen)).tocsr()
            new.eliminate_zeros()
            if new.nnz == 0:
                break
            conn = (conn + new).sign().tocsr()
            dists = (dists + new * r).tocsr()
            seen = (seen + new).sign().tocsr()
            frontier = new

    if set_diag:
        conn = conn + sp.eye(n, format="csr")

    adata_sp.obsp["spatial_connectivities"] = conn
    adata_sp.obsp["spatial_distances"] = dists
    return adata_sp


def _require_graph(adata_sp):
    if not {"spatial_connectivities", "spatial_distances"}.issubset(
        set(adata_sp.obsp.keys())
    ):
        raise ValueError(
            "Missing spatial neighborhood parameters. Run `pp_adatas()` with "
            "the spatial information stored in `spatial` in `adata_sp.obsm`."
        )


def spatial_weights(adata_sp, standardized: bool, self_inclusion: bool) -> np.ndarray:
    """Dense spot×spot weight matrix; numerically identical to the reference
    ``spatial_weights.py:5-29``.

    standardized=True: row-L1-normalized distances masked to the connectivity
    pattern. standardized=False: binary connectivities. ``self_inclusion``
    adds the identity *after* normalization (reference quirk preserved:
    standardized+self-inclusion rows sum to 2).

    Variants used by the pipeline (``mapping_utils.py:319-329``):
    (True, True) neighborhood-g1 · (False, False) ct-islands ·
    (True, False) Moran/Geary · (False, True) Getis-Ord.
    """
    W = sparse_weights(adata_sp, standardized).toarray()
    if self_inclusion:
        # in-place diagonal add — np.eye would materialize a second dense
        # (spots × spots) f64 array just to add 1s
        W[np.diag_indices_from(W)] += 1.0
    return W


def neighbor_graph(
    adata_sp,
    standardized: bool,
    self_inclusion: bool,
    max_neighbors: Optional[int] = None,
) -> NeighborGraph:
    """Structured (s, k) form of :func:`spatial_weights` for atlas scale.

    Produces identical W @ X products without materializing the dense s×s
    matrix (SURVEY §2.3 "spot parallelism": the scaling dimension of Tangram
    is spots, not layers).

    ``max_neighbors`` caps the padded row width ``k``. When the cap actually
    truncates a row, the row keeps its ``k`` largest-``|weight|`` edges (the
    self edge, when ``self_inclusion``, always keeps its slot) and a warning
    reports how many edges were dropped — the W @ X product is then an
    approximation of the dense one.
    """
    import jax.numpy as jnp

    _require_graph(adata_sp)
    W = sparse_weights(adata_sp, standardized)
    n = W.shape[0]

    nnz = np.diff(W.indptr)
    rows = np.repeat(np.arange(n), nnz)
    k = (int(nnz.max()) if n else 0) + (1 if self_inclusion else 0)
    data, cols = W.data, W.indices
    if max_neighbors is not None and k > int(max_neighbors):
        k = int(max_neighbors)
        k_edges = k - 1 if self_inclusion else k
        if k_edges <= 0:
            raise ValueError(
                "max_neighbors leaves no room for graph edges"
                + (" beside the self edge" if self_inclusion else "")
            )
        # reorder each row's entries by descending |weight| so truncation
        # keeps the heaviest edges, not whatever came last in CSR order
        order = np.lexsort((-np.abs(W.data), rows))
        data, cols = W.data[order], W.indices[order]
        dropped = int(np.maximum(nnz - k_edges, 0).sum())
        if dropped:
            import warnings

            warnings.warn(
                f"max_neighbors={max_neighbors} drops {dropped} graph "
                f"edge(s) (keeping each row's {k_edges} largest-|weight| "
                "ones); W @ X products are approximate. Raise max_neighbors "
                "for exact parity with spatial_weights().",
                stacklevel=2,
            )
    k_edges = k - 1 if self_inclusion else k

    # CSR → padded (s, k) in one scatter: each stored entry goes to
    # (its row, its within-row position); entries past k_edges are dropped.
    indices = np.zeros((n, k), dtype=np.int32)
    weights = np.zeros((n, k), dtype=np.float32)
    slots = np.arange(W.nnz) - np.repeat(W.indptr[:-1], nnz)
    keep = slots < k_edges
    indices[rows[keep], slots[keep]] = cols[keep]
    weights[rows[keep], slots[keep]] = data[keep]
    if self_inclusion:
        # self-edge appended after each row's kept entries (slot reserved
        # by k_edges = k - 1, so it survives truncation too)
        kept = np.minimum(nnz, k_edges)
        indices[np.arange(n), kept] = np.arange(n)
        weights[np.arange(n), kept] = 1.0
    from .ops.core import transpose_arrays

    t_idx, t_w = transpose_arrays(indices, weights)
    return NeighborGraph(
        jnp.asarray(indices), jnp.asarray(weights),
        jnp.asarray(t_idx), jnp.asarray(t_w),
    )


def sparse_weights(adata_sp, standardized: bool) -> sp.csr_matrix:
    """The spot-graph weight matrix in scipy CSR form — O(nnz) memory, the
    shared core of :func:`spatial_weights` (dense), :func:`neighbor_graph`
    (padded structure-of-arrays) and the Moran SVG statistics."""
    _require_graph(adata_sp)
    conn = sp.csr_matrix(adata_sp.obsp["spatial_connectivities"], dtype=np.float64)
    if not standardized:
        return conn.sign().tocsr()
    dists = sp.csr_matrix(adata_sp.obsp["spatial_distances"], dtype=np.float64)
    row_sums = np.asarray(np.abs(dists).sum(axis=1)).ravel()
    scale = np.divide(1.0, row_sums, out=np.zeros_like(row_sums), where=row_sums != 0)
    return (sp.diags(scale) @ dists).multiply(conn.sign()).tocsr()
