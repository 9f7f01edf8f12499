"""The fused numeric core of the mapping optimizer.

Every Tangram loss mode reduces to one primitive::

    mapper_core(M, A, w) -> (Y, q, h)

      P = softmax(M, axis=1)        # rows over spots  (c × s)
      Y = P.T @ A                   # projected expression (s × k)
      q = w @ P                     # weighted spot marginal (s,)
      h = sum_s P * log(P)          # per-cell negative entropy (c,)

With the right choice of ``A`` and ``w`` this covers:

* cells mode       : A = S_train,            w = 1/n_cells
  (reference ``mapping_optimizer.py:201-217``)
* clusters mode    : A = S_train,            w = d_source
  (reference ``mapping_optimizer.py:215``)
* constrained mode : A = S * sigmoid(F)[:,None], w = sigmoid(F)
  (reference ``mapping_optimizer.py:506-521``)
* cell-type islands: ct columns appended to A (ct_map = P.T @ ct_encode,
  reference ``mapping_optimizer.py:243``)

The ``xla`` implementation materializes P and lets XLA autodiff it — fine for
moderate sizes. The ``pallas`` implementation (see ``pallas_core.py``) never
stores P or dP in HBM: forward recomputes exp(M - m)/l from per-cell softmax
stats, backward folds the softmax VJP into a single streamed pass. That is what
makes atlas-scale problems (c·s buffers of tens of GB) fit on a chip.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["mapper_core", "NeighborGraph", "graph_matmul"]


def _mapper_core_xla(M, A, w):
    P = jax.nn.softmax(M, axis=1)
    # precision pinned to full f32: TPU XLA truncates dot INPUTS to bf16 at
    # default precision (preferred_element_type only sets the accumulator),
    # which systematically degrades training through this core — measured
    # −0.08 held-out LOO score on the NB fixture vs the f32 torch reference
    Y = jnp.einsum("cs,ck->sk", P, A, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    q = jnp.einsum("c,cs->s", w, P, precision=jax.lax.Precision.HIGHEST)
    # log-softmax form avoids log(P) underflow for very negative logits
    logP = jax.nn.log_softmax(M, axis=1)
    h = jnp.sum(P * logP, axis=1)
    return Y, q, h


def resolve_impl(impl: str, m_shape) -> str:
    """'auto' picks the Pallas kernels on TPU for problems large enough that
    HBM traffic dominates; XLA otherwise (small problems and CPU tests)."""
    if impl != "auto":
        return impl
    use_pallas = (
        jax.default_backend() == "tpu"
        and m_shape[0] * m_shape[1] >= (8192 * 8192)
    )
    return "pallas" if use_pallas else "xla"


def mapper_core(M, A, w, impl: str = "auto"):
    """Fused softmax → projection → marginals → entropy.

    Args:
        M: (n_cells, n_spots) mapping logits.
        A: (n_cells, k) matrix projected through the soft assignment.
        w: (n_cells,) weights for the spot marginal.
        impl: 'xla' | 'pallas' | 'auto'. 'auto' selects the Pallas kernel on
            TPU for large problems, XLA otherwise.

    Returns:
        (Y, q, h): (n_spots, k) projection, (n_spots,) marginal,
        (n_cells,) per-cell sum of P*log(P).
    """
    impl = resolve_impl(impl, M.shape)
    if impl == "pallas":
        from .pallas_core import mapper_core_pallas

        return mapper_core_pallas(M, A, w)
    return _mapper_core_xla(M, A, w)


class NeighborGraph(NamedTuple):
    """A k-nearest-neighbor spot graph in structure-of-arrays form.

    Dense spot×spot weight matrices (reference ``spatial_weights.py:24-28``)
    cost O(s²) memory — 10 GB at 50k spots. Spatial graphs from
    KNN/Delaunay/Visium grids have ~6 neighbors per spot, so we store
    (s, k) neighbor indices + weights and implement W @ X as k gathered
    weighted accumulations (faster on TPU than the (s, k, g) gather+einsum).

    ``t_indices``/``t_weights`` optionally hold the TRANSPOSE graph in the
    same form: when present, W @ X uses a custom VJP whose backward is the
    gather-based ``Wᵀ @ cotangent`` instead of XLA's scatter-add transpose —
    measured ~2× faster on the training path. The graph arrays themselves
    are treated as constants (their cotangent is zero); every builder in
    this package populates the transpose automatically.
    """

    indices: jnp.ndarray  # (s, k) int32, padded entries point at row 0
    weights: jnp.ndarray  # (s, k) float32, padded entries have weight 0
    t_indices: Optional[jnp.ndarray] = None  # (s, k_t) transpose adjacency
    t_weights: Optional[jnp.ndarray] = None

    @property
    def n_spots(self) -> int:
        return self.indices.shape[0]

    def matmul(self, X):
        return graph_matmul(self, X)

    def row_sums(self):
        return jnp.sum(self.weights, axis=1)

    def col_sums(self):
        if self.t_weights is not None:
            return jnp.sum(self.t_weights, axis=1)
        flat_idx = self.indices.reshape(-1)
        flat_w = self.weights.reshape(-1)
        return jnp.zeros(self.n_spots, self.weights.dtype).at[flat_idx].add(flat_w)

    def to_dense(self):
        s = self.n_spots
        W = jnp.zeros((s, s), self.weights.dtype)
        rows = jnp.broadcast_to(
            jnp.arange(s)[:, None], self.indices.shape
        ).reshape(-1)
        return W.at[rows, self.indices.reshape(-1)].add(self.weights.reshape(-1))


_UNROLL_MAX_K = 16


def _apply_graph(indices, weights, X):
    """Σ_k w[:, k] ⊙ X[idx[:, k]] — k row-gathers with fused accumulation
    for small k; the (s, k, g) gather+einsum for wide graphs."""
    k = indices.shape[1]
    if k == 0:
        return jnp.zeros((indices.shape[0], X.shape[1]), X.dtype)
    if k > _UNROLL_MAX_K:
        return jnp.einsum("skg,sk->sg", X[indices], weights,
                          precision=jax.lax.Precision.HIGHEST)
    out = weights[:, 0:1] * X[indices[:, 0]]
    for j in range(1, k):
        out = out + weights[:, j : j + 1] * X[indices[:, j]]
    return out


@jax.custom_vjp
def _graph_mm_nt(X, indices, weights, t_indices, t_weights):
    """W @ X with the transpose-graph backward (both directions are pure
    gathers; no scatter-add anywhere in the autodiff graph). The graph
    arrays are data, not parameters: their cotangents are symbolic zeros."""
    return _apply_graph(indices, weights, X)


def _graph_mm_nt_fwd(X, indices, weights, t_indices, t_weights):
    out = _apply_graph(indices, weights, X)
    return out, (indices.shape, weights, t_indices, t_weights)


def _graph_mm_nt_bwd(res, ct):
    import numpy as np

    from jax import dtypes

    idx_shape, weights, t_indices, t_weights = res
    dX = _apply_graph(t_indices, t_weights, ct)
    return (
        dX,
        np.zeros(idx_shape, dtype=dtypes.float0),
        jnp.zeros_like(weights),
        np.zeros(t_indices.shape, dtype=dtypes.float0),
        jnp.zeros_like(t_weights),
    )


_graph_mm_nt.defvjp(_graph_mm_nt_fwd, _graph_mm_nt_bwd)


def graph_matmul(W, X):
    """Compute W @ X where W is a dense matrix or a :class:`NeighborGraph`."""
    if isinstance(W, NeighborGraph):
        if W.t_indices is not None:
            return _graph_mm_nt(X, W.indices, W.weights, W.t_indices, W.t_weights)
        return _apply_graph(W.indices, W.weights, X)
    if isinstance(W, jnp.ndarray) or isinstance(X, jnp.ndarray):
        # full-f32 inputs (TPU XLA truncates dot inputs to bf16 by default)
        return jnp.matmul(W, X, precision=jax.lax.Precision.HIGHEST)
    return W @ X


def _padded_from_coo(rows, cols, vals, n_rows: int):
    """(rows, cols, vals) COO triplets → padded (n_rows, k) arrays, entries
    in stable row order (host-side, one vectorized scatter)."""
    import numpy as np

    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=n_rows)
    k = int(counts.max()) if len(rows) else 0
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slots = np.arange(len(rows)) - starts[rows]
    indices = np.zeros((n_rows, k), dtype=np.int32)
    weights = np.zeros((n_rows, k), dtype=np.float32)
    indices[rows, slots] = cols
    weights[rows, slots] = vals
    return indices, weights


def transpose_arrays(indices, weights):
    """Padded (s, k_t) form of the transpose adjacency (host-side)."""
    import numpy as np

    indices = np.asarray(indices)
    weights = np.asarray(weights)
    s, k = indices.shape
    rows = np.repeat(np.arange(s), k)
    cols = indices.reshape(-1)
    vals = weights.reshape(-1)
    keep = vals != 0  # padded entries carry weight 0
    # transpose: every (i → j, w) edge becomes (j → i, w)
    return _padded_from_coo(cols[keep], rows[keep], vals[keep], s)


def neighbor_graph_from_dense(W, k: Optional[int] = None) -> NeighborGraph:
    """Convert a dense (s, s) weight matrix into a NeighborGraph (host-side,
    one vectorized scatter — no per-row Python loop)."""
    import numpy as np

    W = np.asarray(W)
    s = W.shape[0]
    rows, cols = np.nonzero(W)
    nnz_per_row = np.bincount(rows, minlength=s)
    if k is None:
        k = int(nnz_per_row.max()) if s and len(rows) else 0
    row_starts = np.concatenate([[0], np.cumsum(nnz_per_row)[:-1]])
    slots = np.arange(len(rows)) - row_starts[rows]
    keep = slots < k
    indices = np.zeros((s, k), dtype=np.int32)
    weights = np.zeros((s, k), dtype=np.float32)
    indices[rows[keep], slots[keep]] = cols[keep]
    weights[rows[keep], slots[keep]] = W[rows[keep], cols[keep]]
    t_idx, t_w = transpose_arrays(indices, weights)
    return NeighborGraph(
        jnp.asarray(indices), jnp.asarray(weights),
        jnp.asarray(t_idx), jnp.asarray(t_w),
    )
