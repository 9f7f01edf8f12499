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
    Y = jnp.einsum("cs,ck->sk", P, A, preferred_element_type=jnp.float32)
    q = w @ P
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
    (s, k) neighbor indices + weights and implement W @ X as a gather +
    weighted sum, which XLA maps to efficient dynamic-gathers on TPU.
    """

    indices: jnp.ndarray  # (s, k) int32, padded entries point at row 0
    weights: jnp.ndarray  # (s, k) float32, padded entries have weight 0

    @property
    def n_spots(self) -> int:
        return self.indices.shape[0]

    def matmul(self, X):
        return graph_matmul(self, X)

    def row_sums(self):
        return jnp.sum(self.weights, axis=1)

    def col_sums(self):
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


def graph_matmul(W, X):
    """Compute W @ X where W is a dense matrix or a :class:`NeighborGraph`."""
    if isinstance(W, NeighborGraph):
        gathered = X[W.indices]  # (s, k, g)
        return jnp.einsum("skg,sk->sg", gathered, W.weights)
    return W @ X


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
    return NeighborGraph(jnp.asarray(indices), jnp.asarray(weights))
