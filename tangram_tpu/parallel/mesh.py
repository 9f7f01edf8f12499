"""Multi-chip scale-out: shard the mapping problem over a device mesh.

The reference is strictly single-device (SURVEY §2.3: no torch.distributed,
no collectives anywhere; its own README punts at scale — "split your spatial
data into parts"). The TPU-native replacement is GSPMD: lay the mapping
matrix M (cells × spots) out over a 2-D ``("cell", "spot")`` mesh, annotate
input shardings, and let XLA insert the collectives:

* softmax over the spot axis  → all-reduce of per-cell max/sum over "spot"
* Y = Pᵀ S (projection)       → psum of partial products over "cell"
* q = w P (spot marginal)     → psum over "cell"
* per-gene cosine reductions  → psum over "spot"

All of these ride ICI; nothing crosses DCN for a single mapping problem.
Memory per chip drops from O(c·s) (which at 100k×50k fp32 is 20 GB for M
alone, plus 2× for Adam state — impossible on one chip) to O(c·s / n_devices).

The other scaling axis is *population* parallelism: CV folds, tuner repeats
and hyperparameter sweeps are vmapped and sharded over a "fold" mesh axis —
Tangram's natural data parallelism (SURVEY §2.3).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.mapper import fit_mapping
from ..ops.losses import MapperData

__all__ = [
    "make_mesh",
    "mapping_shardings",
    "shard_mapping",
    "fit_mapping_sharded",
    "train_step_sharded",
    "init_distributed",
]


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX multi-host runtime (the reference has no multi-node
    support at all; Ray only distributes independent tuner trials).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters. Safe to call once per process
    before any jax operation.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def _factor_2d(n: int) -> tuple[int, int]:
    """Split n devices into the most-square (cell, spot) grid."""
    best = (n, 1)
    for a in range(1, int(math.isqrt(n)) + 1):
        if n % a == 0:
            best = (n // a, a)
    return best


def make_mesh(
    n_cell_shards: Optional[int] = None,
    n_spot_shards: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Create a 2-D ``("cell", "spot")`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_cell_shards is None and n_spot_shards is None:
        n_cell_shards, n_spot_shards = _factor_2d(n)
    elif n_cell_shards is None:
        n_cell_shards = n // n_spot_shards
    elif n_spot_shards is None:
        n_spot_shards = n // n_cell_shards
    needed = n_cell_shards * n_spot_shards
    if needed > n:
        raise ValueError(
            f"mesh {n_cell_shards}×{n_spot_shards} needs {needed} devices, "
            f"only {n} available"
        )
    dev_grid = np.asarray(devices[:needed]).reshape(n_cell_shards, n_spot_shards)
    return Mesh(dev_grid, axis_names=("cell", "spot"))


def mapping_shardings(mesh: Mesh):
    """NamedShardings for (M, MapperData): M 2-D sharded, S by cells,
    G/d/weights by spots, small gene-axis tensors replicated.

    Axis names absent from ``mesh`` degrade to replication, so a 1-D
    ``("cell",)`` or ``("spot",)`` mesh (or any custom-named mesh) works —
    only the matching dimensions are partitioned."""

    def ns(*spec):
        spec = tuple(
            s if (s is None or s in mesh.axis_names) else None for s in spec
        )
        return NamedSharding(mesh, P(*spec))

    m_sharding = ns("cell", "spot")
    data_sharding = MapperData(
        S=ns("cell", None),
        G=ns("spot", None),
        gene_mask=ns(None),
        d=ns("spot"),
        d_source=ns("cell"),
        voxel_weights=ns("spot", None),
        neighborhood_filter=ns("spot", None),
        ct_encode=ns("cell", None),
        spatial_weights=ns("spot", None),
        getis_ord_ref=ns("spot", None),
        moran_ref=ns("spot", None),
        geary_ref=ns(None),
        target_count=ns(),
    )
    return m_sharding, data_sharding


def _put(x, sharding):
    if x is None:
        return None
    return jax.device_put(x, sharding)


def shard_mapping(params, data: MapperData, mesh: Mesh):
    """Place the parameters and every populated MapperData leaf onto the mesh.

    ``params`` is M (unconstrained) or ``(M, F)`` (constrained); M is 2-D
    sharded, the per-cell filter F rides the "cell" axis."""
    m_sharding, data_sharding = mapping_shardings(mesh)
    f_axis = "cell" if "cell" in mesh.axis_names else None
    if isinstance(params, tuple):
        M, F = params
        params = (_put(M, m_sharding), _put(F, NamedSharding(mesh, P(f_axis))))
    else:
        params = _put(params, m_sharding)
    data = MapperData(
        *(
            _put(value, sharding)
            for value, sharding in zip(tuple(data), tuple(data_sharding))
        )
    )
    return params, data


def fit_mapping_sharded(
    params,
    data: MapperData,
    lw,
    num_epochs: int,
    learning_rate: float,
    mesh: Optional[Mesh] = None,
    **kwargs,
):
    """Run :func:`fit_mapping` with inputs sharded over ``mesh``.

    GSPMD propagates the input shardings through the whole scan — M (and its
    Adam moments) stay 2-D sharded, and XLA emits psums over the "cell" axis
    for the projection and over the "spot" axis for the softmax/cosine
    reductions. Pass ``params=(M, F)`` with ``constrained=True`` for the
    constrained mapper (F sharded over "cell").
    """
    if mesh is None:
        mesh = make_mesh()
    # GSPMD cannot partition a pallas_call: force the XLA core so the whole
    # scan stays partitionable (the fused-kernel mesh path lives in
    # fused_sharded.py behind shard_map instead).
    kwargs.setdefault("impl", "xla")
    params, data = shard_mapping(params, data, mesh)
    return fit_mapping(params, data, lw, num_epochs, learning_rate, **kwargs)


def train_step_sharded(M, data: MapperData, lw, learning_rate: float, mesh: Mesh):
    """One sharded Adam step (for harness dry-runs and step benchmarks)."""
    return fit_mapping_sharded(M, data, lw, 1, learning_rate, mesh=mesh)
