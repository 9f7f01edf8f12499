from .mesh import (
    init_distributed,
    make_mesh,
    mapping_shardings,
    shard_mapping,
    fit_mapping_sharded,
    train_step_sharded,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "mapping_shardings",
    "shard_mapping",
    "fit_mapping_sharded",
    "train_step_sharded",
]

from .fused_sharded import fit_mapping_fused_sharded  # noqa: E402

__all__.append("fit_mapping_fused_sharded")
