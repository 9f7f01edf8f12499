from .mesh import (
    make_mesh,
    mapping_shardings,
    shard_mapping,
    fit_mapping_sharded,
    train_step_sharded,
)

__all__ = [
    "make_mesh",
    "mapping_shardings",
    "shard_mapping",
    "fit_mapping_sharded",
    "train_step_sharded",
]
