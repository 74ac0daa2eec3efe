from .mesh import (
    DP_AXIS,
    fold_in_process,
    initialize_distributed,
    leading_axis_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_leading,
)

__all__ = [
    "DP_AXIS",
    "fold_in_process",
    "initialize_distributed",
    "leading_axis_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_leading",
]
