from .mesh import (
    DP_AXIS,
    fold_in_process,
    global_from_local_leading,
    to_global_replicated,
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
    "global_from_local_leading",
    "to_global_replicated",
    "initialize_distributed",
    "leading_axis_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_leading",
]
