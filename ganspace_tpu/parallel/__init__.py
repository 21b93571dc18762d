from ganspace_tpu.parallel.mesh import (
    batch_sharding,
    feature_sharding,
    get_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "get_mesh",
    "shard_batch",
    "batch_sharding",
    "feature_sharding",
    "replicated",
]
