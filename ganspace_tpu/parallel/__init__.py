from ganspace_tpu.parallel.mesh import (
    batch_sharding,
    feature_sharding,
    get_mesh,
    pipeline_mesh,
    replicated,
    reshard_for_estimator,
    shard_batch,
)

__all__ = [
    "get_mesh",
    "pipeline_mesh",
    "reshard_for_estimator",
    "shard_batch",
    "batch_sharding",
    "feature_sharding",
    "replicated",
]
