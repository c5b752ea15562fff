from cirkit_tpu.parallel.training import (
    data_parallel_step,
    default_mesh,
    fit,
    replicate_store,
    shard_batch,
)

__all__ = [
    "data_parallel_step",
    "default_mesh",
    "fit",
    "replicate_store",
    "shard_batch",
]
