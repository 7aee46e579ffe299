from gpzoo_tpu.parallel.mesh import create_mesh, data_parallel_mesh
from gpzoo_tpu.parallel.sharding import (
    replicate,
    shard_columns,
    make_sharded_batched_train_step,
)

__all__ = [
    "create_mesh",
    "data_parallel_mesh",
    "replicate",
    "shard_columns",
    "make_sharded_batched_train_step",
]
