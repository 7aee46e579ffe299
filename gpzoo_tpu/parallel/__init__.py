from gpzoo_tpu.parallel.mesh import (
    create_mesh,
    data_parallel_mesh,
    hybrid_mesh,
    initialize_distributed,
)
from gpzoo_tpu.parallel.sharding import (
    put_sharded,
    replicate,
    shard_columns,
    factor_shardings,
    shard_factor_params,
    make_sharded_batched_train_step,
)

__all__ = [
    "create_mesh",
    "data_parallel_mesh",
    "hybrid_mesh",
    "initialize_distributed",
    "put_sharded",
    "replicate",
    "shard_columns",
    "factor_shardings",
    "shard_factor_params",
    "make_sharded_batched_train_step",
]
