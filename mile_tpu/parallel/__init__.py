"""Device-mesh parallelism helpers."""
from mile_tpu.parallel.mesh import (  # noqa: F401
    chain_axis_sharding,
    chain_data_mesh,
    chain_mesh,
    data_axis_sharding,
    replicated_sharding,
    shard_chains,
    shard_data,
)
