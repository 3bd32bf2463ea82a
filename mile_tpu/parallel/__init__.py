"""Device-mesh parallelism helpers."""
from mile_tpu.parallel.mesh import (  # noqa: F401
    chain_axis_sharding,
    chain_mesh,
    replicated_sharding,
    shard_chains,
)
