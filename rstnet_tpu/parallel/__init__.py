"""Parallelism: one device mesh + sharding rules instead of FSDP/DDP wrappers."""

from rstnet_tpu.parallel.mesh import make_mesh
from rstnet_tpu.parallel.sharding import (
    batch_sharding,
    infer_param_shardings,
    shard_params,
)

__all__ = ["make_mesh", "infer_param_shardings", "batch_sharding", "shard_params"]
