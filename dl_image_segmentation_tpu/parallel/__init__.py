"""Device-mesh parallelism helpers (pjit/GSPMD)."""

from .sharding import (make_mesh, batch_sharding, replicated_sharding,
                       param_shardings, shard_batch_local)
from .distributed import initialize, is_primary

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "param_shardings", "shard_batch_local",
           "initialize", "is_primary"]
