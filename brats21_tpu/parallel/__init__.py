"""Device mesh, sharding specs, and multi-chip execution paths."""

from .mesh import (batch_sharding, local_mesh, make_mesh, replicated,
                   shard_batch)

__all__ = ["make_mesh", "local_mesh", "batch_sharding", "replicated",
           "shard_batch"]
