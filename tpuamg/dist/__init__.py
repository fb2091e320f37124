from .sharding import (device_mesh, init_multihost, shard_ell,
                       shard_vector, shard_preconditioner, replicate)
from .solve import distributed_solve, distributed_pcg_step

__all__ = ["device_mesh", "init_multihost", "shard_ell",
           "shard_vector",
           "shard_preconditioner", "replicate", "distributed_solve",
           "distributed_pcg_step"]
