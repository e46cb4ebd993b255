from legged_gym_tpu.parallel.sharding import (env_mesh, init_multihost,
                                              shard_batch,
                                              shard_env_state,
                                              replicate)

__all__ = ["env_mesh", "init_multihost", "shard_batch",
           "shard_env_state", "replicate"]
