"""Multi-device mesh and sharding helpers."""

from gymnasium_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_env_batch,
    shard_ppo_state,
)

__all__ = ["make_mesh", "shard_env_batch", "replicated", "shard_ppo_state"]
