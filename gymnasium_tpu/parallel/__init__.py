"""Multi-device mesh and sharding helpers."""

from gymnasium_tpu.parallel.mesh import (
    gather_trajectory,
    make_mesh,
    make_mesh_two_level,
    replicated,
    scaling_report,
    shard_env_batch,
    shard_ppo_state,
)

__all__ = [
    "make_mesh",
    "make_mesh_two_level",
    "shard_env_batch",
    "replicated",
    "shard_ppo_state",
    "gather_trajectory",
    "scaling_report",
]
