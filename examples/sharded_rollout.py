"""Env batch sharded across a device mesh — the TPU-native replacement for
the reference's process-per-env AsyncVectorEnv (SURVEY.md §5.8).

Run on CPU with 8 virtual devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/sharded_rollout.py
"""

import os

if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit platform request even where a TPU plugin overrides
    # the env var for the default backend (e.g. JAX_PLATFORMS=cpu runs)
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax

from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
from gymnasium_tpu.parallel import make_mesh, shard_env_batch
from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv


def main():
    devices = jax.devices()
    if len(devices) < 2:
        devices = jax.devices("cpu")
    mesh = make_mesh(devices)
    print(f"mesh: {mesh}")

    num_envs = 64 * len(devices)
    env = JaxVectorEnv(
        CartPoleFunctional(), num_envs=num_envs, max_episode_steps=500, seed=0
    )
    env.reset()
    # place the env-state pytree across the data-parallel axis; the compiled
    # scan then runs SPMD with no collectives on the hot path
    env.carry = shard_env_batch(env.carry, mesh)

    carry, traj = env.rollout(256)
    jax.block_until_ready(traj)
    print("per-device obs shards:", traj.obs.sharding)
    print(f"rolled out {num_envs}x256 steps across {len(devices)} devices")


if __name__ == "__main__":
    main()
