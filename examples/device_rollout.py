"""TPU-native path: the whole env batch lives on device; `rollout` runs an
entire trajectory as one compiled scan (one dispatch, zero host round-trips)."""

import os

if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit platform request even where a TPU plugin overrides
    # the env var for the default backend (e.g. JAX_PLATFORMS=cpu runs)
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import time

import jax

from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv


def main():
    num_envs, steps = 4096, 1024
    env = JaxVectorEnv(
        CartPoleFunctional(), num_envs=num_envs, max_episode_steps=500, seed=0
    )
    env.reset()

    carry, traj = env.rollout(steps)  # compile
    jax.block_until_ready(traj)

    start = time.perf_counter()
    # continue from the previous carry: fresh inputs give honest timing
    carry, traj = env.rollout(steps, carry=carry)
    jax.block_until_ready(traj)
    elapsed = time.perf_counter() - start

    print(f"obs trajectory: {traj.obs.shape} {traj.obs.dtype}")
    print(f"{num_envs * steps / elapsed / 1e6:.1f} M env-steps/s")
    print(f"mean reward: {float(traj.reward.mean()):.4f}")


if __name__ == "__main__":
    main()
