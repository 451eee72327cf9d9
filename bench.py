"""Headline benchmark: CartPole-v1 throughput, 4096 vectorized envs,
random policy, on whatever accelerator JAX finds (TPU in CI).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured steps/s divided by the 50M steps/s/chip north-star
target (BASELINE.md).
"""

from __future__ import annotations

import json
import time

NUM_ENVS = 4096
STEPS_PER_BLOCK = 1024
WARMUP_BLOCKS = 2
MEASURE_BLOCKS = 8
BASELINE_STEPS_PER_S = 50e6


def main() -> None:
    import jax

    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    env = JaxVectorEnv(CartPoleFunctional(), num_envs=NUM_ENVS, max_episode_steps=500, seed=0)
    env.reset()

    # Warm up: trigger compilation of the scanned rollout.
    for _ in range(WARMUP_BLOCKS):
        carry, traj = env.rollout(STEPS_PER_BLOCK)
    jax.block_until_ready(carry)

    start = time.perf_counter()
    total_reward = 0.0
    for _ in range(MEASURE_BLOCKS):
        carry, traj = env.rollout(STEPS_PER_BLOCK)
    jax.block_until_ready(carry)
    elapsed = time.perf_counter() - start

    steps = NUM_ENVS * STEPS_PER_BLOCK * MEASURE_BLOCKS
    steps_per_s = steps / elapsed

    print(
        json.dumps(
            {
                "metric": "cartpole_v1_env_steps_per_s_4096envs_random_policy",
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
