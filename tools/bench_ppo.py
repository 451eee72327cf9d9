"""End-to-end PPO training throughput (env-steps consumed per second).

One train step = rollout_steps × num_envs env steps PLUS GAE and
update_epochs × num_minibatches clipped-surrogate updates, all inside one
jitted program — this measures the whole production loop, not bare env
stepping. Timing uses the difference-quotient methodology from
docs/BENCHMARKS.md (the tunnel's block_until_ready cannot be trusted).
"""

from __future__ import annotations

import statistics
import time


def bench(func_env_name: str, make_env, config, wrappers=()):
    import jax
    import jax.numpy as jnp

    from gymnasium_tpu.train.ppo import init_ppo, make_train_step

    func_env = make_env()
    state, env_params, tx = init_ppo(
        func_env, config, jax.random.PRNGKey(0), wrappers=wrappers
    )
    step = jax.jit(make_train_step(func_env, config, env_params, tx, wrappers=wrappers))

    @jax.jit
    def reduce_metrics(metrics):
        return metrics["loss"] + metrics["reward_per_step"]

    state, metrics = step(state)
    float(reduce_metrics(metrics))  # warmup + compile

    def timed(repeats):
        nonlocal state
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            s = state
            for _ in range(repeats):
                s, metrics = step(s)
            float(reduce_metrics(metrics))
            times.append(time.perf_counter() - t0)
            state = s
        return statistics.median(sorted(times[1:]))

    t1, t4 = timed(1), timed(4)
    steps_per_update = config.num_envs * config.rollout_steps
    rate = 3 * steps_per_update / max(t4 - t1, 1e-9)
    print(
        f"| {func_env_name} | {config.num_envs} | {config.rollout_steps} | "
        f"{rate / 1e6:.2f} M env-steps/s through PPO |",
        flush=True,
    )


def main():
    import jax

    from gymnasium_tpu.envs.mujoco.half_cheetah import HalfCheetahFunctional
    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.train.ppo import PPOConfig
    from gymnasium_tpu.wrappers.func import NormalizeObservation, NormalizeReward

    print(f"backend: {jax.default_backend()}")
    print("| env | N | rollout | PPO throughput |")
    print("|---|---|---|---|")
    bench(
        "CartPole",
        CartPoleFunctional,
        PPOConfig(num_envs=4096, rollout_steps=64, hidden_sizes=(128, 128)),
    )
    bench(
        "HalfCheetah (+normalize wrappers)",
        HalfCheetahFunctional,
        PPOConfig(
            num_envs=4096,
            rollout_steps=64,
            hidden_sizes=(256, 256),
            max_episode_steps=1000,
        ),
        wrappers=(NormalizeObservation(), NormalizeReward()),
    )


if __name__ == "__main__":
    main()
