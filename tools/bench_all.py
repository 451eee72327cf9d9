"""Measure device throughput for every env family; prints a markdown table.

Methodology (docs/BENCHMARKS.md): full-trajectory rollouts via
``JaxVectorEnv.rollout`` inside one jit, blocking on every output, median of
trials, inputs advanced between dispatches so nothing is served from the
dispatch cache.
"""

from __future__ import annotations

import statistics
import time
import warnings

warnings.simplefilter("ignore")

CASES = [
    # (module, class, num_envs, steps, trials)
    ("gymnasium_tpu.envs.phys2d.cartpole", "CartPoleFunctional", 4096, 1024, 5),
    ("gymnasium_tpu.envs.phys2d.pendulum", "PendulumFunctional", 4096, 512, 3),
    ("gymnasium_tpu.envs.phys2d.mountain_car", "MountainCarFunctional", 4096, 512, 3),
    ("gymnasium_tpu.envs.phys2d.acrobot", "AcrobotFunctional", 4096, 512, 3),
    ("gymnasium_tpu.envs.tabular.frozen_lake", "FrozenLakeFunctional", 4096, 512, 3),
    ("gymnasium_tpu.envs.tabular.taxi", "TaxiFunctional", 4096, 512, 3),
    ("gymnasium_tpu.envs.tabular.blackjack", "BlackjackFunctional", 4096, 256, 3),
    ("gymnasium_tpu.envs.blockchain.cpd_functional", "BlockchainCPDFunctional", 4096, 200, 3),
    ("gymnasium_tpu.envs.box2d.lunar_lander", "LunarLanderFunctional", 4096, 200, 3),
    ("gymnasium_tpu.envs.mujoco.half_cheetah", "HalfCheetahFunctional", 4096, 100, 3),
    ("gymnasium_tpu.envs.mujoco.ant", "AntFunctional", 1024, 100, 3),
    ("gymnasium_tpu.envs.mujoco.ant", "AntFunctional", 4096, 100, 3),
    ("gymnasium_tpu.envs.mujoco.humanoid", "HumanoidFunctional", 1024, 50, 3),
    ("gymnasium_tpu.envs.mujoco.humanoid", "HumanoidFunctional", 4096, 50, 3),
    ("gymnasium_tpu.envs.box2d.car_racing_functional", "CarRacingFunctional", 64, 100, 3),
]


def main() -> None:
    import importlib

    import jax

    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    print("| env | N | env-steps/s |")
    print("|---|---|---|")
    for module, cls_name, n, steps, trials in CASES:
        try:
            cls = getattr(importlib.import_module(module), cls_name)
            env = JaxVectorEnv(cls(), num_envs=n, max_episode_steps=1000, seed=0)
            env.reset()

            import jax.numpy as jnp

            @jax.jit
            def reduce_traj(reward):
                return jnp.sum(reward[-1])

            def timed(repeats):
                """repeats carry-chained rollouts ended by ONE host-read.

                block_until_ready through the axon tunnel can return before
                the device is done; the host-read forces true completion,
                and timing two repeat counts cancels its ~35 ms constant.
                """
                times = []
                for _ in range(trials + 1):
                    t0 = time.perf_counter()
                    c = env.carry
                    for _ in range(repeats):
                        c, traj = env.rollout(steps, carry=c, unroll=1)
                    float(reduce_traj(traj.reward))
                    times.append(time.perf_counter() - t0)
                return statistics.median(sorted(times[1:]))

            carry, traj = env.rollout(steps, unroll=1)
            float(reduce_traj(traj.reward))  # warmup + compile
            t1, t4 = timed(1), timed(4)
            rate = 3 * n * steps / max(t4 - t1, 1e-9)
            unit = "B" if rate >= 1e9 else ("M" if rate >= 1e6 else "K")
            val = rate / {"B": 1e9, "M": 1e6, "K": 1e3}[unit]
            print(f"| {cls_name.replace('Functional', '')} | {n} | {val:.2f} {unit} |")
        except Exception as e:  # keep the table going
            print(f"| {cls_name} | {n} | ERROR {type(e).__name__}: {str(e)[:60]} |")


if __name__ == "__main__":
    main()
