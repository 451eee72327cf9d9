"""Throughput measurement + device profiling hooks.

Parity surface: reference gymnasium/utils/performance.py:10-101
(``benchmark_step/init/render`` steps-per-second) plus the TPU additions the
reference lacks (SURVEY.md §5.1): ``benchmark_compiled_rollout`` separates
compile time from steady-state device throughput, and ``trace`` wraps
``jax.profiler`` for on-device timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import gymnasium_tpu as gym

__all__ = [
    "benchmark_step",
    "benchmark_init",
    "benchmark_render",
    "benchmark_compiled_rollout",
    "trace",
]


def benchmark_step(env: gym.Env, target_duration: float = 5.0, seed: int | None = None) -> float:
    """Average steps/s of ``env.step`` over roughly ``target_duration`` seconds."""
    steps = 0
    end = 0.0
    env.reset(seed=seed)
    start = time.monotonic()
    while True:
        steps += 1
        action = env.action_space.sample()
        _, _, terminal, truncated, _ = env.step(action)
        if terminal or truncated:
            env.reset()
        end = time.monotonic()
        if end - start > target_duration:
            break
    length = end - start
    return steps / length


def benchmark_init(env_lambda: Callable[[], gym.Env], target_duration: float = 1.0, seed: int | None = None) -> float:
    """Average env constructions+resets per second."""
    inits = 0
    end = 0.0
    start = time.monotonic()
    while True:
        inits += 1
        env = env_lambda()
        env.reset(seed=seed)
        end = time.monotonic()
        if end - start > target_duration:
            break
    length = end - start
    return inits / length


def benchmark_render(env: gym.Env, target_duration: float = 5.0) -> float:
    """Average renders per second."""
    renders = 0
    end = 0.0
    start = time.monotonic()
    while True:
        renders += 1
        env.render()
        end = time.monotonic()
        if end - start > target_duration:
            break
    length = end - start
    return renders / length


def benchmark_compiled_rollout(
    vector_env: Any,
    num_steps: int = 1024,
    repeats: int = 4,
) -> dict[str, float]:
    """Steady-state env-steps/s of a JaxVectorEnv's fused rollout.

    Returns compile time and per-repeat throughput separately (dispatch vs
    device time — what the host-side ``benchmark_step`` conflates).
    """
    import jax

    vector_env.reset()
    t0 = time.perf_counter()
    carry, _ = vector_env.rollout(num_steps)
    jax.block_until_ready(carry)
    compile_and_first = time.perf_counter() - t0

    t1 = time.perf_counter()
    for _ in range(repeats):
        carry, _ = vector_env.rollout(num_steps)
    jax.block_until_ready(carry)
    elapsed = time.perf_counter() - t1

    steps = vector_env.num_envs * num_steps * repeats
    return {
        "steps_per_second": steps / elapsed,
        "first_call_seconds": compile_and_first,
        "steady_state_seconds_per_rollout": elapsed / repeats,
    }


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2, device_tracer_level: int = 1):
    """Profile the enclosed block with ``jax.profiler`` (view in TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
