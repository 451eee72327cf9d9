"""AsyncVectorEnv edge cases: timeouts, closed-env guards, slow workers,
terminate-on-close (coverage pattern: reference tests/vector/test_async_vector_env.py
with its SlowEnv fixture)."""

import multiprocessing
import time

import numpy as np
import pytest

from gymnasium_tpu import spaces
from gymnasium_tpu.error import (
    AlreadyPendingCallError,
    ClosedEnvironmentError,
    NoAsyncCallError,
)
from gymnasium_tpu.vector import AsyncVectorEnv
from tests.testing_env import GenericTestEnv


def _make_env():
    return GenericTestEnv()


def _make_slow_env(delay=0.4):
    def slow_step(self, action):
        time.sleep(delay)
        return self.observation_space.sample(), 0.0, False, False, {}

    def slow_reset(self, *, seed=None, options=None):
        super(GenericTestEnv, self).reset(seed=seed)
        time.sleep(delay)
        return self.observation_space.sample(), {}

    return GenericTestEnv(step_func=slow_step, reset_func=slow_reset)


@pytest.mark.parametrize("shared_memory", [True, False])
def test_step_wait_timeout(shared_memory):
    envs = AsyncVectorEnv(
        [lambda: _make_slow_env(0.6) for _ in range(2)], shared_memory=shared_memory
    )
    envs.reset(seed=0)
    envs.step_async(envs.action_space.sample())
    # reference raises multiprocessing.TimeoutError (not the builtin)
    with pytest.raises(multiprocessing.TimeoutError):
        envs.step_wait(timeout=0.05)
    envs.close(terminate=True)


def test_reset_wait_timeout():
    envs = AsyncVectorEnv([lambda: _make_slow_env(0.6) for _ in range(2)])
    envs.reset_async(seed=0)
    with pytest.raises(multiprocessing.TimeoutError):
        envs.reset_wait(timeout=0.05)
    envs.close(terminate=True)


def test_no_async_call_error():
    envs = AsyncVectorEnv([_make_env for _ in range(2)])
    with pytest.raises(NoAsyncCallError):
        envs.step_wait()
    with pytest.raises(NoAsyncCallError):
        envs.reset_wait()
    envs.close()


def test_already_pending_call_error():
    envs = AsyncVectorEnv([lambda: _make_slow_env(0.3) for _ in range(2)])
    envs.reset_async(seed=0)
    with pytest.raises(AlreadyPendingCallError):
        envs.reset_async()
    envs.reset_wait()
    envs.step_async(envs.action_space.sample())
    with pytest.raises(AlreadyPendingCallError):
        envs.step_async(envs.action_space.sample())
    envs.step_wait()
    envs.close()


def test_closed_env_raises():
    envs = AsyncVectorEnv([_make_env for _ in range(2)])
    envs.reset(seed=0)
    envs.close()
    with pytest.raises(ClosedEnvironmentError):
        envs.reset(seed=0)
    with pytest.raises(ClosedEnvironmentError):
        envs.step(envs.action_space.sample())


def test_terminate_close_kills_slow_workers():
    envs = AsyncVectorEnv([lambda: _make_slow_env(5.0) for _ in range(2)])
    envs.reset_async(seed=0)
    start = time.perf_counter()
    envs.close(terminate=True)
    assert time.perf_counter() - start < 3.0, "terminate close should not wait out the step"
    assert all(not p.is_alive() for p in envs.processes)


def test_custom_nonflat_space_without_shared_memory():
    space = spaces.Dict({"a": spaces.Box(0.0, 1.0, (2,)), "b": spaces.Discrete(3)})

    def make():
        def reset_func(self, *, seed=None, options=None):
            super(GenericTestEnv, self).reset(seed=seed)
            return self.observation_space.sample(), {}

        def step_func(self, action):
            return self.observation_space.sample(), 0.0, False, False, {}

        return GenericTestEnv(
            observation_space=space, reset_func=reset_func, step_func=step_func
        )

    envs = AsyncVectorEnv([make for _ in range(2)], shared_memory=False)
    obs, _ = envs.reset(seed=0)
    assert set(obs.keys()) == {"a", "b"}
    assert obs["a"].shape == (2, 2)
    envs.close()


def test_worker_exception_includes_env_index():
    def boom(self, action):
        raise RuntimeError("worker exploded")

    envs = AsyncVectorEnv([lambda: GenericTestEnv(step_func=boom) for _ in range(2)])
    envs.reset(seed=0)
    with pytest.raises(Exception) as excinfo:
        envs.step(envs.action_space.sample())
    assert "exploded" in str(excinfo.value) or "RuntimeError" in str(excinfo.value)
    envs.close(terminate=True)
