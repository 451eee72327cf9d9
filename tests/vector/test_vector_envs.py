"""Vector runtime tests: Sync, Async (pipes + shared memory), Jax.

Pattern: reference tests/vector/ (autoreset modes, partial reset,
call/get/set broadcast, async state machine errors)."""

import multiprocessing as mp

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu.error import AlreadyPendingCallError, ClosedEnvironmentError, NoAsyncCallError
from gymnasium_tpu.vector import AsyncVectorEnv, AutoresetMode, SyncVectorEnv


def cartpole_fns(n):
    return [lambda: gym.make("CartPole-v1", disable_env_checker=True) for _ in range(n)]


def test_sync_basic():
    env = SyncVectorEnv(cartpole_fns(4))
    obs, infos = env.reset(seed=0)
    assert obs.shape == (4, 4)
    for _ in range(50):
        obs, rewards, terms, truncs, infos = env.step(env.action_space.sample())
    assert rewards.shape == (4,)
    env.close()


def test_sync_determinism():
    env_a = SyncVectorEnv(cartpole_fns(3))
    env_b = SyncVectorEnv(cartpole_fns(3))
    obs_a, _ = env_a.reset(seed=42)
    obs_b, _ = env_b.reset(seed=42)
    assert np.array_equal(obs_a, obs_b)
    env_a.action_space.seed(1)
    for _ in range(30):
        actions = env_a.action_space.sample()
        obs_a, r_a, te_a, tr_a, _ = env_a.step(actions)
        obs_b, r_b, te_b, tr_b, _ = env_b.step(actions)
        assert np.array_equal(obs_a, obs_b)
        assert np.array_equal(r_a, r_b)
    env_a.close()
    env_b.close()


def test_sync_partial_reset():
    env = SyncVectorEnv(cartpole_fns(4))
    env.reset(seed=0)
    mask = np.array([True, False, True, False])
    obs, infos = env.reset(options={"reset_mask": mask})
    assert obs.shape == (4, 4)
    env.close()


def test_sync_autoreset_modes():
    for mode in (AutoresetMode.NEXT_STEP, AutoresetMode.SAME_STEP):
        env = SyncVectorEnv(cartpole_fns(2), autoreset_mode=mode)
        env.reset(seed=0)
        for _ in range(300):
            obs, r, te, tr, infos = env.step(env.action_space.sample())
        if mode == AutoresetMode.SAME_STEP:
            # SAME_STEP surfaces final_obs in infos at episode ends
            pass
        env.close()


def test_sync_call_get_set():
    env = SyncVectorEnv(cartpole_fns(3))
    env.reset(seed=0)
    results = env.call("render")
    assert len(results) == 3
    gravities = env.get_attr("gravity")
    assert all(g == 9.8 for g in gravities)
    env.set_attr("gravity", [9.8, 10.0, 11.0])
    assert env.get_attr("gravity") == (9.8, 10.0, 11.0)
    env.close()


@pytest.mark.parametrize("shared_memory", [True, False])
def test_async_basic(shared_memory):
    env = AsyncVectorEnv(cartpole_fns(3), shared_memory=shared_memory)
    try:
        obs, infos = env.reset(seed=5)
        assert obs.shape == (3, 4)
        for _ in range(20):
            obs, rewards, terms, truncs, infos = env.step(env.action_space.sample())
        assert obs.shape == (3, 4)
        assert rewards.shape == (3,)
    finally:
        env.close()


def test_async_matches_sync():
    async_env = AsyncVectorEnv(cartpole_fns(2), shared_memory=True)
    sync_env = SyncVectorEnv(cartpole_fns(2))
    try:
        obs_a, _ = async_env.reset(seed=11)
        obs_s, _ = sync_env.reset(seed=11)
        assert np.array_equal(obs_a, obs_s)
        async_env.action_space.seed(3)
        for _ in range(40):
            actions = async_env.action_space.sample()
            obs_a, r_a, te_a, tr_a, _ = async_env.step(actions)
            obs_s, r_s, te_s, tr_s, _ = sync_env.step(actions)
            assert np.array_equal(obs_a, obs_s)
            assert np.array_equal(te_a, te_s)
    finally:
        async_env.close()
        sync_env.close()


def test_async_state_machine():
    env = AsyncVectorEnv(cartpole_fns(2), shared_memory=False)
    try:
        with pytest.raises(NoAsyncCallError):
            env.step_wait()
        env.reset(seed=0)
        env.step_async(env.action_space.sample())
        with pytest.raises(AlreadyPendingCallError):
            env.step_async(env.action_space.sample())
        env.step_wait()
    finally:
        env.close()
    with pytest.raises(ClosedEnvironmentError):
        env.reset()


def test_async_call_and_attrs():
    env = AsyncVectorEnv(cartpole_fns(2), shared_memory=True)
    try:
        env.reset(seed=0)
        gravities = env.get_attr("gravity")
        assert gravities == (9.8, 9.8)
        env.set_attr("gravity", [1.0, 2.0])
        assert env.get_attr("gravity") == (1.0, 2.0)
    finally:
        env.close()


def test_async_worker_error_propagates():
    def make_broken():
        from tests.testing_env import GenericTestEnv

        def bad_step(self, action):
            raise RuntimeError("deliberate failure")

        return GenericTestEnv(step_func=bad_step)

    env = AsyncVectorEnv([make_broken for _ in range(2)], shared_memory=False)
    try:
        env.reset()
        with pytest.raises(RuntimeError):
            env.step(np.zeros((2, 1), dtype=np.float32))
    finally:
        env.close(terminate=True)


def test_jax_vector_matches_modes():
    env = gym.make_vec("CartPole-v1", num_envs=4, vectorization_mode="jax")
    obs, _ = env.reset(seed=0)
    assert np.asarray(obs).shape == (4, 4)
    obs, r, te, tr, _ = env.step(np.zeros(4, dtype=np.int32))
    assert np.asarray(r).shape == (4,)


def test_jax_vector_partial_reset():
    """Masked in-jit partial reset matches SyncVectorEnv semantics
    (reference sync_vector_env.py:192-220): masked lanes re-initialize,
    unmasked lanes keep their state and report their last observation."""
    env = gym.make_vec("CartPole-v1", num_envs=4, vectorization_mode="jax")
    env.reset(seed=0)
    last_obs = None
    for _ in range(5):
        last_obs, *_ = env.step(np.zeros(4, dtype=np.int32))
    before = np.asarray(env.carry.steps)
    assert (before == 5).all()

    mask = np.array([True, False, True, False])
    obs, infos = env.reset(options={"reset_mask": mask})
    obs = np.asarray(obs)
    assert obs.shape == (4, 4)
    # unmasked lanes: identical observation and live step counters
    assert np.array_equal(obs[~mask], np.asarray(last_obs)[~mask])
    after = np.asarray(env.carry.steps)
    assert (after[mask] == 0).all() and (after[~mask] == 5).all()
    # masked lanes: fresh initial states (CartPole inits in [-0.05, 0.05])
    assert (np.abs(obs[mask]) <= 0.05 + 1e-6).all()
    # stepping continues for everyone
    obs2, r, te, tr, _ = env.step(np.zeros(4, dtype=np.int32))
    assert (np.asarray(env.carry.steps) == after + 1).all()

    # masked reset with an explicit seed is deterministic
    o1, _ = env.reset(options={"reset_mask": mask}, seed=123)
    o2, _ = env.reset(options={"reset_mask": mask}, seed=123)
    assert np.array_equal(np.asarray(o1)[mask], np.asarray(o2)[mask])

    # invalid masks are rejected like the reference
    with pytest.raises(AssertionError):
        env.reset(options={"reset_mask": np.array([True, False])})
    with pytest.raises(AssertionError):
        env.reset(options={"reset_mask": np.zeros(4, dtype=np.bool_)})
    with pytest.raises(AssertionError):
        env.reset(options={"reset_mask": np.ones(4, dtype=np.int8)})
