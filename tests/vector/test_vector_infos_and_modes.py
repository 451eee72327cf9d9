"""Vector info-batching protocol + make_vec mode tests
(coverage pattern: reference tests/vector/test_vector_env_info.py,
tests/envs/registration/test_make_vec.py)."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu import spaces
from gymnasium_tpu.vector import AutoresetMode, SyncVectorEnv
from tests.testing_env import GenericTestEnv

# --- _add_info masked batching -------------------------------------------------


def _env_with_info(info_fn):
    def step_func(self, action):
        return self.observation_space.sample(), 0.0, False, False, info_fn(self)

    return GenericTestEnv(step_func=step_func)


def test_info_scalar_batched_with_mask():
    def info_fn(self):
        return {"value": 3.5}

    envs = SyncVectorEnv([lambda: _env_with_info(info_fn) for _ in range(3)])
    envs.reset(seed=0)
    _, _, _, _, infos = envs.step(envs.action_space.sample())
    assert "value" in infos and "_value" in infos
    assert infos["value"].shape == (3,)
    assert np.all(infos["_value"])
    assert np.allclose(infos["value"], 3.5)
    envs.close()


def test_info_partial_presence_mask():
    class OnlyEvenInfo(GenericTestEnv):
        pass

    def make(i):
        def step_func(self, action):
            info = {"lucky": i} if i % 2 == 0 else {}
            return self.observation_space.sample(), 0.0, False, False, info

        return GenericTestEnv(step_func=step_func)

    envs = SyncVectorEnv([lambda i=i: make(i) for i in range(4)])
    envs.reset(seed=0)
    _, _, _, _, infos = envs.step(envs.action_space.sample())
    assert np.array_equal(infos["_lucky"], [True, False, True, False])
    assert infos["lucky"][0] == 0 and infos["lucky"][2] == 2
    envs.close()


def test_info_nested_dict_batched():
    def info_fn(self):
        return {"episode": {"r": 1.0, "l": 5}}

    envs = SyncVectorEnv([lambda: _env_with_info(info_fn) for _ in range(2)])
    envs.reset(seed=0)
    _, _, _, _, infos = envs.step(envs.action_space.sample())
    assert "episode" in infos
    assert np.allclose(infos["episode"]["r"], 1.0)
    assert np.array_equal(infos["episode"]["l"], [5, 5])
    envs.close()


def test_same_step_autoreset_final_obs_in_info():
    def step_func(self, action):
        return np.float32(1.0), 1.0, True, False, {"tag": 7}

    def reset_func(self, *, seed=None, options=None):
        super(GenericTestEnv, self).reset(seed=seed)
        return np.float32(0.0), {}

    envs = SyncVectorEnv(
        [
            lambda: GenericTestEnv(
                observation_space=spaces.Box(-10, 10, ()),
                step_func=step_func,
                reset_func=reset_func,
            )
            for _ in range(2)
        ],
        autoreset_mode=AutoresetMode.SAME_STEP,
    )
    envs.reset(seed=0)
    obs, rewards, terms, truncs, infos = envs.step(envs.action_space.sample())
    assert np.all(terms)
    # SAME_STEP: obs is already the reset obs; terminal obs moved to info
    assert np.allclose(obs, 0.0)
    assert "final_obs" in infos and "final_info" in infos
    assert np.allclose(infos["final_obs"].astype(np.float32), 1.0)
    envs.close()


def test_disabled_autoreset_raises_without_mask_reset():
    def step_func(self, action):
        return self.observation_space.sample(), 1.0, True, False, {}

    envs = SyncVectorEnv(
        [lambda: GenericTestEnv(step_func=step_func) for _ in range(2)],
        autoreset_mode=AutoresetMode.DISABLED,
    )
    envs.reset(seed=0)
    envs.step(envs.action_space.sample())  # all done now
    with pytest.raises(Exception):
        envs.step(envs.action_space.sample())
    envs.close()


# --- make_vec modes --------------------------------------------------------------


def test_make_vec_sync_mode():
    envs = gym.make_vec("CartPole-v1", num_envs=3, vectorization_mode="sync")
    assert isinstance(envs, SyncVectorEnv)
    assert envs.num_envs == 3
    obs, _ = envs.reset(seed=1)
    assert obs.shape == (3, 4)
    envs.close()


def test_make_vec_async_mode():
    envs = gym.make_vec("CartPole-v1", num_envs=2, vectorization_mode="async")
    obs, _ = envs.reset(seed=1)
    assert obs.shape == (2, 4)
    obs, *_ = envs.step(envs.action_space.sample())
    assert obs.shape == (2, 4)
    envs.close()


def test_make_vec_jax_mode():
    envs = gym.make_vec("CartPole-v1", num_envs=8, vectorization_mode="jax")
    obs, _ = envs.reset(seed=0)
    assert np.asarray(obs).shape == (8, 4)
    obs, rewards, terms, truncs, infos = envs.step(envs.action_space.sample())
    assert np.asarray(rewards).shape == (8,)
    envs.close()


def test_make_vec_default_uses_entry_point_when_registered():
    # CartPole registers a jax_entry_point -> default mode is device-native
    envs = gym.make_vec("CartPole-v1", num_envs=4)
    obs, _ = envs.reset(seed=0)
    assert np.asarray(obs).shape == (4, 4)
    envs.close()


def test_make_vec_invalid_mode_raises():
    with pytest.raises(Exception):
        gym.make_vec("CartPole-v1", num_envs=2, vectorization_mode="warp-drive")


def test_make_vec_applies_wrappers():
    from gymnasium_tpu import wrappers

    envs = gym.make_vec(
        "CartPole-v1",
        num_envs=2,
        vectorization_mode="sync",
        wrappers=(lambda env: wrappers.TimeAwareObservation(env),),
    )
    obs, _ = envs.reset(seed=0)
    assert obs.shape[-1] == 5  # 4 state dims + time feature
    envs.close()


def test_make_vec_max_episode_steps_forwarded():
    envs = gym.make_vec(
        "CartPole-v1", num_envs=2, vectorization_mode="sync", max_episode_steps=7
    )
    envs.reset(seed=0)
    truncated_seen = False
    for _ in range(10):
        _, _, terms, truncs, _ = envs.step(envs.action_space.sample())
        if truncs.any():
            truncated_seen = True
            break
    assert truncated_seen
    envs.close()


def test_vector_env_wrapper_base_classes():
    from gymnasium_tpu.vector import (
        VectorActionWrapper,
        VectorObservationWrapper,
        VectorRewardWrapper,
        VectorWrapper,
    )

    envs = gym.make_vec("CartPole-v1", num_envs=2, vectorization_mode="sync")

    class Obs2x(VectorObservationWrapper):
        def observations(self, observations):
            return observations * 2

    class Rew3x(VectorRewardWrapper):
        def rewards(self, rewards):
            return rewards * 3

    wrapped = Rew3x(Obs2x(envs))
    obs, _ = wrapped.reset(seed=0)
    raw = gym.make_vec("CartPole-v1", num_envs=2, vectorization_mode="sync")
    raw_obs, _ = raw.reset(seed=0)
    assert np.allclose(obs, raw_obs * 2)
    _, rewards, *_ = wrapped.step(wrapped.action_space.sample())
    assert np.allclose(rewards, 3.0)
    wrapped.close()
    raw.close()
