"""Behavioral tests for vector wrappers over Sync and Jax vector envs."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu import wrappers
from gymnasium_tpu.wrappers import vector as vec_wrappers


def make_sync(n=4):
    return gym.make_vec("CartPole-v1", num_envs=n, vectorization_mode="sync")


def test_record_episode_statistics():
    env = vec_wrappers.RecordEpisodeStatistics(make_sync())
    env.reset(seed=0)
    seen_episode = False
    for _ in range(600):
        _, _, te, tr, info = env.step(env.action_space.sample())
        if "episode" in info:
            seen_episode = True
            mask = info["_episode"]
            assert np.any(mask)
            assert np.all(info["episode"]["r"][mask] > 0)
            break
    assert seen_episode
    assert env.episode_count >= 1


def test_dict_info_to_list():
    env = vec_wrappers.DictInfoToList(make_sync())
    _, infos = env.reset(seed=0)
    assert isinstance(infos, list) and len(infos) == 4
    _, _, _, _, infos = env.step(env.action_space.sample())
    assert isinstance(infos, list)


def test_vector_normalize_observation():
    env = vec_wrappers.NormalizeObservation(make_sync())
    obs, _ = env.reset(seed=0)
    for _ in range(20):
        obs, *_ = env.step(env.action_space.sample())
    assert obs.shape == (4, 4)
    assert np.isfinite(obs).all()
    # statistics should roughly center the data
    assert np.abs(obs).mean() < 10


def test_vector_normalize_reward():
    env = vec_wrappers.NormalizeReward(make_sync())
    env.reset(seed=0)
    for _ in range(20):
        _, r, *_ = env.step(env.action_space.sample())
    assert np.isfinite(r).all()


def test_vector_clip_action():
    env = gym.make_vec("Pendulum-v1", num_envs=3, vectorization_mode="sync")
    env = vec_wrappers.ClipAction(env)
    env.reset(seed=0)
    big = np.full((3, 1), 100.0, dtype=np.float32)
    env.step(big)


def test_vector_rescale_action():
    env = gym.make_vec("Pendulum-v1", num_envs=3, vectorization_mode="sync")
    env = vec_wrappers.RescaleAction(env, min_action=-1.0, max_action=1.0)
    env.reset(seed=0)
    env.step(np.zeros((3, 1), dtype=np.float32))


def test_vector_flatten_observation():
    env = gym.make_vec("CartPole-v1", num_envs=4, vectorization_mode="sync")
    env = vec_wrappers.FlattenObservation(env)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (4, 4)


def test_vector_clip_reward():
    env = vec_wrappers.ClipReward(make_sync(), max_reward=0.5)
    env.reset(seed=0)
    _, r, *_ = env.step(env.action_space.sample())
    assert np.all(r == 0.5)


def test_vector_jax_to_numpy():
    env = gym.make_vec("CartPole-v1", num_envs=4, vectorization_mode="jax")
    env = vec_wrappers.JaxToNumpy(env)
    obs, _ = env.reset(seed=0)
    assert isinstance(obs, np.ndarray)
    obs, r, te, tr, _ = env.step(np.zeros(4, dtype=np.int32))
    assert isinstance(obs, np.ndarray) and isinstance(r, np.ndarray)


def test_vector_transform_reward():
    env = vec_wrappers.TransformReward(make_sync(), lambda r: 2 * r)
    env.reset(seed=0)
    _, r, *_ = env.step(env.action_space.sample())
    assert np.all(r == 2.0)
