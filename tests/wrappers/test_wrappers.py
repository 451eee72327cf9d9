"""Behavioral tests for the single-env wrapper catalog."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu import spaces
from gymnasium_tpu import wrappers


def make_cartpole():
    return gym.make("CartPole-v1", disable_env_checker=True)


def make_pendulum():
    return gym.make("Pendulum-v1", disable_env_checker=True)


def test_time_limit():
    env = wrappers.TimeLimit(make_cartpole().unwrapped, max_episode_steps=7)
    env.reset(seed=0)
    for i in range(7):
        _, _, term, trunc, _ = env.step(0)
        if term:
            break
    assert trunc or term


def test_autoreset():
    env = wrappers.Autoreset(make_cartpole().unwrapped)
    env.reset(seed=0)
    steps_until_done = 0
    done = False
    while not done:
        _, r, te, tr, _ = env.step(1)
        done = te or tr
        steps_until_done += 1
    # next step should auto-reset with 0 reward and no done flags
    obs, r, te, tr, _ = env.step(1)
    assert r == 0.0 and not te and not tr


def test_record_episode_statistics():
    env = wrappers.RecordEpisodeStatistics(make_cartpole())
    env.reset(seed=2)
    info = {}
    for _ in range(1000):
        _, _, te, tr, info = env.step(int(env.action_space.sample()))
        if te or tr:
            break
    assert "episode" in info
    assert info["episode"]["l"] > 0
    assert info["episode"]["r"] == info["episode"]["l"]  # CartPole: +1/step
    assert len(env.return_queue) == 1


def test_order_enforcing():
    env = wrappers.OrderEnforcing(make_cartpole().unwrapped)
    with pytest.raises(gym.error.ResetNeeded):
        env.step(0)
    env.reset()
    env.step(0)


def test_flatten_observation():
    base = gym.make("Blackjack-v1", disable_env_checker=True)
    env = wrappers.FlattenObservation(base)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (spaces.flatdim(base.observation_space),)


def test_filter_observation():
    from tests.testing_env import GenericTestEnv

    space = spaces.Dict(a=spaces.Box(0, 1, (2,)), b=spaces.Discrete(3))
    env = GenericTestEnv(observation_space=space)
    wrapped = wrappers.FilterObservation(env, ["a"])
    obs, _ = wrapped.reset()
    assert set(obs.keys()) == {"a"}


def test_clip_action():
    env = wrappers.ClipAction(make_pendulum())
    env.reset(seed=0)
    env.step(np.array([100.0], dtype=np.float32))  # would be invalid unclipped


def test_rescale_action():
    env = wrappers.RescaleAction(make_pendulum(), min_action=-1.0, max_action=1.0)
    env.reset(seed=0)
    obs1, r1, *_ = env.step(np.array([1.0], dtype=np.float32))
    env2 = make_pendulum()
    env2.reset(seed=0)
    obs2, r2, *_ = env2.step(np.array([2.0], dtype=np.float32))
    assert np.allclose(obs1, obs2)


def test_transform_reward():
    env = wrappers.TransformReward(make_cartpole(), lambda r: 10 * r)
    env.reset(seed=0)
    _, r, *_ = env.step(0)
    assert r == 10.0


def test_clip_reward():
    env = wrappers.ClipReward(make_cartpole(), max_reward=0.5)
    env.reset(seed=0)
    _, r, *_ = env.step(0)
    assert r == 0.5


def test_frame_stack():
    env = wrappers.FrameStackObservation(make_cartpole(), stack_size=4)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (4, 4)
    obs, *_ = env.step(0)
    assert obs.shape == (4, 4)


def test_time_aware_observation():
    env = wrappers.TimeAwareObservation(make_cartpole())
    obs, _ = env.reset(seed=0)
    assert obs.shape == (5,)
    assert obs[-1] == 0
    obs, *_ = env.step(0)
    assert obs[-1] == 1


def test_delay_observation():
    env = wrappers.DelayObservation(make_cartpole(), delay=2)
    obs0, _ = env.reset(seed=0)
    assert np.all(obs0 == 0)
    obs1, *_ = env.step(0)
    assert np.all(obs1 == 0)
    obs2, *_ = env.step(0)
    assert not np.all(obs2 == 0)


def test_normalize_observation():
    env = wrappers.NormalizeObservation(make_cartpole())
    env.reset(seed=0)
    for _ in range(10):
        obs, *_ = env.step(int(env.action_space.sample()))
    assert np.isfinite(obs).all()
    env.update_running_mean = False
    frozen_mean = env.obs_rms.mean.copy()
    env.step(0)
    assert np.array_equal(env.obs_rms.mean, frozen_mean)


def test_normalize_reward():
    env = wrappers.NormalizeReward(make_cartpole())
    env.reset(seed=0)
    rewards = []
    for _ in range(100):
        _, r, te, tr, _ = env.step(int(env.action_space.sample()))
        rewards.append(float(r))
        if te or tr:
            env.reset()
    assert np.isfinite(rewards).all()


def test_dtype_observation():
    env = wrappers.DtypeObservation(make_cartpole(), dtype=np.float64)
    obs, _ = env.reset(seed=0)
    assert obs.dtype == np.float64


def test_reshape_observation():
    env = wrappers.ReshapeObservation(make_cartpole(), (2, 2))
    obs, _ = env.reset(seed=0)
    assert obs.shape == (2, 2)


def test_rescale_observation():
    env = wrappers.RescaleObservation(make_pendulum(), min_obs=0.0, max_obs=1.0)
    obs, _ = env.reset(seed=0)
    assert np.all(obs >= 0.0) and np.all(obs <= 1.0)


def test_discretize_observation():
    env = wrappers.DiscretizeObservation(make_pendulum(), bins=5)
    obs, _ = env.reset(seed=0)
    assert isinstance(env.observation_space, spaces.Discrete)
    assert env.observation_space.contains(obs)


def test_discretize_action():
    env = wrappers.DiscretizeAction(make_pendulum(), bins=5)
    assert isinstance(env.action_space, spaces.Discrete)
    env.reset(seed=0)
    env.step(2)


def test_sticky_action():
    env = wrappers.StickyAction(make_cartpole(), repeat_action_probability=0.5)
    env.reset(seed=3)
    for _ in range(10):
        env.step(int(env.action_space.sample()))


def test_max_and_skip():
    env = wrappers.MaxAndSkipObservation(make_cartpole(), skip=4)
    env.reset(seed=0)
    _, r, *_ = env.step(0)
    assert r == 4.0  # 4 skipped steps of +1


def test_grayscale_and_resize():
    from tests.testing_env import GenericTestEnv

    space = spaces.Box(0, 255, (64, 48, 3), dtype=np.uint8)
    env = GenericTestEnv(observation_space=space)
    gray = wrappers.GrayscaleObservation(env)
    obs, _ = gray.reset()
    assert obs.shape == (64, 48)
    resized = wrappers.ResizeObservation(gray if False else env, (32, 24))
    obs, _ = resized.reset()
    assert obs.shape == (32, 24, 3)


def test_render_collection():
    env = wrappers.RenderCollection(gym.make("CartPole-v1", render_mode="rgb_array"))
    env.reset(seed=0)
    env.step(0)
    frames = env.render()
    assert isinstance(frames, list) and len(frames) == 2
    assert env.render() == []  # popped


def test_jax_to_numpy():
    env = gym.make("phys2d/CartPole-v1", disable_env_checker=True)
    env = wrappers.JaxToNumpy(env)
    obs, _ = env.reset(seed=0)
    assert isinstance(obs, np.ndarray)
    obs, r, te, tr, _ = env.step(np.int32(1))
    assert isinstance(obs, np.ndarray)


def test_numpy_to_torch():
    torch = pytest.importorskip("torch")
    env = wrappers.NumpyToTorch(make_cartpole())
    obs, _ = env.reset(seed=0)
    assert isinstance(obs, torch.Tensor)
    obs, r, te, tr, _ = env.step(torch.tensor(1))
    assert isinstance(obs, torch.Tensor)
