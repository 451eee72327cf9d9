"""AtariPreprocessing tests against a synthetic pixel env
(coverage pattern: reference tests/wrappers/test_atari_preprocessing.py —
the preprocessing works against any pixel env; no ALE is registered in-tree)."""

import numpy as np
import pytest

from gymnasium_tpu import spaces
from gymnasium_tpu.wrappers import AtariPreprocessing
from tests.testing_env import GenericTestEnv


def _pixel_env(height=60, width=48, episode_len=100):
    counter = {"t": 0}

    def frame():
        return np.full((height, width, 3), counter["t"] % 255, dtype=np.uint8)

    def reset_func(self, *, seed=None, options=None):
        super(GenericTestEnv, self).reset(seed=seed)
        counter["t"] = 0
        return frame(), {}

    def step_func(self, action):
        counter["t"] += 1
        return frame(), 1.0, counter["t"] >= episode_len, False, {}

    def render_func(self):
        return frame()

    env = GenericTestEnv(
        observation_space=spaces.Box(0, 255, (height, width, 3), np.uint8),
        action_space=spaces.Discrete(4),
        reset_func=reset_func,
        step_func=step_func,
        render_func=render_func,
        render_mode="rgb_array",
    )
    env._frameskip = 1  # mark as frameskip-free, like a *NoFrameskip ALE env
    return env


def test_grayscale_resize_shape():
    env = AtariPreprocessing(_pixel_env(), frame_skip=4, screen_size=84, noop_max=0)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (84, 84)
    assert obs.dtype == np.uint8
    assert env.observation_space.shape == (84, 84)


def test_grayscale_newaxis():
    env = AtariPreprocessing(
        _pixel_env(), frame_skip=4, noop_max=0, grayscale_newaxis=True
    )
    obs, _ = env.reset(seed=0)
    assert obs.shape == (84, 84, 1)


def test_rgb_mode():
    env = AtariPreprocessing(_pixel_env(), frame_skip=4, noop_max=0, grayscale_obs=False)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (84, 84, 3)


def test_scale_obs_float():
    env = AtariPreprocessing(_pixel_env(), frame_skip=4, noop_max=0, scale_obs=True)
    obs, _ = env.reset(seed=0)
    assert obs.dtype == np.float32
    assert float(obs.max()) <= 1.0


def test_rectangular_screen_size():
    env = AtariPreprocessing(_pixel_env(), frame_skip=2, noop_max=0, screen_size=(100, 60))
    obs, _ = env.reset(seed=0)
    # (width, height) tuple convention -> obs rows=height? accept either consistent order
    assert obs.shape in ((100, 60), (60, 100))


def test_frame_skip_accumulates_reward():
    env = AtariPreprocessing(_pixel_env(), frame_skip=4, noop_max=0)
    env.reset(seed=0)
    _, reward, *_ = env.step(0)
    assert reward == 4.0


def test_noop_reset_advances_env():
    env = AtariPreprocessing(_pixel_env(), frame_skip=1, noop_max=10)
    env.reset(seed=1)
    # after reset with noops the underlying env has stepped 1..10 times;
    # first step reward is still 1.0 per frame
    _, reward, *_ = env.step(0)
    assert reward == 1.0


def test_invalid_frame_skip_rejected():
    with pytest.raises(AssertionError):
        AtariPreprocessing(_pixel_env(), frame_skip=0)


def test_nonzero_action_start_rejected():
    env = _pixel_env()
    env.action_space = spaces.Discrete(4, start=1)
    with pytest.raises(AssertionError):
        AtariPreprocessing(env, noop_max=5)
