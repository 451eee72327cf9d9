"""GenericTestEnv: the universal injectable fake env for tests
(pattern from reference tests/testing_env.py:60-120)."""

from __future__ import annotations

import types
from typing import Any

import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu import spaces


def basic_reset_func(self, *, seed: int | None = None, options: dict | None = None):
    """Default reset: seed then sample an observation."""
    super(GenericTestEnv, self).reset(seed=seed)
    # Seed with the env's derived np_random_seed (not the raw argument) so an
    # unseeded reset() after reset(seed=N) is reproducible — the determinism
    # contract check_env enforces (reference tests/testing_env.py:35).
    self.observation_space.seed(self.np_random_seed)
    return self.observation_space.sample(), {"options": options}


def new_step_func(self, action):
    """Default 5-tuple step."""
    return self.observation_space.sample(), 0.0, False, False, {}


def old_step_func(self, action):
    """Deprecated 4-tuple (done) step, for compat testing."""
    return self.observation_space.sample(), 0.0, False, {}


def basic_render_func(self):
    """Default render: a small black frame."""
    return np.zeros((32, 32, 3), dtype=np.uint8)


class GenericTestEnv(gym.Env):
    """An env whose reset/step/render are injectable functions."""

    def __init__(
        self,
        action_space: spaces.Space = None,
        observation_space: spaces.Space = None,
        reset_func=basic_reset_func,
        step_func=new_step_func,
        render_func=basic_render_func,
        metadata: dict[str, Any] | None = None,
        render_mode: str | None = None,
        spec: Any = "default",
    ):
        self.metadata = metadata if metadata is not None else {
            "render_modes": ["rgb_array"],
            "render_fps": 30,
        }
        self.render_mode = render_mode
        if spec == "default":
            from gymnasium_tpu.envs.registration import EnvSpec

            # Real entry point so check_env's spec.make() close-check works.
            spec = EnvSpec(
                "TestingEnv-v0",
                entry_point="tests.testing_env:GenericTestEnv",
                max_episode_steps=100,
            )
        self.spec = spec

        self.observation_space = (
            observation_space if observation_space is not None else spaces.Box(0, 1, (1,))
        )
        self.action_space = action_space if action_space is not None else spaces.Box(0, 1, (1,))

        if reset_func is not None:
            self.reset = types.MethodType(reset_func, self)
        if step_func is not None:
            self.step = types.MethodType(step_func, self)
        if render_func is not None:
            self.render = types.MethodType(render_func, self)
