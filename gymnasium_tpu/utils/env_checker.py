"""Active environment conformance checker.

Parity surface: reference gymnasium/utils/env_checker.py:73-351 —
reset/step determinism under the same seed, reset signature/options
handling, space membership, and return-type validation.
"""

from __future__ import annotations

import inspect
from copy import deepcopy

import numpy as np

import gymnasium_tpu as gym
import gymnasium_tpu.logger as logger
from gymnasium_tpu import spaces
from gymnasium_tpu.utils.data_equivalence import data_equivalence
from gymnasium_tpu.utils.passive_env_checker import (
    check_action_space,
    check_observation_space,
    env_render_passive_checker,
    env_reset_passive_checker,
    env_step_passive_checker,
)

__all__ = ["check_env", "data_equivalence"]


def check_reset_seed_determinism(env: gym.Env):
    """Check that resetting with the same seed reproduces the same state."""
    signature = inspect.signature(env.reset)
    if "seed" not in signature.parameters and "kwargs" not in signature.parameters:
        raise gym.error.Error(
            "The `reset` method does not provide a `seed` or `**kwargs` keyword argument."
        )

    obs_1, info_1 = env.reset(seed=123)
    assert obs_1 in env.observation_space, (
        "The observation returned by `env.reset(seed=123)` is not within the observation space."
    )
    assert env.unwrapped._np_random is not None, (
        "Expects the random number generator to have been generated given a seed was passed to reset. "
        "Most likely the environment reset function does not call `super().reset(seed=seed)`."
    )
    seed_123_rng_1 = deepcopy(env.unwrapped._np_random)

    obs_2, info_2 = env.reset(seed=123)
    assert obs_2 in env.observation_space
    seed_123_rng_2 = deepcopy(env.unwrapped._np_random)

    if env.spec is not None and env.spec.nondeterministic is False:
        assert data_equivalence(obs_1, obs_2), (
            "Using `env.reset(seed=123)` is non-deterministic as the observations are not equivalent."
        )
        assert (
            seed_123_rng_1.bit_generator.state == seed_123_rng_2.bit_generator.state
        ), (
            "Most likely the environment reset function does not call `super().reset(seed=seed)` "
            "as the random generates are not same when the same seeds are passed to `env.reset`."
        )

    obs_3, info_3 = env.reset(seed=456)
    assert obs_3 in env.observation_space

    # seed=None keeps the existing generator
    env.reset(seed=None)


def check_reset_options(env: gym.Env):
    """Check that reset accepts an ``options`` keyword."""
    signature = inspect.signature(env.reset)
    if "options" not in signature.parameters and "kwargs" not in signature.parameters:
        raise gym.error.Error(
            "The `reset` method does not provide an `options` or `**kwargs` keyword argument."
        )
    env.reset(options={})


def check_step_determinism(env: gym.Env, seed: int = 123):
    """Check that stepping after identical seeds is deterministic."""
    if env.spec is not None and env.spec.nondeterministic:
        return

    env.action_space.seed(seed)
    action = env.action_space.sample()

    env.reset(seed=seed)
    obs_1, rew_1, term_1, trunc_1, info_1 = env.step(action)

    env.reset(seed=seed)
    obs_2, rew_2, term_2, trunc_2, info_2 = env.step(action)

    assert data_equivalence(obs_1, obs_2, exact=False), (
        "Deterministic step observations are not equivalent for the same seed and action"
    )
    assert rew_1 == rew_2, "Deterministic step rewards are not equivalent for the same seed and action"
    assert term_1 == term_2 and trunc_1 == trunc_2


def check_env(env: gym.Env, warn: bool | None = None, skip_render_check: bool = False):
    """Run the full battery of API conformance checks on ``env``."""
    if not isinstance(env, gym.Env):
        raise TypeError(
            f"The environment must inherit from the gymnasium_tpu.Env class, actual class: {type(env)}."
        )

    if env.unwrapped is not env:
        logger.warn(
            f"The environment ({env}) is different from the unwrapped version ({env.unwrapped}). "
            "This could effect the environment checker as the environment most likely has a wrapper applied to it."
        )

    assert hasattr(env, "action_space"), "The environment must specify an action space."
    check_action_space(env.action_space)
    assert hasattr(env, "observation_space"), "The environment must specify an observation space."
    check_observation_space(env.observation_space)

    check_reset_seed_determinism(env)
    check_reset_options(env)

    env_reset_passive_checker(env)
    env_step_passive_checker(env, env.action_space.sample())
    check_step_determinism(env)

    if not skip_render_check:
        if env.render_mode is not None:
            env_render_passive_checker(env)
        if env.spec is not None:
            for render_mode in env.metadata.get("render_modes", []):
                if "_list" in render_mode:
                    continue
                new_env = env.spec.make(render_mode=render_mode)
                new_env.reset()
                env_render_passive_checker(new_env)
                new_env.close()
