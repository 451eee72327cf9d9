"""check_env / env_match tests (coverage pattern: reference tests/utils/test_env_checker.py)."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu.utils.env_checker import check_env
from gymnasium_tpu.utils.env_match import check_environments_match
from tests.testing_env import GenericTestEnv


def test_check_env_passes_on_conformant_env():
    check_env(GenericTestEnv(), skip_render_check=True)


def test_check_env_accepts_registered_env():
    env = gym.make("CartPole-v1").unwrapped
    check_env(env, skip_render_check=True)
    env.close()


def test_check_env_rejects_nondeterministic_reset():
    from gymnasium_tpu.envs.registration import EnvSpec

    def flaky_reset(self, *, seed=None, options=None):
        super(GenericTestEnv, self).reset(seed=seed)
        # fresh OS entropy each call — genuinely ignores the seed
        return np.random.default_rng().random(1).astype(np.float32), {}

    env = GenericTestEnv(reset_func=flaky_reset)
    # determinism is only enforced for spec'd envs not marked nondeterministic
    # (reference env_checker.py:114)
    env.spec = EnvSpec(id="Flaky-v0", entry_point="tests:Flaky")
    with pytest.raises(AssertionError):
        check_env(env, skip_render_check=True)


def test_check_env_rejects_obs_outside_space():
    def bad_reset(self, *, seed=None, options=None):
        super(GenericTestEnv, self).reset(seed=seed)
        return np.array([100.0], dtype=np.float32), {}

    env = GenericTestEnv(
        observation_space=gym.spaces.Box(0.0, 1.0, (1,)), reset_func=bad_reset
    )
    with pytest.raises(AssertionError):
        check_env(env, skip_render_check=True)


def test_check_env_rejects_wrong_step_arity():
    def bad_step(self, action):
        return self.observation_space.sample(), 0.0, False, {}  # old 4-tuple API

    env = GenericTestEnv(step_func=bad_step)
    with pytest.raises(Exception):
        check_env(env, skip_render_check=True)


def test_check_env_rejects_non_dict_info():
    def bad_reset(self, *, seed=None, options=None):
        super(GenericTestEnv, self).reset(seed=seed)
        return self.observation_space.sample(), None

    env = GenericTestEnv(reset_func=bad_reset)
    with pytest.raises(AssertionError):
        check_env(env, skip_render_check=True)


def test_env_match_same_env_matches():
    env_a = gym.make("CartPole-v1")
    env_b = gym.make("CartPole-v1")
    check_environments_match(env_a, env_b, num_steps=50, seed=3)
    env_a.close()
    env_b.close()


def test_env_match_detects_divergence():
    env_a = gym.make("CartPole-v1")
    env_b = gym.make("MountainCar-v0")
    with pytest.raises(Exception):
        check_environments_match(env_a, env_b, num_steps=10, seed=3)
    env_a.close()
    env_b.close()
