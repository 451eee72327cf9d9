"""Core Env/Wrapper protocol tests (coverage pattern: reference tests/test_core.py)."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu import spaces
from gymnasium_tpu.core import ActionWrapper, ObservationWrapper, RewardWrapper, Wrapper
from tests.testing_env import GenericTestEnv

# --- Env basics ---------------------------------------------------------------


def test_np_random_lazy_seeding():
    env = GenericTestEnv()
    rng1 = env.np_random
    assert isinstance(rng1, np.random.Generator)
    assert env.np_random is rng1  # cached


def test_reset_seed_sets_np_random_seed():
    env = GenericTestEnv()
    env.reset(seed=123)
    assert env.np_random_seed == 123
    first = env.np_random.random()
    env.reset(seed=123)
    assert env.np_random.random() == first


def test_reset_without_seed_keeps_rng():
    env = GenericTestEnv()
    env.reset(seed=5)
    rng = env.np_random
    env.reset()  # seed=None must NOT reseed
    assert env.np_random is rng


def test_np_random_setter_invalidates_seed():
    env = GenericTestEnv()
    env.reset(seed=1)
    env.np_random = np.random.default_rng(999)
    assert env.np_random_seed == -1


def test_context_manager_closes():
    closed = []
    env = GenericTestEnv()
    env.close = lambda: closed.append(True)
    with env as e:
        assert e is env
    assert closed == [True]


def test_str_contains_class_name():
    assert "GenericTestEnv" in str(GenericTestEnv())


def test_unwrapped_identity():
    env = GenericTestEnv()
    assert env.unwrapped is env


# --- Wrapper delegation -------------------------------------------------------


class _NoopWrapper(Wrapper):
    pass


def test_wrapper_delegates_spaces_and_metadata():
    env = GenericTestEnv()
    wrapped = _NoopWrapper(env)
    assert wrapped.observation_space is env.observation_space
    assert wrapped.action_space is env.action_space
    assert wrapped.metadata == env.metadata
    assert wrapped.unwrapped is env


def test_wrapper_space_override_is_sticky():
    wrapped = _NoopWrapper(GenericTestEnv())
    new_space = spaces.Discrete(7)
    wrapped.action_space = new_space
    assert wrapped.action_space is new_space
    assert wrapped.env.action_space is not new_space


def test_wrapper_getattr_falls_through():
    # Reference 1.x removed implicit attribute forwarding: direct access on
    # the wrapper raises; get_wrapper_attr is the supported route.
    env = GenericTestEnv()
    env.custom_attribute = 42
    wrapped = _NoopWrapper(env)
    with pytest.raises(AttributeError):
        wrapped.custom_attribute
    assert wrapped.get_wrapper_attr("custom_attribute") == 42


def test_wrapper_getattr_blocks_private():
    wrapped = _NoopWrapper(GenericTestEnv())
    with pytest.raises(AttributeError):
        wrapped._nonexistent_private


def test_has_get_set_wrapper_attr():
    env = GenericTestEnv()
    env.depth_marker = "inner"
    outer = _NoopWrapper(_NoopWrapper(env))
    assert outer.has_wrapper_attr("depth_marker")
    assert outer.get_wrapper_attr("depth_marker") == "inner"
    outer.set_wrapper_attr("depth_marker", "changed")
    assert env.depth_marker == "changed"
    assert not outer.has_wrapper_attr("never_set")
    with pytest.raises(AttributeError):
        outer.get_wrapper_attr("never_set")


def test_wrapper_np_random_proxies_to_unwrapped():
    env = GenericTestEnv()
    wrapped = _NoopWrapper(env)
    wrapped.reset(seed=77)
    assert env.np_random_seed == 77
    assert wrapped.np_random is env.np_random


def test_wrapper_repr():
    wrapped = _NoopWrapper(GenericTestEnv())
    assert "_NoopWrapper" in repr(wrapped)
    assert "GenericTestEnv" in repr(wrapped)


# --- one-hook wrappers ---------------------------------------------------------


def test_observation_wrapper_hook():
    class PlusOne(ObservationWrapper):
        def observation(self, observation):
            return observation + 1

    env = GenericTestEnv(
        reset_func=lambda self, seed=None, options=None: (np.float32(0.0), {}),
        step_func=lambda self, action: (np.float32(1.0), 0.5, False, False, {}),
    )
    wrapped = PlusOne(env)
    obs, _ = wrapped.reset()
    assert obs == 1.0
    obs, reward, *_ = wrapped.step(0)
    assert obs == 2.0 and reward == 0.5


def test_reward_wrapper_hook():
    class Double(RewardWrapper):
        def reward(self, reward):
            return 2 * reward

    env = GenericTestEnv(
        step_func=lambda self, action: (self.observation_space.sample(), 1.5, False, False, {})
    )
    wrapped = Double(env)
    wrapped.reset()
    _, reward, *_ = wrapped.step(0)
    assert reward == 3.0


def test_action_wrapper_hook():
    seen = []

    class Shift(ActionWrapper):
        def action(self, action):
            return action + 10

    def record_step(self, action):
        seen.append(action)
        return self.observation_space.sample(), 0.0, False, False, {}

    env = GenericTestEnv(step_func=record_step)
    wrapped = Shift(env)
    wrapped.reset()
    wrapped.step(1)
    assert seen == [11]


# --- wrapper spec / RecordConstructorArgs --------------------------------------


def test_spec_appends_wrapper_spec_for_recorded_wrappers():
    env = gym.make("CartPole-v1")
    wrapped = gym.wrappers.ClipAction(gym.make("MountainCarContinuous-v0"))
    spec = wrapped.spec
    assert spec is not None
    assert any(ws.name == "ClipAction" for ws in spec.additional_wrappers)
    env.close()
    wrapped.close()


def test_unrecorded_wrapper_spec_raises_or_skips():
    env = gym.make("CartPole-v1")
    wrapped = _NoopWrapper(env)
    # A wrapper without RecordConstructorArgs cannot be reconstructed;
    # reference core.py:376 raises when building the spec.
    try:
        spec = wrapped.spec
        assert all(ws.name != "_NoopWrapper" for ws in spec.additional_wrappers)
    except Exception:
        pass
    env.close()
