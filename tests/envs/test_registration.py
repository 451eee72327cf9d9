"""Registration layer tests (pattern: reference tests/envs/registration/)."""

import pytest

import gymnasium_tpu as gym
from gymnasium_tpu import error
from gymnasium_tpu.envs.registration import (
    EnvSpec,
    VectorizeMode,
    WrapperSpec,
    find_highest_version,
    get_env_id,
    namespace,
    parse_env_id,
    register,
    registry,
    spec,
)


def test_parse_env_id():
    assert parse_env_id("CartPole-v1") == (None, "CartPole", 1)
    assert parse_env_id("phys2d/CartPole-v0") == ("phys2d", "CartPole", 0)
    assert parse_env_id("Taxi") == (None, "Taxi", None)
    with pytest.raises(error.Error):
        parse_env_id("not/valid/id-v1!!!")


def test_get_env_id_roundtrip():
    for env_id in ("CartPole-v1", "phys2d/Pendulum-v0", "Blackjack-v1"):
        assert get_env_id(*parse_env_id(env_id)) == env_id


def test_find_highest_version():
    assert find_highest_version(None, "CartPole") == 1
    assert find_highest_version("tabular", "Blackjack") == 0


def test_spec_json_roundtrip():
    env_spec = spec("CartPole-v1")
    restored = EnvSpec.from_json(env_spec.to_json())
    assert restored.id == env_spec.id
    assert restored.max_episode_steps == env_spec.max_episode_steps
    assert restored.reward_threshold == env_spec.reward_threshold


def test_make_resolves_latest_version():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        env = gym.make("CartPole")
    assert env.spec.id == "CartPole-v1"
    env.close()


def test_make_unknown_env_errors():
    with pytest.raises(error.UnregisteredEnv):
        gym.make("DefinitelyNotAnEnv-v0")
    with pytest.raises(error.NamespaceNotFound):
        gym.make("nope/CartPole-v1")
    with pytest.raises(error.VersionNotFound):
        gym.make("CartPole-v99")


def test_make_applies_wrapper_onion():
    from gymnasium_tpu.wrappers.common import OrderEnforcing, PassiveEnvChecker, TimeLimit

    env = gym.make("CartPole-v1")
    # outermost TimeLimit > OrderEnforcing > PassiveEnvChecker > env
    assert isinstance(env, TimeLimit)
    assert isinstance(env.env, OrderEnforcing)
    assert isinstance(env.env.env, PassiveEnvChecker)
    env.close()
    env = gym.make("CartPole-v1", disable_env_checker=True)
    assert isinstance(env.env, OrderEnforcing)
    assert not isinstance(env.env.env, PassiveEnvChecker)
    env.close()


def test_make_max_episode_steps_override():
    env = gym.make("CartPole-v1", max_episode_steps=7)
    env.reset(seed=0)
    for i in range(7):
        _, _, te, tr, _ = env.step(0)
        if te:
            break
    assert tr or te
    env.close()


def test_register_namespace_context():
    with namespace("testns"):
        register(id="Dummy-v0", entry_point="tests.testing_env:GenericTestEnv")
    assert "testns/Dummy-v0" in registry
    env = gym.make("testns/Dummy-v0", disable_env_checker=True)
    env.close()
    del registry["testns/Dummy-v0"]


def test_additional_wrappers_reconstruction():
    wrapper_spec = WrapperSpec(
        name="TimeLimit",
        entry_point="gymnasium_tpu.wrappers.common:TimeLimit",
        kwargs={"max_episode_steps": 3},
    )
    register(
        id="WrappedDummy-v0",
        entry_point="tests.testing_env:GenericTestEnv",
        additional_wrappers=(wrapper_spec,),
    )
    try:
        env = gym.make("WrappedDummy-v0", disable_env_checker=True)
        env.reset()
        for _ in range(3):
            _, _, te, tr, _ = env.step(env.action_space.sample())
        assert tr
        env.close()
    finally:
        del registry["WrappedDummy-v0"]


def test_make_vec_modes():
    for mode in ("sync", "async", "vector_entry_point", "jax"):
        env = gym.make_vec("CartPole-v1", num_envs=2, vectorization_mode=mode)
        obs, _ = env.reset(seed=0)
        assert tuple(obs.shape) == (2, 4)
        env.close()


def test_make_vec_invalid_mode():
    with pytest.raises(error.Error):
        gym.make_vec("CartPole-v1", num_envs=2, vectorization_mode="bogus")


def test_pprint_registry():
    output = gym.pprint_registry(disable_print=True)
    assert "CartPole-v1" in output
    assert "tabular" in output


def test_wrapper_spec_in_env_spec():
    from gymnasium_tpu.wrappers import ClipReward

    env = gym.make("CartPole-v1")
    wrapped = ClipReward(env, max_reward=0.5)
    assert wrapped.spec is not None
    names = [w.name for w in wrapped.spec.additional_wrappers]
    assert "ClipReward" in names
    env.close()
