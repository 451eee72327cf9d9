"""Vectorize adapters + batched vector wrappers + render-mode fallbacks
(coverage pattern: reference tests/wrappers/vector/test_vector_wrappers.py,
tests/envs/registration/test_make render-mode cases)."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu import spaces, wrappers
from gymnasium_tpu.wrappers import vector as vw

# --- vectorize adapters ----------------------------------------------------


def _sync(n=3):
    return gym.make_vec("CartPole-v1", num_envs=n, vectorization_mode="sync")


def test_vectorize_transform_observation():
    envs = vw.VectorizeTransformObservation(
        _sync(),
        wrappers.TransformObservation,
        func=lambda obs: obs * 2.0,
        observation_space=spaces.Box(-np.inf, np.inf, (4,)),
    )
    raw = _sync()
    obs, _ = envs.reset(seed=0)
    raw_obs, _ = raw.reset(seed=0)
    assert np.allclose(obs, raw_obs * 2.0)
    envs.close()
    raw.close()


def test_vectorize_transform_action():
    envs = gym.make_vec("MountainCarContinuous-v0", num_envs=2, vectorization_mode="sync")
    wrapped = vw.VectorizeTransformAction(
        envs,
        wrappers.TransformAction,
        func=lambda a: np.clip(a, -0.5, 0.5),
        action_space=envs.single_action_space,
    )
    wrapped.reset(seed=0)
    out = wrapped.step(np.full((2, 1), 5.0, dtype=np.float32))
    assert len(out) == 5
    wrapped.close()


def test_vectorize_transform_reward():
    envs = vw.VectorizeTransformReward(_sync(), wrappers.TransformReward, func=lambda r: r * 10)
    envs.reset(seed=0)
    _, rewards, *_ = envs.step(envs.action_space.sample())
    assert np.allclose(rewards, 10.0)
    envs.close()


def test_batched_rescale_observation():
    # Pendulum has finite obs bounds (RescaleObservation requires them,
    # reference transform_observation.py:463)
    envs = vw.RescaleObservation(
        gym.make_vec("Pendulum-v1", num_envs=2, vectorization_mode="sync"),
        min_obs=np.float32(-1.0),
        max_obs=np.float32(1.0),
    )
    obs, _ = envs.reset(seed=0)
    assert envs.observation_space.contains(obs)
    assert np.all(np.abs(obs) <= 1.0 + 1e-6)
    envs.close()


def test_rescale_observation_rejects_unbounded():
    with pytest.raises(AssertionError):
        vw.RescaleObservation(_sync(), min_obs=np.float32(-1), max_obs=np.float32(1))


def test_batched_dtype_observation():
    envs = vw.DtypeObservation(_sync(), dtype=np.float64)
    obs, _ = envs.reset(seed=0)
    assert obs.dtype == np.float64
    envs.close()


def test_batched_reshape_observation():
    envs = vw.ReshapeObservation(_sync(), shape=(2, 2))
    obs, _ = envs.reset(seed=0)
    assert obs.shape == (3, 2, 2)
    envs.close()


def test_batched_grayscale_resize_pipeline():
    envs = gym.make_vec(
        "CarRacing-v3", num_envs=2, vectorization_mode="sync", disable_env_checker=True
    )
    wrapped = vw.ResizeObservation(vw.GrayscaleObservation(envs), shape=(32, 32))
    obs, _ = wrapped.reset(seed=0)
    assert obs.shape == (2, 32, 32)
    wrapped.close()


def test_dict_info_to_list():
    envs = vw.DictInfoToList(_sync())
    _, infos = envs.reset(seed=0)
    assert isinstance(infos, list) and len(infos) == 3
    _, _, _, _, infos = envs.step(envs.action_space.sample())
    assert isinstance(infos, list)
    assert all(isinstance(i, dict) for i in infos)
    envs.close()


# --- render-mode fallbacks --------------------------------------------------


def test_rgb_array_list_auto_render_collection():
    env = gym.make("CartPole-v1", render_mode="rgb_array_list")
    env.reset(seed=0)
    env.step(env.action_space.sample())
    frames = env.render()
    assert isinstance(frames, list) and len(frames) >= 1
    assert frames[0].ndim == 3
    env.close()


def test_render_collection_resets_list():
    env = gym.make("CartPole-v1", render_mode="rgb_array_list")
    env.reset(seed=0)
    env.step(env.action_space.sample())
    first = env.render()
    env.reset()
    env.step(env.action_space.sample())
    second = env.render()
    # default pop_frames empties the buffer each render call
    assert len(second) >= 1
    env.close()


def test_invalid_render_mode_warns():
    # reference behavior: make() warns but constructs (no raise)
    import warnings as w

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        env = gym.make("CartPole-v1", render_mode="holodeck")
    assert any("render_mode" in str(c.message) for c in caught)
    env.close()


def test_render_without_mode_warns_and_returns_none():
    env = gym.make("CartPole-v1")
    env.reset(seed=0)
    import warnings as w

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        out = env.unwrapped.render()
    assert out is None
    env.close()
