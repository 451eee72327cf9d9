"""BipedalWalker device-path smoke test.

The walker's contact/terrain graph takes ~60 s to compile, so this runs only
when GYMTPU_SLOW_TESTS=1 (the capability is registered via jax_entry_point
and exercised here end-to-end)."""

import os

import numpy as np
import pytest

import gymnasium_tpu as gym

pytestmark = pytest.mark.skipif(
    os.environ.get("GYMTPU_SLOW_TESTS") != "1",
    reason="~60s compile; set GYMTPU_SLOW_TESTS=1 to run",
)


@pytest.mark.parametrize("env_id", ["BipedalWalker-v3", "BipedalWalkerHardcore-v3"])
def test_bipedal_jax_vector_mode(env_id):
    envs = gym.make_vec(env_id, num_envs=4, vectorization_mode="jax")
    obs, _ = envs.reset(seed=0)
    assert np.asarray(obs).shape == (4, 24)
    for _ in range(10):
        obs, rewards, terms, truncs, _ = envs.step(envs.action_space.sample())
    assert np.all(np.isfinite(np.asarray(obs)))
    envs.close()
