"""Native (C++) tabular stepper tests: build, semantics vs Python fallback."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu.envs.toy_text.frozen_lake import MAPS, build_frozen_lake_model
from gymnasium_tpu.native import TabularBatchStepper, tabular_library


def test_native_matches_python_fallback():
    model = build_frozen_lake_model(np.asarray(MAPS["4x4"], dtype="c"), is_slippery=True)
    stepper = TabularBatchStepper(model)

    n = 64
    rng = np.random.default_rng(0)
    states_a = np.zeros(n, dtype=np.int32)
    states_b = states_a.copy()

    for _ in range(50):
        actions = rng.integers(0, 4, n).astype(np.int32)
        uniforms = rng.random(n)

        # python fallback path (force lib=None on a shallow copy)
        py = TabularBatchStepper(model)
        py.lib = None
        r_b, t_b = py.step(states_b, actions, uniforms.copy())

        if stepper.is_native:
            r_a, t_a = stepper.step(states_a, actions, uniforms.copy())
            np.testing.assert_array_equal(states_a, states_b)
            np.testing.assert_array_equal(r_a, r_b)
            np.testing.assert_array_equal(t_a, t_b)
        else:
            states_a = states_b.copy()


def test_native_vector_env_runs():
    env = gym.make_vec("FrozenLake-v1", num_envs=32, vectorization_mode="vector_entry_point")
    obs, _ = env.reset(seed=0)
    assert obs.shape == (32,)
    total_term = 0
    for _ in range(200):
        obs, r, te, tr, _ = env.step(np.random.randint(0, 4, 32))
        total_term += te.sum()
        assert np.all(obs < 16)
    assert total_term > 0  # episodes do end


def test_native_matches_host_distribution():
    """Native batched CliffWalking matches the host env's reward stats."""
    n_steps = 3000
    env = gym.make_vec("CliffWalking-v1", num_envs=16, vectorization_mode="vector_entry_point")
    env.reset(seed=0)
    rng = np.random.default_rng(1)
    native_rewards = []
    for _ in range(n_steps // 16):
        _, r, te, tr, _ = env.step(rng.integers(0, 4, 16))
        native_rewards.extend(r.tolist())

    host = gym.make("CliffWalking-v1", disable_env_checker=True)
    host.reset(seed=0)
    host_rewards = []
    for i in range(n_steps):
        _, r, te, tr, _ = host.step(int(rng.integers(4)))
        host_rewards.append(float(r))
        if te or tr:
            host.reset()
    assert np.isclose(np.mean(native_rewards), np.mean(host_rewards), rtol=0.3)


def test_build_from_source(tmp_path):
    """The C++ stepper rebuilds from source with the system toolchain
    (cache defeated by copying the source into a temp package dir)."""
    import ctypes
    import shutil

    from gymnasium_tpu.native import build as build_mod

    src = shutil.copy(
        build_mod._DIR + "/tabular.cpp", tmp_path / "tabular_copy.cpp"
    )
    old_dir = build_mod._DIR
    try:
        build_mod._DIR = str(tmp_path)
        lib = build_mod.build_library("tabular_rebuild", ["tabular_copy.cpp"])
    finally:
        build_mod._DIR = old_dir
    assert isinstance(lib, ctypes.CDLL)
    assert hasattr(lib, "tabular_step_batch")
