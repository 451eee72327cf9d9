"""Reward decomposition per robot: reward == sum of its info components
(coverage pattern: reference tests/envs/mujoco/test_mujoco_v5.py reward tests)."""

import numpy as np
import pytest

import gymnasium_tpu as gym

DECOMPOSED = {
    "HalfCheetah-v5": ("reward_forward", "reward_ctrl"),
    "Hopper-v5": ("reward_forward", "reward_ctrl", "reward_survive"),
    "Walker2d-v5": ("reward_forward", "reward_ctrl", "reward_survive"),
    "Swimmer-v5": ("reward_forward", "reward_ctrl"),
    "Ant-v5": ("reward_forward", "reward_ctrl", "reward_contact", "reward_survive"),
}


@pytest.mark.parametrize("env_id", sorted(DECOMPOSED))
def test_reward_equals_component_sum(env_id):
    env = gym.make(env_id).unwrapped
    env.reset(seed=0)
    for _ in range(10):
        a = env.action_space.sample()
        _, reward, term, trunc, info = env.step(a)
        total = sum(info[k] for k in DECOMPOSED[env_id] if k in info)
        assert reward == pytest.approx(total, abs=1e-6), (
            f"{env_id}: reward {reward} != sum(components) {total} ({info})"
        )
        if term or trunc:
            break
    env.close()


@pytest.mark.parametrize("env_id", sorted(DECOMPOSED))
def test_ctrl_cost_nonpositive_and_quadratic(env_id):
    env = gym.make(env_id).unwrapped
    env.reset(seed=0)
    zero = np.zeros(env.action_space.shape, dtype=np.float32)
    _, _, _, _, info = env.step(zero)
    assert info["reward_ctrl"] == 0.0, f"{env_id}: zero action must cost nothing"
    big = np.ones(env.action_space.shape, dtype=np.float32)
    _, _, _, _, info = env.step(big)
    assert info["reward_ctrl"] < 0.0
    env.close()


@pytest.mark.parametrize("env_id", ["Hopper-v5", "Walker2d-v5", "Ant-v5"])
def test_terminate_when_unhealthy_flag(env_id):
    env = gym.make(env_id, terminate_when_unhealthy=False).unwrapped
    env.reset(seed=0)
    for _ in range(100):
        _, _, terminated, _, _ = env.step(env.action_space.sample())
        assert not terminated, f"{env_id}: must not terminate with flag off"
    env.close()


def test_halfcheetah_never_terminates():
    env = gym.make("HalfCheetah-v5").unwrapped
    env.reset(seed=0)
    for _ in range(100):
        _, _, terminated, _, _ = env.step(env.action_space.sample())
        assert not terminated
    env.close()


@pytest.mark.parametrize("env_id", ["Reacher-v5", "Pusher-v5"])
def test_manipulation_reward_components(env_id):
    env = gym.make(env_id).unwrapped
    env.reset(seed=0)
    _, reward, _, _, info = env.step(np.zeros(env.action_space.shape, np.float32))
    keys = [k for k in info if k.startswith("reward_")]
    assert keys, f"{env_id}: no reward components in info"
    assert reward == pytest.approx(sum(info[k] for k in keys), abs=1e-6)
    env.close()


def test_forward_reward_weight_scales():
    base = gym.make("HalfCheetah-v5").unwrapped
    double = gym.make("HalfCheetah-v5", forward_reward_weight=2.0).unwrapped
    base.reset(seed=0)
    double.reset(seed=0)
    a = np.zeros(base.action_space.shape, np.float32)
    *_, info_b = base.step(a)
    *_, info_d = double.step(a)
    assert info_d["reward_forward"] == pytest.approx(2 * info_b["reward_forward"], rel=1e-6)
