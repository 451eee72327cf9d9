"""Hand-written dynamics assertions per env family
(coverage pattern: reference tests/envs/test_env_implementation.py)."""

import numpy as np
import pytest

import gymnasium_tpu as gym

# --- CartPole ----------------------------------------------------------------


def test_cartpole_termination_bounds():
    env = gym.make("CartPole-v1").unwrapped
    env.reset(seed=0)
    # drive the cart right until |x| > 2.4 terminates
    terminated = False
    for _ in range(500):
        _, _, terminated, _, _ = env.step(1)
        if terminated:
            break
    assert terminated
    x, _, theta, _ = env.state
    assert abs(x) > 2.4 or abs(theta) > 12 * np.pi / 180
    env.close()


def test_cartpole_sutton_barto_reward():
    # reference cartpole supports sutton_barto_reward=True: 0 living, -1 on termination
    try:
        env = gym.make("CartPole-v1", sutton_barto_reward=True).unwrapped
    except TypeError:
        pytest.skip("sutton_barto_reward not supported")
    env.reset(seed=0)
    _, r, term, *_ = env.step(1)
    assert r == 0.0 or term
    env.close()


def test_cartpole_state_is_float64_obs_float32():
    env = gym.make("CartPole-v1").unwrapped
    obs, _ = env.reset(seed=0)
    assert obs.dtype == np.float32
    obs, *_ = env.step(0)
    assert obs.dtype == np.float32


# --- MountainCar -------------------------------------------------------------


def test_mountain_car_goal_terminates():
    env = gym.make("MountainCar-v0").unwrapped
    env.reset(seed=0)
    # place the car just below the goal moving right
    env.state = np.array([0.49, 0.05])
    _, reward, terminated, _, _ = env.step(2)
    assert terminated
    assert reward == -1.0
    env.close()


def test_mountain_car_velocity_clipped():
    env = gym.make("MountainCar-v0").unwrapped
    env.reset(seed=0)
    for _ in range(200):
        env.step(2)
        assert abs(env.state[1]) <= 0.07 + 1e-12
    env.close()


def test_mountain_car_continuous_action_scale():
    env = gym.make("MountainCarContinuous-v0").unwrapped
    env.reset(seed=0)
    env.state = np.array([-0.5, 0.0])
    _, r, *_ = env.step(np.array([1.0], dtype=np.float32))
    # control cost: reward -= 0.1 * action^2
    assert r < 0
    env.close()


# --- Pendulum ----------------------------------------------------------------


def test_pendulum_obs_is_cos_sin_thetadot():
    env = gym.make("Pendulum-v1").unwrapped
    obs, _ = env.reset(seed=0)
    cos_t, sin_t, _ = obs
    assert abs(cos_t**2 + sin_t**2 - 1.0) < 1e-5


def test_pendulum_reward_upper_bound():
    env = gym.make("Pendulum-v1").unwrapped
    env.reset(seed=0)
    for _ in range(20):
        _, r, *_ = env.step(env.action_space.sample())
        assert r <= 0.0  # cost-based reward is never positive
    env.close()


def test_pendulum_torque_clipped():
    env = gym.make("Pendulum-v1").unwrapped
    env.reset(seed=0)
    env.step(np.array([100.0], dtype=np.float32))  # must clip, not explode
    assert abs(env.state[1]) <= 8.0 + 1e-9
    env.close()


# --- Acrobot -----------------------------------------------------------------


def test_acrobot_reward_minus_one_until_goal():
    env = gym.make("Acrobot-v1")
    env.reset(seed=0)
    for _ in range(50):
        _, r, term, trunc, _ = env.step(env.action_space.sample())
        if term:
            break
        assert r == -1.0
    env.close()


def test_acrobot_velocity_bounds():
    env = gym.make("Acrobot-v1").unwrapped
    env.reset(seed=1)
    for _ in range(200):
        env.step(2)
        assert abs(env.state[2]) <= 4 * np.pi + 1e-9
        assert abs(env.state[3]) <= 9 * np.pi + 1e-9
    env.close()


# --- FrozenLake --------------------------------------------------------------


def test_frozen_lake_hole_terminates_zero_reward():
    env = gym.make("FrozenLake-v1", is_slippery=False).unwrapped
    env.reset(seed=0)
    # default 4x4 map: S at 0, hole at 5; path: RIGHT then DOWN -> 5
    env.s = 1
    obs, reward, terminated, _, _ = env.step(1)  # DOWN onto the hole at 5
    assert terminated and reward == 0.0
    env.close()


def test_frozen_lake_goal_rewards_one():
    env = gym.make("FrozenLake-v1", is_slippery=False).unwrapped
    env.reset(seed=0)
    env.s = 14
    obs, reward, terminated, _, _ = env.step(2)  # RIGHT onto goal 15
    assert terminated and reward == 1.0
    env.close()


def test_frozen_lake_deterministic_when_not_slippery():
    env = gym.make("FrozenLake-v1", is_slippery=False).unwrapped
    env.reset(seed=0)
    obs, *_ = env.step(2)
    assert obs == 1
    env.close()


# --- Taxi --------------------------------------------------------------------


def test_taxi_illegal_pickup_penalty():
    env = gym.make("Taxi-v3").unwrapped
    env.reset(seed=0)
    _, reward, *_ = env.step(4)  # pickup with no passenger here (almost surely)
    assert reward in (-10.0, -1.0)
    env.close()


def test_taxi_action_mask_in_info():
    env = gym.make("Taxi-v3").unwrapped
    _, info = env.reset(seed=0)
    if "action_mask" not in info:
        pytest.skip("action_mask not implemented")
    assert info["action_mask"].shape == (6,)


# --- Blackjack ---------------------------------------------------------------


def test_blackjack_obs_structure():
    env = gym.make("Blackjack-v1")
    obs, _ = env.reset(seed=0)
    player, dealer, usable = obs
    assert 4 <= player <= 21
    assert 1 <= dealer <= 10
    assert usable in (0, 1)
    env.close()


def test_blackjack_stick_ends_episode():
    env = gym.make("Blackjack-v1")
    env.reset(seed=0)
    _, reward, terminated, _, _ = env.step(0)  # stick
    assert terminated
    assert reward in (-1.0, 0.0, 1.0, 1.5)
    env.close()


# --- action validation --------------------------------------------------------


@pytest.mark.parametrize("env_id", ["CartPole-v1", "FrozenLake-v1"])
def test_out_of_range_discrete_action_rejected(env_id):
    env = gym.make(env_id)
    env.reset(seed=0)
    with pytest.raises(Exception):
        env.step(99)
    env.close()
