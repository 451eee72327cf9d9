"""Deeper per-wrapper behavioral tests: edge semantics the catalog smoke tests
don't cover (coverage pattern: reference tests/wrappers/test_*.py)."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu import spaces, wrappers
from gymnasium_tpu.utils.data_equivalence import data_equivalence
from tests.testing_env import GenericTestEnv


def _const_env(obs_value=0.5, reward=1.0, terminate_at=None):
    """Env emitting a constant obs/reward; terminates after `terminate_at` steps."""
    counter = {"t": 0}

    def reset_func(self, *, seed=None, options=None):
        super(GenericTestEnv, self).reset(seed=seed)
        counter["t"] = 0
        return np.array([obs_value], dtype=np.float32), {}

    def step_func(self, action):
        counter["t"] += 1
        term = terminate_at is not None and counter["t"] >= terminate_at
        return np.array([obs_value], dtype=np.float32), reward, term, False, {}

    return GenericTestEnv(
        observation_space=spaces.Box(-np.inf, np.inf, (1,)),
        reset_func=reset_func,
        step_func=step_func,
    )


# --- TimeLimit ----------------------------------------------------------------


def test_time_limit_truncates_not_terminates():
    env = wrappers.TimeLimit(_const_env(), max_episode_steps=3)
    env.reset(seed=0)
    for i in range(2):
        _, _, term, trunc, _ = env.step(0)
        assert not term and not trunc
    _, _, term, trunc, _ = env.step(0)
    assert not term and trunc


def test_time_limit_resets_counter():
    env = wrappers.TimeLimit(_const_env(), max_episode_steps=2)
    env.reset(seed=0)
    env.step(0)
    env.reset()
    _, _, _, trunc, _ = env.step(0)
    assert not trunc


def test_time_limit_termination_beats_truncation():
    env = wrappers.TimeLimit(_const_env(terminate_at=2), max_episode_steps=2)
    env.reset(seed=0)
    env.step(0)
    _, _, term, trunc, _ = env.step(0)
    assert term  # env terminated on the same step the limit hit
    # reference TimeLimit still marks truncated=True only if not terminated first;
    # both True is also valid per the 5-tuple API — just require term is True.


# --- Autoreset ----------------------------------------------------------------


def test_autoreset_next_step_semantics():
    env = wrappers.Autoreset(_const_env(terminate_at=1))
    obs0, _ = env.reset(seed=0)
    obs1, reward1, term1, trunc1, _ = env.step(0)
    assert term1  # the terminal step passes through
    # next step must be a reset: reward 0, not terminated
    obs2, reward2, term2, trunc2, _ = env.step(0)
    assert reward2 == 0.0 and not term2 and not trunc2
    assert data_equivalence(obs2, obs0)


# --- OrderEnforcing -----------------------------------------------------------


def test_order_enforcing_blocks_step_before_reset():
    env = wrappers.OrderEnforcing(_const_env())
    with pytest.raises(Exception):
        env.step(0)
    env.reset()
    env.step(0)  # fine after reset


def test_order_enforcing_has_reset_flag():
    env = wrappers.OrderEnforcing(_const_env())
    assert not env.has_reset
    env.reset()
    assert env.has_reset


# --- PassiveEnvChecker ----------------------------------------------------------


def test_passive_checker_deprecation_on_old_step_tuple():
    # 4-tuple = old done-API: passive checker warns but passes through
    # (reference passive_env_checker.py:203 deprecation branch)
    def old_step(self, action):
        return self.observation_space.sample(), 1.0, False, {}

    env = wrappers.PassiveEnvChecker(GenericTestEnv(step_func=old_step))
    env.reset()
    import warnings as w

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        result = env.step(env.action_space.sample())
    assert len(result) == 4
    assert any(issubclass(c.category, DeprecationWarning) for c in caught)


def test_passive_checker_rejects_wrong_arity_step():
    def bad_step(self, action):
        return self.observation_space.sample(), 1.0  # 2-tuple: invalid in any API

    env = wrappers.PassiveEnvChecker(GenericTestEnv(step_func=bad_step))
    env.reset()
    with pytest.raises(Exception):
        env.step(env.action_space.sample())


def test_passive_checker_passes_good_env():
    env = wrappers.PassiveEnvChecker(GenericTestEnv())
    env.reset(seed=0)
    env.step(env.action_space.sample())


# --- RecordEpisodeStatistics -----------------------------------------------------


def test_record_episode_statistics_totals():
    env = wrappers.RecordEpisodeStatistics(
        wrappers.TimeLimit(_const_env(reward=2.0), max_episode_steps=4)
    )
    env.reset(seed=0)
    info = {}
    for _ in range(4):
        _, _, term, trunc, info = env.step(0)
    assert "episode" in info
    assert info["episode"]["r"] == pytest.approx(8.0)
    assert info["episode"]["l"] == 4
    assert info["episode"]["t"] >= 0
    assert len(env.return_queue) == 1
    assert float(env.return_queue[0]) == pytest.approx(8.0)
    assert int(env.length_queue[0]) == 4


def test_record_episode_statistics_no_info_midepisode():
    env = wrappers.RecordEpisodeStatistics(wrappers.TimeLimit(_const_env(), max_episode_steps=5))
    env.reset(seed=0)
    _, _, _, _, info = env.step(0)
    assert "episode" not in info


# --- TransformObservation / TransformAction --------------------------------------


def test_transform_observation_applies_func():
    env = wrappers.TransformObservation(
        _const_env(obs_value=1.0),
        func=lambda obs: obs * 10,
        observation_space=spaces.Box(-np.inf, np.inf, (1,)),
    )
    obs, _ = env.reset(seed=0)
    assert obs[0] == 10.0
    obs, *_ = env.step(0)
    assert obs[0] == 10.0


def test_transform_action_applies_func():
    received = []

    def record_step(self, action):
        received.append(action)
        return self.observation_space.sample(), 0.0, False, False, {}

    env = GenericTestEnv(
        action_space=spaces.Box(-1.0, 1.0, (1,)), step_func=record_step
    )
    wrapped = wrappers.TransformAction(
        env, func=lambda a: a * 2, action_space=spaces.Box(-2.0, 2.0, (1,))
    )
    wrapped.reset()
    wrapped.step(np.array([0.5], dtype=np.float32))
    assert received[0][0] == 1.0


# --- NormalizeObservation freeze -------------------------------------------------


def test_normalize_observation_freezing():
    env = wrappers.NormalizeObservation(make_random_walk_env())
    env.reset(seed=0)
    for _ in range(20):
        env.step(0)
    env.update_running_mean = False
    mean_before = env.obs_rms.mean.copy()
    for _ in range(10):
        env.step(0)
    assert np.array_equal(env.obs_rms.mean, mean_before)


def make_random_walk_env():
    def step_func(self, action):
        return self.np_random.normal(size=(1,)).astype(np.float32), 0.0, False, False, {}

    return GenericTestEnv(
        observation_space=spaces.Box(-np.inf, np.inf, (1,)), step_func=step_func
    )


# --- FrameStackObservation padding ------------------------------------------------


def test_frame_stack_reset_padding():
    env = wrappers.FrameStackObservation(_const_env(obs_value=3.0), stack_size=4)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (4, 1)
    # 'reset' padding repeats the reset obs
    assert np.all(obs == 3.0)


def test_frame_stack_zero_padding():
    env = wrappers.FrameStackObservation(
        _const_env(obs_value=3.0), stack_size=3, padding_type="zero"
    )
    obs, _ = env.reset(seed=0)
    assert np.all(obs[:-1] == 0.0) and np.all(obs[-1] == 3.0)


def test_frame_stack_rolls_forward():
    values = iter([1.0, 2.0, 3.0])

    def step_func(self, action):
        return np.array([next(values)], dtype=np.float32), 0.0, False, False, {}

    env = GenericTestEnv(
        observation_space=spaces.Box(-np.inf, np.inf, (1,)), step_func=step_func
    )
    stacked = wrappers.FrameStackObservation(env, stack_size=2)
    stacked.reset(seed=0)
    obs, *_ = stacked.step(0)
    assert obs[-1][0] == 1.0
    obs, *_ = stacked.step(0)
    assert obs[0][0] == 1.0 and obs[1][0] == 2.0


# --- DelayObservation / MaxAndSkip -----------------------------------------------


def test_delay_observation_initial_zeros():
    env = wrappers.DelayObservation(_const_env(obs_value=5.0), delay=2)
    obs, _ = env.reset(seed=0)
    assert np.all(obs == 0.0)
    obs, *_ = env.step(0)
    assert np.all(obs == 0.0)
    obs, *_ = env.step(0)
    assert np.all(obs == 5.0)


def test_max_and_skip_accumulates_reward():
    env = wrappers.MaxAndSkipObservation(_const_env(reward=1.0), skip=4)
    env.reset(seed=0)
    _, reward, *_ = env.step(0)
    assert reward == 4.0


# --- AddRenderObservation ---------------------------------------------------------


def test_add_render_observation_pixels_only():
    env = gym.make("CartPole-v1", render_mode="rgb_array", disable_env_checker=True)
    wrapped = wrappers.AddRenderObservation(env, render_only=True)
    obs, _ = wrapped.reset(seed=0)
    assert isinstance(obs, np.ndarray) and obs.ndim == 3 and obs.shape[2] == 3
    wrapped.close()


def test_add_render_observation_dict_mode():
    env = gym.make("CartPole-v1", render_mode="rgb_array", disable_env_checker=True)
    wrapped = wrappers.AddRenderObservation(env, render_only=False)
    obs, _ = wrapped.reset(seed=0)
    assert set(obs.keys()) == {"state", "pixels"}
    assert obs["state"].shape == (4,)
    wrapped.close()


# --- noise / obstruction wrappers --------------------------------------------------


def test_add_white_noise_changes_pixels():
    env = gym.make("CartPole-v1", render_mode="rgb_array", disable_env_checker=True)
    noisy = wrappers.AddWhiteNoise(env, probability_of_noise_per_pixel=0.5)
    noisy.reset(seed=0)
    frame = noisy.render()
    clean_env = gym.make("CartPole-v1", render_mode="rgb_array", disable_env_checker=True)
    clean_env.reset(seed=0)
    clean = clean_env.render()
    assert frame.shape == clean.shape
    assert not np.array_equal(frame, clean)
    noisy.close()
    clean_env.close()


def test_obstruct_view_changes_pixels():
    env = gym.make("CartPole-v1", render_mode="rgb_array", disable_env_checker=True)
    obstructed = wrappers.ObstructView(
        env, obstructed_pixels_ratio=0.5, obstruction_width=20
    )
    obstructed.reset(seed=0)
    frame = obstructed.render()
    assert frame is not None and frame.ndim == 3
    obstructed.close()


# --- StickyAction repeat probability ----------------------------------------------


def test_sticky_action_repeats():
    received = []

    def record_step(self, action):
        received.append(int(action))
        return self.observation_space.sample(), 0.0, False, False, {}

    env = GenericTestEnv(action_space=spaces.Discrete(10), step_func=record_step)
    sticky = wrappers.StickyAction(env, repeat_action_probability=0.0)
    sticky.reset(seed=0)
    sticky.step(1)
    sticky.step(2)
    sticky.step(3)
    # p=0 never repeats: the chosen actions pass through unchanged
    assert received == [1, 2, 3]


def test_sticky_action_rejects_p_of_one():
    # probability must be in [0, 1) (reference stateful_action.py:16)
    env = GenericTestEnv(action_space=spaces.Discrete(3))
    with pytest.raises(Exception):
        wrappers.StickyAction(env, repeat_action_probability=1.0)


def test_sticky_action_statistical_repeat():
    received = []

    def record_step(self, action):
        received.append(int(action))
        return self.observation_space.sample(), 0.0, False, False, {}

    env = GenericTestEnv(action_space=spaces.Discrete(1000), step_func=record_step)
    sticky = wrappers.StickyAction(env, repeat_action_probability=0.9)
    sticky.reset(seed=0)
    for i in range(200):
        sticky.step(i)
    repeats = sum(1 for a, b in zip(received, received[1:]) if a == b)
    assert repeats > 120  # ~90% expected; far above chance for 1000 actions
