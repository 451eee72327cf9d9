"""save_video / RecordVideo / play / performance harness tests
(coverage pattern: reference tests/utils/test_save_video.py,
tests/wrappers/test_record_video.py, tests/utils/test_play.py)."""

import glob
import os

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu import wrappers
from gymnasium_tpu.utils.performance import benchmark_init, benchmark_step
from gymnasium_tpu.utils.save_video import capped_cubic_video_schedule, save_video

# --- capped cubic schedule ------------------------------------------------------


def test_capped_cubic_schedule():
    # cubes fire below 1000, then every 1000
    fired = [i for i in range(30) if capped_cubic_video_schedule(i)]
    assert fired == [0, 1, 8, 27]
    assert capped_cubic_video_schedule(1000)
    assert capped_cubic_video_schedule(2000)
    assert not capped_cubic_video_schedule(1500)


# --- save_video --------------------------------------------------------------


def _frames(n=12):
    return [np.zeros((32, 32, 3), dtype=np.uint8) + i for i in range(n)]


def test_save_video_episode_trigger(tmp_path):
    save_video(
        _frames(),
        str(tmp_path),
        episode_trigger=lambda e: e == 0,
        fps=30,
        episode_index=0,
    )
    files = glob.glob(str(tmp_path / "rl-video-episode-0.*"))
    assert files, "no video artifact written"


def test_save_video_step_trigger(tmp_path):
    save_video(
        _frames(10),
        str(tmp_path),
        step_trigger=lambda s: s % 5 == 0,
        video_length=5,
        step_starting_index=0,
    )
    files = sorted(os.path.basename(f) for f in glob.glob(str(tmp_path / "*")))
    assert any("step-0" in f for f in files)
    assert any("step-5" in f for f in files)


def test_save_video_untriggered_writes_nothing(tmp_path):
    save_video(_frames(), str(tmp_path), episode_trigger=lambda e: False, episode_index=3)
    assert glob.glob(str(tmp_path / "*")) == []


# --- RecordVideo wrapper --------------------------------------------------------


def test_record_video_wrapper(tmp_path):
    env = wrappers.RecordVideo(
        gym.make("CartPole-v1", render_mode="rgb_array", disable_env_checker=True),
        video_folder=str(tmp_path),
        episode_trigger=lambda e: True,
    )
    env.reset(seed=0)
    for _ in range(20):
        _, _, term, trunc, _ = env.step(env.action_space.sample())
        if term or trunc:
            break
    env.close()
    assert glob.glob(str(tmp_path / "*")), "RecordVideo wrote no artifact"


def test_record_video_respects_trigger(tmp_path):
    env = wrappers.RecordVideo(
        gym.make("CartPole-v1", render_mode="rgb_array", disable_env_checker=True),
        video_folder=str(tmp_path),
        episode_trigger=lambda e: False,
    )
    env.reset(seed=0)
    for _ in range(5):
        env.step(env.action_space.sample())
    env.close()
    assert not glob.glob(str(tmp_path / "*.mp4")) and not glob.glob(str(tmp_path / "*.npz"))


# --- performance harness ---------------------------------------------------------


def test_benchmark_step_reports_rate():
    env = gym.make("CartPole-v1", disable_env_checker=True)
    rate = benchmark_step(env, target_duration=0.2, seed=0)
    assert rate > 100  # host CartPole easily exceeds 100 steps/s
    env.close()


def test_benchmark_init_reports_rate():
    rate = benchmark_init(
        lambda: gym.make("CartPole-v1", disable_env_checker=True), target_duration=0.2
    )
    assert rate > 0


# --- play (headless: only the machinery, not the event loop) ---------------------


def test_play_missing_keys_mapping_errors():
    from gymnasium_tpu.utils.play import MissingKeysToAction, play

    env = gym.make("CartPole-v1", render_mode="rgb_array", disable_env_checker=True)
    with pytest.raises((MissingKeysToAction, Exception)):
        # CartPole defines no keys_to_action; play must refuse rather than guess
        play(env, keys_to_action=None, noop=0, _test_no_loop=True)
    env.close()


def test_play_plot_callback():
    from gymnasium_tpu.utils.play import PlayPlot

    saw = []

    def callback(obs_t, obs_tp1, action, rew, terminated, truncated, info):
        saw.append(rew)
        return [rew]

    try:
        plot = PlayPlot(callback, horizon_timesteps=10, plot_names=["reward"])
    except Exception as e:  # matplotlib may be unavailable headless
        pytest.skip(f"PlayPlot unavailable: {e}")
    plot.callback(0, 1, 0, 1.0, False, False, {})
    assert saw == [1.0]


def test_profiler_trace_writes_artifacts(tmp_path):
    """utils.performance.trace wraps jax.profiler (SURVEY.md §5.1)."""
    import glob

    import jax
    import jax.numpy as jnp

    from gymnasium_tpu.utils.performance import trace

    with trace(str(tmp_path)):
        jax.block_until_ready(jax.jit(lambda a: a * 2)(jnp.ones(64)))
    assert glob.glob(str(tmp_path / "**" / "*"), recursive=True), "no trace output"
