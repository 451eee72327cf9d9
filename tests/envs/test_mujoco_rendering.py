"""MuJoCo-family 3D rendering (render3d.py — the OffScreenViewer role,
reference mujoco_rendering.py:334).

"Non-schematic" is checked structurally: a real 3D render has hundreds of
distinct shaded colors (lit primitives + checkerboard floor + sky gradient),
while the old schematic side view drew a handful of flat colors.
"""

import numpy as np
import pytest

import gymnasium_tpu as gym

ROBOTS = [
    "InvertedPendulum-v5",
    "InvertedDoublePendulum-v5",
    "Reacher-v5",
    "Pusher-v5",
    "HalfCheetah-v5",
    "Hopper-v5",
    "Swimmer-v5",
    "Walker2d-v5",
    "Ant-v5",
    "Humanoid-v5",
    "HumanoidStandup-v5",
]


@pytest.mark.parametrize("env_id", ROBOTS)
def test_rgb_array_frames_are_3d_renders(env_id):
    env = gym.make(env_id, render_mode="rgb_array", disable_env_checker=True)
    env.reset(seed=0)
    frame = env.render()
    assert isinstance(frame, np.ndarray) and frame.shape == (480, 480, 3)
    assert frame.dtype == np.uint8
    colors = len(np.unique(frame.reshape(-1, 3), axis=0))
    assert colors > 100, f"{env_id}: only {colors} colors — schematic, not a 3D render"
    # frames must track the state: step and compare
    env.step(env.action_space.sample())
    frame2 = env.render()
    assert not np.array_equal(frame, frame2), f"{env_id}: render ignores state"
    env.close()


def test_record_video_on_mujoco(tmp_path):
    from gymnasium_tpu.wrappers import RecordVideo

    env = gym.make("Ant-v5", render_mode="rgb_array", disable_env_checker=True)
    env = RecordVideo(
        env, str(tmp_path), episode_trigger=lambda e: e == 0, disable_logger=True
    )
    env.reset(seed=0)
    for _ in range(5):
        _, _, term, trunc, _ = env.step(env.action_space.sample())
        if term or trunc:
            break
    env.close()
    files = list(tmp_path.iterdir())
    assert files, "RecordVideo produced no output for a MuJoCo env"
