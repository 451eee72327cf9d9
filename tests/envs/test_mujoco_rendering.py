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


@pytest.mark.parametrize("env_id", ["Ant-v5", "HalfCheetah-v5"])
def test_depth_array_render_mode(env_id):
    """depth_array from the rasterizer's z-buffer (reference ant_v5.py:223)."""
    env = gym.make(env_id, render_mode="depth_array", disable_env_checker=True)
    env.reset(seed=0)
    depth = env.render()
    assert isinstance(depth, np.ndarray) and depth.shape == (480, 480)
    assert depth.dtype == np.float32 and np.isfinite(depth).all()
    # the robot must be closer than the sky/far plane
    assert depth.min() < depth.max()
    env.step(env.action_space.sample())
    depth2 = env.render()
    assert not np.array_equal(depth, depth2), "depth render ignores state"
    env.close()


def test_rgbd_tuple_render_mode():
    env = gym.make("Hopper-v5", render_mode="rgbd_tuple", disable_env_checker=True)
    env.reset(seed=0)
    rgb, depth = env.render()
    assert rgb.shape == (480, 480, 3) and rgb.dtype == np.uint8
    assert depth.shape == (480, 480) and depth.dtype == np.float32
    env.close()


def test_render_size_and_camera_kwargs():
    """width/height/camera kwargs (reference mujoco_env.py:46-113)."""
    env = gym.make(
        "Ant-v5",
        render_mode="rgb_array",
        width=128,
        height=96,
        default_camera_config={"distance": 6.0, "azimuth": 90.0, "elevation": -10.0},
        camera_name="track",
        disable_env_checker=True,
    )
    env.reset(seed=0)
    frame = env.render()
    assert frame.shape == (96, 128, 3)
    env.close()

    # both camera selectors at once is an error, as in the reference
    with pytest.raises(AssertionError):
        gym.make(
            "Ant-v5",
            render_mode="rgb_array",
            camera_id=0,
            camera_name="track",
            disable_env_checker=True,
        )


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


def test_mujoco_renderer_manager_surface():
    """env.mujoco_renderer mirrors the reference's renderer manager
    (mujoco_rendering.py:685): per-mode viewers, add_overlay, live cam."""
    import gymnasium_tpu as gym
    from gymnasium_tpu.envs.mujoco.rendering import GRID_TOPLEFT

    env = gym.make("Ant-v5", render_mode="rgb_array").unwrapped
    env.reset(seed=0)
    renderer = env.mujoco_renderer
    base = renderer.render("rgb_array")
    assert base.shape == (480, 480, 3)

    # overlays are drawn into the frame and cleared afterwards
    viewer = renderer._get_viewer("rgb_array")
    viewer.add_overlay(GRID_TOPLEFT, "Step", "123")
    with_overlay = renderer.render("rgb_array")
    try:
        import pygame  # noqa: F401

        assert (with_overlay != base).any(), "overlay text did not change the frame"
    except ImportError:
        pass
    again = renderer.render("rgb_array")
    assert (again == base).all(), "overlay queue must clear after one frame"

    # live camera edits steer the tracking camera
    viewer.cam.azimuth = 125.0
    viewer.cam.elevation = -5.0
    moved = renderer.render("rgb_array")
    assert (moved != base).any(), "camera change did not alter the view"

    # depth mode routes through the same manager
    depth = renderer.render("depth_array")
    assert depth.shape == (480, 480)
    env.close()
