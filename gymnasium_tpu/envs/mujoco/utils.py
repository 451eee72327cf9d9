"""MujocoEnv state-snapshot utilities (testing helpers).

Parity surface: reference gymnasium/envs/mujoco/utils.py:12-76. The
reference serializes MuJoCo's ``mjtState`` buffers; this engine's full
physics state IS ``(qpos, qvel)``, so snapshots are their concatenation
(time/act/warm-start buffers have no equivalent here).
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_state", "set_state", "check_mujoco_reset_state"]


def get_state(env, state_type=None) -> np.ndarray:
    """Snapshot of the full physics state of ``env`` (reference utils.py:12)."""
    env = env.unwrapped
    qpos, qvel = env.get_state()
    return np.concatenate([qpos, qvel])


def set_state(env, state: np.ndarray, state_type=None) -> None:
    """Restore a :func:`get_state` snapshot (reference utils.py:30)."""
    env = env.unwrapped
    nq = env.model.nq
    env.set_state(state[:nq], state[nq:])


def check_mujoco_reset_state(env, seed=1234, state_type=None) -> None:
    """Assert ``reset(seed)`` restores the exact same physics state even
    after stepping (reference utils.py:52-76)."""
    env.action_space.seed(seed)
    action = env.action_space.sample()

    env.reset(seed=seed)
    first = get_state(env)
    env.step(action)

    env.reset(seed=seed)
    second = get_state(env)

    assert np.all(first == second), "reset is not deterministic"
