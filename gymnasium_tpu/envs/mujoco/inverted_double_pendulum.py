"""InvertedDoublePendulum: two-link pole on a cart.

Behavioral parity: reference mujoco/inverted_double_pendulum_v4.py / _v5.py.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.locomotion import MujocoFuncEnv
from gymnasium_tpu.envs.mujoco.mujoco_env import MujocoEnv
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["InvertedDoublePendulumEnv", "InvertedDoublePendulumFunctional"]

_POLE_LEN = 0.6  # each pole segment length


def _tip(qpos, np_like):
    x = qpos[0]
    tip_x = x + _POLE_LEN * np_like.sin(qpos[1]) + _POLE_LEN * np_like.sin(qpos[1] + qpos[2])
    tip_y = _POLE_LEN * np_like.cos(qpos[1]) + _POLE_LEN * np_like.cos(qpos[1] + qpos[2])
    return tip_x, tip_y


class InvertedDoublePendulumEnv(MujocoEnv, EzPickle):
    """Balance a two-segment pole on a sliding cart."""

    def __init__(
        self,
        healthy_reward: float = 10.0,
        reset_noise_scale: float = 0.1,
        render_mode: str | None = None,
        **kwargs: Any,
    ):
        EzPickle.__init__(self, healthy_reward, reset_noise_scale, render_mode, **kwargs)
        self._healthy_reward = healthy_reward
        super().__init__(
            "inverted_double_pendulum",
            frame_skip=kwargs.pop("frame_skip", 5),
            observation_space=spaces.Box(-np.inf, np.inf, (9,), np.float64),
            render_mode=render_mode,
            reset_noise_scale=reset_noise_scale,
            **kwargs,
        )
        # obs = [x, sin q1, sin q2, cos q1, cos q2, v0, v1, v2, constraint]
        # (the 9th slot is the reference's clip(qfrc_constraint, ±10)[0],
        # inverted_double_pendulum_v5.py:200-210 — here the engine's
        # joint-limit penalty torque on the cart's slide dof, which is the
        # only constraint force this model can produce: no contacts, and
        # qfrc_constraint is ~0 away from the rail limit in both engines)

    def _sample_initial_state(self):
        noise = self._reset_noise_scale
        qpos = self.init_qpos + self.np_random.uniform(-noise, noise, self.model.nv)
        qvel = self.init_qvel + self.np_random.standard_normal(self.model.nv) * noise
        return qpos, qvel

    def _get_obs(self) -> np.ndarray:
        qfrc = np.asarray(self._dyn["limit_torques"](self.qpos, self.qvel))
        return np.concatenate(
            [
                self.qpos[:1],
                np.sin(self.qpos[1:]),
                np.cos(self.qpos[1:]),
                np.clip(self.qvel, -10, 10),
                np.clip(qfrc, -10, 10)[:1],
            ]
        ).astype(np.float64)

    def step(self, action):
        self.do_simulation(action)
        obs = self._get_obs()
        tip_x, tip_y = _tip(self.qpos, np)
        dist_penalty = 0.01 * tip_x**2 + (tip_y - 2) ** 2
        v1, v2 = self.qvel[1:3]
        vel_penalty = 1e-3 * v1**2 + 5e-3 * v2**2
        terminated = bool(tip_y <= 1.0)
        alive_bonus = float(self._healthy_reward * (not terminated))
        dist_penalty = float(dist_penalty)
        vel_penalty = float(vel_penalty)
        # fp grouping pinned by the reference reward-sum contract:
        # survive + distance_penalty + velocity_penalty
        reward = alive_bonus + -dist_penalty + -vel_penalty
        if self.render_mode == "human":
            self.render()
        return obs, reward, terminated, False, {
            "reward_survive": alive_bonus,
            "distance_penalty": -dist_penalty,
            "velocity_penalty": -vel_penalty,
        }


class InvertedDoublePendulumFunctional(MujocoFuncEnv):
    """Device-resident InvertedDoublePendulum."""

    model_name = "inverted_double_pendulum"
    frame_skip = 5
    reset_noise_scale = 0.1

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        self.observation_space = spaces.Box(-np.inf, np.inf, (9,), np.float64)

    def observation(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        q = state["qpos"]
        qfrc = self._dyn["limit_torques"](q, state["qvel"])
        return jnp.concatenate(
            [
                q[:1],
                jnp.sin(q[1:]),
                jnp.cos(q[1:]),
                jnp.clip(state["qvel"], -10, 10),
                jnp.clip(qfrc, -10, 10)[:1],
            ]
        )

    def reward(self, state, action, next_state, rng, params: Any = None):
        import jax.numpy as jnp

        tip_x, tip_y = _tip(next_state["qpos"], jnp)
        dist_penalty = 0.01 * tip_x**2 + (tip_y - 2) ** 2
        v1, v2 = next_state["qvel"][1], next_state["qvel"][2]
        vel_penalty = 1e-3 * v1**2 + 5e-3 * v2**2
        alive = jnp.where(tip_y > 1.0, 10.0, 0.0)
        return alive - dist_penalty - vel_penalty

    def terminal(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        _, tip_y = _tip(state["qpos"], jnp)
        return tip_y <= 1.0
