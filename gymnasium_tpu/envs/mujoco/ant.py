"""Ant: quadruped locomotion with a floating base.

Behavioral parity: reference mujoco/ant_v5.py — healthy-z termination,
forward reward, ctrl cost, and the cfrc-based contact cost computed from the
engine's aggregated per-body contact wrenches (cfrc_ext).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.locomotion import MujocoFuncEnv
from gymnasium_tpu.envs.mujoco.mujoco_env import MujocoEnv
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["AntEnv", "AntFunctional"]


class AntEnv(MujocoEnv, EzPickle):
    """Coordinate four legs to move forward."""

    def __init__(
        self,
        forward_reward_weight: float = 1.0,
        ctrl_cost_weight: float = 0.5,
        contact_cost_weight: float = 5e-4,
        contact_force_range: tuple[float, float] = (-1.0, 1.0),
        healthy_reward: float = 1.0,
        terminate_when_unhealthy: bool = True,
        healthy_z_range: tuple[float, float] = (0.2, 1.0),
        reset_noise_scale: float = 0.1,
        exclude_current_positions_from_observation: bool = True,
        include_cfrc_ext_in_observation: bool = True,
        render_mode: str | None = None,
        **kwargs: Any,
    ):
        EzPickle.__init__(
            self,
            forward_reward_weight,
            ctrl_cost_weight,
            contact_cost_weight,
            contact_force_range,
            healthy_reward,
            terminate_when_unhealthy,
            healthy_z_range,
            reset_noise_scale,
            exclude_current_positions_from_observation,
            include_cfrc_ext_in_observation,
            render_mode,
            **kwargs,
        )
        self.forward_reward_weight = forward_reward_weight
        self.ctrl_cost_weight = ctrl_cost_weight
        self.contact_cost_weight = contact_cost_weight
        self._contact_force_range = contact_force_range
        self.healthy_reward = healthy_reward
        self.terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._exclude_xy = exclude_current_positions_from_observation
        self._include_cfrc = include_cfrc_ext_in_observation
        # 13 + 14 (+2 with xy) plus cfrc_ext[1:] = 13 bodies x 6
        # (reference ant_v5.py:393-404: 105-dim by default)
        obs_dim = 27 if exclude_current_positions_from_observation else 29
        if include_cfrc_ext_in_observation:
            obs_dim += 13 * 6
        super().__init__(
            "ant",
            frame_skip=kwargs.pop("frame_skip", 5),
            observation_space=spaces.Box(-np.inf, np.inf, (obs_dim,), np.float64),
            render_mode=render_mode,
            reset_noise_scale=reset_noise_scale,
            **kwargs,
        )

    def _reset_info(self):
        # reference ant_v5.py:423-428
        return {
            "x_position": self.qpos[0],
            "y_position": self.qpos[1],
            "distance_from_origin": np.linalg.norm(self.qpos[0:2] - self.init_qpos[0:2]),
        }

    def _sample_initial_state(self):
        noise = self._reset_noise_scale
        qpos = self.init_qpos + self.np_random.uniform(-noise, noise, self.model.nq)
        qpos[3:7] /= np.linalg.norm(qpos[3:7]) + 1e-24
        qvel = self.init_qvel + noise * self.np_random.standard_normal(self.model.nv)
        return qpos, qvel

    @property
    def torso_z(self) -> float:
        """Absolute torso height."""
        return float(self.qpos[2])

    def is_healthy(self) -> bool:
        min_z, max_z = self._healthy_z_range
        return bool(
            np.isfinite(self.state_vector()).all() and min_z <= self.torso_z <= max_z
        )

    def _get_obs(self) -> np.ndarray:
        # free root carries the quaternion directly (qpos[3:7]); qvel[3:6]
        # is the body-frame angular velocity — both exactly MuJoCo's layout
        quat = self.qpos[3:7]
        z = np.array([self.torso_z])
        joints = self.qpos[7:]
        qvel = self.qvel
        parts = [] if self._exclude_xy else [self.qpos[:2]]
        parts += [z, quat, joints, qvel]
        if self._include_cfrc:
            # per-body external contact wrenches (reference data.cfrc_ext[1:]),
            # aggregated from the soft-contact engine's point forces
            parts.append(self.cfrc_ext.reshape(-1))
        return np.concatenate(parts).astype(np.float64)

    def step(self, action):
        xy_before = self.qpos[:2].copy()
        self.do_simulation(action)
        xy_after = self.qpos[:2]
        x_velocity, y_velocity = (xy_after - xy_before) / self.dt

        forward_reward = float(self.forward_reward_weight * x_velocity)
        healthy = self.is_healthy()
        healthy_reward = float(
            self.healthy_reward * (healthy or not self.terminate_when_unhealthy)
        )
        ctrl_cost = self.ctrl_cost_weight * float(np.sum(np.square(action)))
        # contact cost over clipped wrenches (reference ant_v5.py:328-339)
        contact_cost = self.contact_cost_weight * float(
            np.sum(np.square(np.clip(self.cfrc_ext, *self._contact_force_range)))
        )

        # fp grouping pinned by the reference's reward-sum contract:
        # rewards = forward + healthy; costs = ctrl + contact (ant_v5.py:341)
        reward = (healthy_reward + forward_reward) - (ctrl_cost + contact_cost)
        terminated = self.terminate_when_unhealthy and not healthy
        info = {
            "x_position": float(xy_after[0]),
            "y_position": float(xy_after[1]),
            "distance_from_origin": float(np.linalg.norm(self.qpos[0:2] - self.init_qpos[0:2])),
            "x_velocity": float(x_velocity),
            "y_velocity": float(y_velocity),
            "reward_forward": float(forward_reward),
            "reward_ctrl": -ctrl_cost,
            "reward_contact": -contact_cost,
            "reward_survive": float(healthy_reward),
        }
        if self.render_mode == "human":
            self.render()
        return self._get_obs(), reward, terminated, False, info


class AntFunctional(MujocoFuncEnv):
    """Device-resident Ant."""

    model_name = "ant"
    frame_skip = 5
    reset_noise_scale = 0.1

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        self.observation_space = spaces.Box(-np.inf, np.inf, (105,), np.float64)

    def observation(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        q, qd = state["qpos"], state["qvel"]
        z = jnp.asarray([q[2]])
        cfrc_ext = self._dyn["contact_wrenches"](q, qd).reshape(-1)
        return jnp.concatenate([z, q[3:7], q[7:], qd, cfrc_ext])

    def reward(self, state, action, next_state, rng, params: Any = None):
        import jax.numpy as jnp

        x_velocity = (next_state["qpos"][0] - next_state["prev_x"]) / self.dt
        ctrl_cost = 0.5 * jnp.sum(jnp.square(action))
        cfrc = self._dyn["contact_wrenches"](next_state["qpos"], next_state["qvel"])
        contact_cost = 5e-4 * jnp.sum(jnp.square(jnp.clip(cfrc, -1.0, 1.0)))
        z = next_state["qpos"][2]
        healthy = (z >= 0.2) & (z <= 1.0)
        return x_velocity + jnp.where(healthy, 1.0, 0.0) - ctrl_cost - contact_cost

    def terminal(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        z = state["qpos"][2]
        finite = jnp.all(jnp.isfinite(state["qpos"])) & jnp.all(jnp.isfinite(state["qvel"]))
        return ~((z >= 0.2) & (z <= 1.0) & finite)
