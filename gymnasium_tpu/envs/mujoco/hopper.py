"""Hopper: one-legged planar hopper.

Behavioral parity: reference mujoco/hopper_v5.py (healthy-state termination,
clipped-velocity observation).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.locomotion import MujocoFuncEnv, PlanarLocomotionEnv
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["HopperEnv", "HopperFunctional"]


class HopperEnv(PlanarLocomotionEnv, EzPickle):
    """Hop forward without falling."""

    forward_reward_weight = 1.0
    ctrl_cost_weight = 1e-3
    healthy_reward = 1.0
    velocity_clip = 10.0
    z_index = 1

    def __init__(
        self,
        forward_reward_weight: float = 1.0,
        ctrl_cost_weight: float = 1e-3,
        healthy_reward: float = 1.0,
        terminate_when_unhealthy: bool = True,
        healthy_state_range: tuple[float, float] = (-100.0, 100.0),
        healthy_z_range: tuple[float, float] = (0.7, float("inf")),
        healthy_angle_range: tuple[float, float] = (-0.2, 0.2),
        reset_noise_scale: float = 5e-3,
        exclude_current_positions_from_observation: bool = True,
        render_mode: str | None = None,
        **kwargs: Any,
    ):
        EzPickle.__init__(
            self,
            forward_reward_weight,
            ctrl_cost_weight,
            healthy_reward,
            terminate_when_unhealthy,
            healthy_state_range,
            healthy_z_range,
            healthy_angle_range,
            reset_noise_scale,
            exclude_current_positions_from_observation,
            render_mode,
            **kwargs,
        )
        self.forward_reward_weight = forward_reward_weight
        self.ctrl_cost_weight = ctrl_cost_weight
        self.healthy_reward = healthy_reward
        self.terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_state_range = healthy_state_range
        self._healthy_z_range = healthy_z_range
        self._healthy_angle_range = healthy_angle_range
        self.exclude_x = exclude_current_positions_from_observation
        obs_dim = 11 if exclude_current_positions_from_observation else 12
        super().__init__(
            "hopper",
            frame_skip=kwargs.pop("frame_skip", 4),
            observation_space=spaces.Box(-np.inf, np.inf, (obs_dim,), np.float64),
            render_mode=render_mode,
            reset_noise_scale=reset_noise_scale,
            **kwargs,
        )

    def is_healthy(self) -> bool:
        z, angle = self.qpos[1], self.qpos[2]
        state = self.state_vector()[2:]
        min_state, max_state = self._healthy_state_range
        min_z, max_z = self._healthy_z_range
        min_angle, max_angle = self._healthy_angle_range
        return (
            bool(np.all(np.logical_and(min_state < state, state < max_state)))
            and min_z < z < max_z
            and min_angle < angle < max_angle
        )


class HopperFunctional(MujocoFuncEnv):
    """Device-resident Hopper."""

    model_name = "hopper"
    frame_skip = 4
    reset_noise_scale = 5e-3

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        self.observation_space = spaces.Box(-np.inf, np.inf, (11,), np.float64)

    def observation(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        return jnp.concatenate(
            [state["qpos"][1:], jnp.clip(state["qvel"], -10.0, 10.0)]
        )

    def reward(self, state, action, next_state, rng, params: Any = None):
        import jax.numpy as jnp

        x_velocity = (next_state["qpos"][0] - next_state["prev_x"]) / self.dt
        ctrl_cost = 1e-3 * jnp.sum(jnp.square(action))
        return x_velocity + 1.0 - ctrl_cost

    def terminal(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        z, angle = state["qpos"][1], state["qpos"][2]
        sv = jnp.concatenate([state["qpos"], state["qvel"]])[2:]
        healthy = (
            jnp.all(jnp.abs(sv) < 100.0)
            & (z > 0.7)
            & (jnp.abs(angle) < 0.2)
        )
        return ~healthy
