"""HumanoidStandup: stand up from a supine start.

Behavioral parity: reference mujoco/humanoidstandup_v5.py (uph_cost on torso
height, quadratic control cost, no termination).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.humanoid import HumanoidEnv, HumanoidFunctional
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["HumanoidStandupEnv", "HumanoidStandupFunctional"]


class HumanoidStandupEnv(HumanoidEnv):
    """Rise from lying down to standing."""

    model_name_default = "humanoidstandup"

    def __init__(
        self,
        uph_cost_weight: float = 1.0,
        ctrl_cost_weight: float = 0.1,
        impact_cost_weight: float = 0.5e-6,
        reset_noise_scale: float = 1e-2,
        render_mode: str | None = None,
        **kwargs: Any,
    ):
        self.uph_cost_weight = uph_cost_weight
        self.impact_cost_weight = impact_cost_weight
        super().__init__(
            ctrl_cost_weight=ctrl_cost_weight,
            terminate_when_unhealthy=False,
            reset_noise_scale=reset_noise_scale,
            render_mode=render_mode,
            **kwargs,
        )
        # re-record OUR constructor args: Humanoid's __init__ registered its
        # own 15-arg signature above, which HumanoidStandupEnv cannot accept
        # on unpickling (EzPickle is last-caller-wins)
        EzPickle.__init__(
            self,
            uph_cost_weight,
            ctrl_cost_weight,
            impact_cost_weight,
            reset_noise_scale,
            render_mode,
            **kwargs,
        )

    def step(self, action):
        self.do_simulation(action)
        self._last_ctrl = np.clip(
            np.asarray(action),
            self.model.act_ctrlrange[:, 0],
            self.model.act_ctrlrange[:, 1],
        )
        pos_after = self.torso_z
        uph_cost = float(self.uph_cost_weight * pos_after / self.model.timestep)
        quad_ctrl_cost = self.ctrl_cost_weight * float(np.square(action).sum())
        # impact cost over the aggregated contact wrenches, clipped to 10
        # (reference humanoidstandup_v5.py:448-452)
        quad_impact_cost = float(
            np.clip(
                self.impact_cost_weight * np.square(self.cfrc_ext).sum(), -np.inf, 10.0
            )
        )
        # fp grouping pinned by the reference reward-sum contract
        reward = uph_cost + -quad_ctrl_cost + -quad_impact_cost + 1

        info = {
            # position keys mirror reference humanoidstandup_v5.py:429-435
            # (tendon length/velocity omitted: this engine models no tendons)
            "x_position": float(self.qpos[0]),
            "y_position": float(self.qpos[1]),
            "z_distance_from_origin": float(self.qpos[2] - self.init_qpos[2]),
            "reward_linup": uph_cost,
            "reward_quadctrl": -quad_ctrl_cost,
            "reward_impact": -quad_impact_cost,
        }
        if self.render_mode == "human":
            self.render()
        return self._get_obs(), reward, False, False, info

    def _reset_info(self):
        return {
            "x_position": self.qpos[0],
            "y_position": self.qpos[1],
            "z_distance_from_origin": self.qpos[2] - self.init_qpos[2],
        }


class HumanoidStandupFunctional(HumanoidFunctional):
    """Device-resident HumanoidStandup."""

    model_name = "humanoidstandup"

    def reward(self, state, action, next_state, rng, params: Any = None):
        import jax.numpy as jnp

        pos_after = next_state["qpos"][2]
        uph_cost = pos_after / self.model.timestep
        cfrc = self._dyn["contact_wrenches"](next_state["qpos"], next_state["qvel"])
        impact = jnp.clip(0.5e-6 * jnp.sum(jnp.square(cfrc)), None, 10.0)
        return uph_cost - 0.1 * jnp.sum(jnp.square(action)) - impact + 1.0

    def terminal(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        return jnp.zeros((), bool)
