"""Pusher: 7-DoF arm pushing a cylinder to a goal.

Behavioral parity: reference mujoco/pusher_v4.py / _v5.py.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.locomotion import MujocoFuncEnv
from gymnasium_tpu.envs.mujoco.mujoco_env import MujocoEnv
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["PusherEnv", "PusherFunctional"]


class PusherEnv(MujocoEnv, EzPickle):
    """Push the object onto the goal position."""

    def __init__(
        self,
        reward_near_weight: float = 0.5,
        reward_dist_weight: float = 1.0,
        reward_control_weight: float = 0.1,
        render_mode: str | None = None,
        **kwargs: Any,
    ):
        EzPickle.__init__(
            self, reward_near_weight, reward_dist_weight, reward_control_weight, render_mode, **kwargs
        )
        self._reward_near_weight = reward_near_weight
        self._reward_dist_weight = reward_dist_weight
        self._reward_control_weight = reward_control_weight
        super().__init__(
            "pusher_v5",
            frame_skip=kwargs.pop("frame_skip", 5),
            observation_space=spaces.Box(-np.inf, np.inf, (23,), np.float64),
            render_mode=render_mode,
            **kwargs,
        )
        names = self.meta["body_names"]
        self._tips_idx = names.index("tips_arm") if "tips_arm" in names else len(names) - 3
        self._obj_idx = names.index("object") if "object" in names else len(names) - 2
        self._goal_idx = names.index("goal") if "goal" in names else len(names) - 1

    def _sample_initial_state(self):
        qpos = self.init_qpos.copy()
        # object cylinder xy (slide joints near the end of qpos)
        while True:
            cyl_pos = np.array(
                [
                    self.np_random.uniform(low=-0.3, high=0),
                    self.np_random.uniform(low=-0.2, high=0.2),
                ]
            )
            goal_pos = np.array([0.0, 0.0])
            if np.linalg.norm(cyl_pos - goal_pos) > 0.17:
                break
        # the object's two slide joints follow the 7 arm joints
        qpos[7:9] = cyl_pos
        qvel = self.init_qvel + self.np_random.uniform(-0.005, 0.005, self.model.nv)
        qvel[7:] = 0.0
        return qpos, qvel

    def _positions(self):
        _, p = self._dyn["fk"](self.qpos)
        return np.asarray(p)

    def _get_obs(self) -> np.ndarray:
        p = self._positions()
        return np.concatenate(
            [
                self.qpos[:7],
                self.qvel[:7],
                p[self._tips_idx],
                p[self._obj_idx],
                p[self._goal_idx],
            ]
        ).astype(np.float64)

    def step(self, action):
        p = self._positions()
        vec_1 = p[self._obj_idx] - p[self._tips_idx]
        vec_2 = p[self._obj_idx] - p[self._goal_idx]
        # components carry their weights, reward is their plain sum
        # (reference pusher_v5.py:229-233)
        reward_near = -float(np.linalg.norm(vec_1)) * self._reward_near_weight
        reward_dist = -float(np.linalg.norm(vec_2)) * self._reward_dist_weight
        reward_ctrl = -float(np.square(action).sum()) * self._reward_control_weight
        reward = reward_dist + reward_ctrl + reward_near

        self.do_simulation(action)
        if self.render_mode == "human":
            self.render()
        return (
            self._get_obs(),
            reward,
            False,
            False,
            {"reward_dist": reward_dist, "reward_ctrl": reward_ctrl, "reward_near": reward_near},
        )


class PusherFunctional(MujocoFuncEnv):
    """Device-resident Pusher."""

    model_name = "pusher_v5"
    frame_skip = 5

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        self.observation_space = spaces.Box(-np.inf, np.inf, (23,), np.float64)
        names = self.meta["body_names"]
        self._tips_idx = names.index("tips_arm") if "tips_arm" in names else len(names) - 3
        self._obj_idx = names.index("object") if "object" in names else len(names) - 2
        self._goal_idx = names.index("goal") if "goal" in names else len(names) - 1

    def initial(self, rng, params: Any = None):
        import jax
        import jax.numpy as jnp

        k1, k2, k3 = jax.random.split(rng, 3)
        qpos = jnp.asarray(self._init_qpos)
        cyl_x = jax.random.uniform(k1, (), minval=-0.3, maxval=0.0)
        cyl_y = jax.random.uniform(k2, (), minval=-0.2, maxval=0.2)
        # keep the object away from the goal without host-side rejection
        too_close = jnp.sqrt(cyl_x**2 + cyl_y**2) <= 0.17
        cyl_x = jnp.where(too_close, -0.25, cyl_x)
        qpos = qpos.at[7].set(cyl_x).at[8].set(cyl_y)
        qvel = jax.random.uniform(k3, (self.model.nv,), minval=-0.005, maxval=0.005)
        qvel = qvel.at[7:].set(0.0)
        return {"qpos": qpos, "qvel": qvel, "prev_x": qpos[0]}

    def observation(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        _, p = self._dyn["fk"](state["qpos"])
        return jnp.concatenate(
            [
                state["qpos"][:7],
                state["qvel"][:7],
                p[self._tips_idx],
                p[self._obj_idx],
                p[self._goal_idx],
            ]
        )

    def reward(self, state, action, next_state, rng, params: Any = None):
        import jax.numpy as jnp

        _, p = self._dyn["fk"](state["qpos"])
        reward_near = -jnp.linalg.norm(p[self._obj_idx] - p[self._tips_idx])
        reward_dist = -jnp.linalg.norm(p[self._obj_idx] - p[self._goal_idx])
        return reward_dist + 0.1 * (-jnp.sum(jnp.square(action))) + 0.5 * reward_near
