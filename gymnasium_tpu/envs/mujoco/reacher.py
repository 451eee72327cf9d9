"""Reacher: two-link arm reaching a random target.

Behavioral parity: reference mujoco/reacher_v4.py / _v5.py.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.locomotion import MujocoFuncEnv
from gymnasium_tpu.envs.mujoco.mujoco_env import MujocoEnv
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["ReacherEnv", "ReacherFunctional"]


class ReacherEnv(MujocoEnv, EzPickle):
    """Move the arm fingertip onto the target."""

    def __init__(
        self,
        reward_dist_weight: float = 1.0,
        reward_control_weight: float = 1.0,
        render_mode: str | None = None,
        **kwargs: Any,
    ):
        EzPickle.__init__(self, reward_dist_weight, reward_control_weight, render_mode, **kwargs)
        self._reward_dist_weight = reward_dist_weight
        self._reward_control_weight = reward_control_weight
        super().__init__(
            "reacher",
            frame_skip=kwargs.pop("frame_skip", 2),
            observation_space=spaces.Box(-np.inf, np.inf, (10,), np.float64),
            render_mode=render_mode,
            **kwargs,
        )
        self._fingertip_idx = self.body_index("fingertip")
        self._target_idx = self.body_index("target")

    def _sample_initial_state(self):
        qpos = self.init_qpos + self.np_random.uniform(-0.1, 0.1, self.model.nv)
        while True:
            goal = self.np_random.uniform(low=-0.2, high=0.2, size=2)
            if np.linalg.norm(goal) < 0.2:
                break
        qpos[2:4] = goal  # target slide joints (absolute, ref 0.1/-0.1 offset)
        qvel = self.init_qvel + self.np_random.uniform(-0.005, 0.005, self.model.nv)
        qvel[2:4] = 0.0
        self.goal = goal
        return qpos, qvel

    def _body_positions(self):
        _, p = self._dyn["fk"](self.qpos)
        return np.asarray(p)

    def _get_obs(self) -> np.ndarray:
        p = self._body_positions()
        theta = self.qpos[:2]
        vec = p[self._fingertip_idx] - p[self._target_idx]
        return np.concatenate(
            [
                np.cos(theta),
                np.sin(theta),
                self.qpos[2:4],
                self.qvel[:2],
                vec[:2],
            ]
        ).astype(np.float64)

    def step(self, action):
        p = self._body_positions()
        vec = p[self._fingertip_idx] - p[self._target_idx]
        reward_dist = -float(np.linalg.norm(vec)) * self._reward_dist_weight
        reward_ctrl = -float(np.square(action).sum()) * self._reward_control_weight
        reward = reward_dist + reward_ctrl

        self.do_simulation(action)
        if self.render_mode == "human":
            self.render()
        return (
            self._get_obs(),
            reward,
            False,
            False,
            {"reward_dist": reward_dist, "reward_ctrl": reward_ctrl},
        )


class ReacherFunctional(MujocoFuncEnv):
    """Device-resident Reacher."""

    model_name = "reacher"
    frame_skip = 2

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        self.observation_space = spaces.Box(-np.inf, np.inf, (10,), np.float64)
        self._fingertip_idx = self.meta["body_names"].index("fingertip")
        self._target_idx = self.meta["body_names"].index("target")

    def initial(self, rng, params: Any = None):
        import jax
        import jax.numpy as jnp

        k1, k2, k3 = jax.random.split(rng, 3)
        qpos = jnp.asarray(self._init_qpos) + jax.random.uniform(
            k1, (self.model.nv,), minval=-0.1, maxval=0.1
        )
        # target: polar sampling keeps it inside the 0.2 disc without rejection
        r = 0.2 * jnp.sqrt(jax.random.uniform(k2, ()))
        th = jax.random.uniform(k3, (), minval=0.0, maxval=2 * jnp.pi)
        qpos = qpos.at[2].set(r * jnp.cos(th)).at[3].set(r * jnp.sin(th))
        qvel = jax.random.uniform(k1, (self.model.nv,), minval=-0.005, maxval=0.005)
        qvel = qvel.at[2:4].set(0.0)
        return {"qpos": qpos, "qvel": qvel, "prev_x": qpos[0]}

    def _vec(self, state):
        import jax.numpy as jnp

        _, p = self._dyn["fk"](state["qpos"])
        return p[self._fingertip_idx] - p[self._target_idx]

    def observation(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        theta = state["qpos"][:2]
        vec = self._vec(state)
        return jnp.concatenate(
            [jnp.cos(theta), jnp.sin(theta), state["qpos"][2:4], state["qvel"][:2], vec[:2]]
        )

    def reward(self, state, action, next_state, rng, params: Any = None):
        import jax.numpy as jnp

        vec = self._vec(state)
        return -jnp.linalg.norm(vec) - jnp.sum(jnp.square(action))
