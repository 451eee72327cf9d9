"""Humanoid: bipedal locomotion with a floating base.

Behavioral parity: reference mujoco/humanoid_v5.py (376-dim observation
assembled from position/velocity/com-inertia/com-velocity/actuator-force/
external-force blocks; cfrc_ext comes from the engine's aggregated per-body
contact wrenches).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.locomotion import MujocoFuncEnv
from gymnasium_tpu.envs.mujoco.mujoco_env import MujocoEnv
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["HumanoidEnv", "HumanoidFunctional"]

# observation block row count: reference uses data.cinert[1:] etc. — every
# body EXCEPT the world (reference humanoid_v5.py:441-456). Our compiled model
# keeps only real bodies, so all 13 rows are used with no world padding.
_NBODY_OBS = 13


def _com_inertia_block(model, qpos_unused=None) -> np.ndarray:
    """Static per-body [mass, m*com (3), inertia diag (3), inertia off (3)]
    rows — the cinert-equivalent block (reference data.cinert[1:], 13x10)."""
    rows = []
    for b in range(len(model.bodies.mass)):
        m = model.bodies.mass[b]
        com = model.bodies.com[b]
        inertia = model.bodies.inertia[b]
        rows.append(
            np.concatenate(
                [
                    [m],
                    m * com,
                    np.diag(inertia),
                    [inertia[0, 1], inertia[0, 2], inertia[1, 2]],
                ]
            )
        )
    rows = rows[:_NBODY_OBS]
    while len(rows) < _NBODY_OBS:
        rows.append(np.zeros(10))
    return np.concatenate(rows)


@functools.lru_cache(maxsize=4)
def _com_velocity_fn(model_name: str):
    """Jitted per-body COM world velocity ``(qpos, qvel) -> (nbody, 3)``,
    shared across env instances (the eager jvp was a large share of the
    ~1.8s Humanoid host step)."""
    import jax

    from gymnasium_tpu.envs.mujoco.mujoco_env import load_model
    from gymnasium_tpu.physics.articulated import integrate_pos, make_dynamics

    model, _ = load_model(model_name)
    dyn = make_dynamics(model)

    def com_vel(qpos, qvel):
        def com(t):
            # differentiate along the position flow (quaternion retraction
            # for the free root), not a raw coordinate tangent
            pc, _ = dyn["com_world"](integrate_pos(model, qpos, qvel, t))
            return pc

        _, vel = jax.jvp(com, (0.0,), (1.0,))
        return vel

    return jax.jit(com_vel)


class HumanoidEnv(MujocoEnv, EzPickle):
    """Walk forward without falling over."""

    model_name_default = "humanoid"

    def __init__(
        self,
        forward_reward_weight: float = 1.25,
        ctrl_cost_weight: float = 0.1,
        contact_cost_weight: float = 5e-7,
        contact_cost_range: tuple[float, float] = (-np.inf, 10.0),
        healthy_reward: float = 5.0,
        terminate_when_unhealthy: bool = True,
        healthy_z_range: tuple[float, float] = (1.0, 2.0),
        reset_noise_scale: float = 1e-2,
        exclude_current_positions_from_observation: bool = True,
        include_cinert_in_observation: bool = True,
        include_cvel_in_observation: bool = True,
        include_qfrc_actuator_in_observation: bool = True,
        include_cfrc_ext_in_observation: bool = True,
        render_mode: str | None = None,
        **kwargs: Any,
    ):
        EzPickle.__init__(
            self,
            forward_reward_weight,
            ctrl_cost_weight,
            contact_cost_weight,
            contact_cost_range,
            healthy_reward,
            terminate_when_unhealthy,
            healthy_z_range,
            reset_noise_scale,
            exclude_current_positions_from_observation,
            include_cinert_in_observation,
            include_cvel_in_observation,
            include_qfrc_actuator_in_observation,
            include_cfrc_ext_in_observation,
            render_mode,
            **kwargs,
        )
        self.forward_reward_weight = forward_reward_weight
        self.ctrl_cost_weight = ctrl_cost_weight
        self.healthy_reward = healthy_reward
        self.terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._exclude_xy = exclude_current_positions_from_observation
        self.contact_cost_weight = contact_cost_weight
        self._contact_cost_range = contact_cost_range
        self._include_cinert = include_cinert_in_observation
        self._include_cvel = include_cvel_in_observation
        self._include_qfrc = include_qfrc_actuator_in_observation
        self._include_cfrc = include_cfrc_ext_in_observation
        # 22 + 23 + cinert 130 + cvel 78 + qfrc_actuator[6:] 17 + cfrc_ext 78
        # (reference humanoid_v5.py:436-470: 348-dim by default)
        obs_dim = 45 if exclude_current_positions_from_observation else 47
        obs_dim += 130 * include_cinert_in_observation
        obs_dim += 78 * include_cvel_in_observation
        obs_dim += 17 * include_qfrc_actuator_in_observation
        obs_dim += 78 * include_cfrc_ext_in_observation
        super().__init__(
            self.model_name_default,
            frame_skip=kwargs.pop("frame_skip", 5),
            observation_space=spaces.Box(-np.inf, np.inf, (obs_dim,), np.float64),
            render_mode=render_mode,
            reset_noise_scale=reset_noise_scale,
            **kwargs,
        )
        self._cinert = _com_inertia_block(self.model)
        self._last_ctrl = np.zeros(self.model.nu)

    @property
    def torso_z(self) -> float:
        """Absolute torso height."""
        return float(self.qpos[2])

    def is_healthy(self) -> bool:
        min_z, max_z = self._healthy_z_range
        return bool(min_z < self.torso_z < max_z)

    def _com_velocity_block(self) -> np.ndarray:
        vel = np.asarray(_com_velocity_fn(self.model_name_default)(self.qpos, self.qvel))
        rows = []
        for b in range(min(len(vel), _NBODY_OBS)):
            rows.append(np.concatenate([vel[b], np.zeros(3)]))
        while len(rows) < _NBODY_OBS:
            rows.append(np.zeros(6))
        return np.concatenate(rows)

    def _get_obs(self) -> np.ndarray:
        # quaternion root: qpos[3:7] is the absolute orientation, qvel[3:6]
        # the body-frame angular velocity — MuJoCo's exact free-joint layout
        quat = self.qpos[3:7]
        z = np.array([self.torso_z])
        position = np.concatenate([z, quat, self.qpos[7:]])
        if not self._exclude_xy:
            position = np.concatenate([self.qpos[:2], position])
        velocity = self.qvel
        parts = [position, velocity]
        if self._include_cinert:
            parts.append(self._cinert)
        if self._include_cvel:
            parts.append(self._com_velocity_block())
        if self._include_qfrc:
            qfrc_actuator = np.zeros(self.model.nv)
            qfrc_actuator[self.model.act_dof] = self.model.act_gear * self._last_ctrl
            parts.append(qfrc_actuator[6:])  # reference qfrc_actuator[6:] (17)
        if self._include_cfrc:
            parts.append(self.cfrc_ext[:_NBODY_OBS].reshape(-1))
        return np.concatenate(parts).astype(np.float64)

    def _reset_info(self):
        # reference humanoid_v5.py:534-541 (tendon keys omitted: no tendons
        # in this engine)
        return {
            "x_position": self.qpos[0],
            "y_position": self.qpos[1],
            "distance_from_origin": np.linalg.norm(self.qpos[0:2] - self.init_qpos[0:2]),
        }

    def _sample_initial_state(self):
        noise = self._reset_noise_scale
        qpos = self.init_qpos + self.np_random.uniform(-noise, noise, self.model.nq)
        qpos[3:7] /= np.linalg.norm(qpos[3:7]) + 1e-24
        qvel = self.init_qvel + self.np_random.uniform(-noise, noise, self.model.nv)
        return qpos, qvel

    def step(self, action):
        # reference humanoid_v5.py:473-477: forward velocity is the
        # whole-robot CENTER-OF-MASS displacement, not the root frame's
        xy_before = self.mass_center_xy()
        self.do_simulation(action)
        self._last_ctrl = np.clip(
            np.asarray(action),
            self.model.act_ctrlrange[:, 0],
            self.model.act_ctrlrange[:, 1],
        )
        xy_after = self.mass_center_xy()
        x_velocity, y_velocity = (xy_after - xy_before) / self.dt

        forward_reward = float(self.forward_reward_weight * x_velocity)
        healthy = self.is_healthy()
        healthy_reward = float(
            self.healthy_reward * (healthy or not self.terminate_when_unhealthy)
        )
        ctrl_cost = self.ctrl_cost_weight * float(np.sum(np.square(action)))
        # contact cost over the aggregated wrenches, clipped
        # (reference humanoid_v5.py:422-427, restored in v5)
        contact_cost = float(
            np.clip(
                self.contact_cost_weight * np.sum(np.square(self.cfrc_ext)),
                *self._contact_cost_range,
            )
        )

        # fp grouping pinned by the reference reward-sum contract:
        # (forward + survive) + (reward_ctrl + reward_contact)
        reward = (forward_reward + healthy_reward) + (-ctrl_cost + -contact_cost)
        terminated = self.terminate_when_unhealthy and not healthy
        info = {
            # positions report the root frame (reference: data.qpos[0:2]),
            # velocities the COM displacement — mirroring humanoid_v5.py
            "x_position": float(self.qpos[0]),
            "y_position": float(self.qpos[1]),
            "x_velocity": float(x_velocity),
            "y_velocity": float(y_velocity),
            "distance_from_origin": float(np.linalg.norm(self.qpos[0:2] - self.init_qpos[0:2])),
            "reward_forward": float(forward_reward),
            "reward_ctrl": -ctrl_cost,
            "reward_contact": -contact_cost,
            "reward_survive": float(healthy_reward),
        }
        if self.render_mode == "human":
            self.render()
        return self._get_obs(), reward, terminated, False, info


class HumanoidFunctional(MujocoFuncEnv):
    """Device-resident Humanoid with the host env's full 348-dim observation
    (reference humanoid_v5.py:436-470): position, velocity, static cinert,
    jvp-derived com velocities, engine contact wrenches for cfrc_ext, and a
    zero qfrc_actuator block (the host env approximates it the same way)."""

    model_name = "humanoid"
    frame_skip = 5
    reset_noise_scale = 1e-2

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        self.observation_space = spaces.Box(-np.inf, np.inf, (348,), np.float64)
        self._cinert = _com_inertia_block(self.model)
        self._nv = self.model.nv

    def observation(self, state, rng, params: Any = None):
        import jax
        import jax.numpy as jnp

        from gymnasium_tpu.physics.articulated import integrate_pos

        q, qd = state["qpos"], state["qvel"]
        z = jnp.asarray([q[2]])
        position = jnp.concatenate([z, q[3:7], q[7:]])
        velocity = qd

        def com(t):
            pc, _ = self._dyn["com_world"](integrate_pos(self.model, q, qd, t))
            return pc

        _, vel = jax.jvp(com, (jnp.zeros(()),), (jnp.ones(()),))
        rows = jnp.concatenate(
            [vel[:_NBODY_OBS], jnp.zeros((_NBODY_OBS, 3))], axis=1
        ).reshape(-1)
        qfrc = jnp.zeros(self._nv - 6)
        cfrc_ext = self._dyn["contact_wrenches"](q, qd)[:_NBODY_OBS].reshape(-1)
        return jnp.concatenate(
            [position, velocity, jnp.asarray(self._cinert), rows, qfrc, cfrc_ext]
        )

    def _com_x(self, q):
        import jax.numpy as jnp

        pc, _ = self._dyn["com_world"](q)
        masses = jnp.asarray(self.model.bodies.mass)
        return jnp.sum(masses * pc[:, 0]) / jnp.sum(masses)

    def reward(self, state, action, next_state, rng, params: Any = None):
        import jax.numpy as jnp

        # forward velocity of the whole-robot CENTER OF MASS — matching the
        # host env and reference humanoid_v5.py:473-477 (round-3 fix: the
        # twin previously used the root-frame x velocity)
        x_velocity = (self._com_x(next_state["qpos"]) - self._com_x(state["qpos"])) / self.dt
        z = next_state["qpos"][2]
        healthy = (z > 1.0) & (z < 2.0)
        ctrl_cost = 0.1 * jnp.sum(jnp.square(action))
        cfrc = self._dyn["contact_wrenches"](next_state["qpos"], next_state["qvel"])
        contact_cost = jnp.clip(5e-7 * jnp.sum(jnp.square(cfrc)), None, 10.0)
        return 1.25 * x_velocity + jnp.where(healthy, 5.0, 0.0) - ctrl_cost - contact_cost

    def terminal(self, state, rng, params: Any = None):
        z = state["qpos"][2]
        return ~((z > 1.0) & (z < 2.0))
