"""Swimmer: three-link swimmer in a viscous medium.

Behavioral parity: reference mujoco/swimmer_v5.py. Propulsion needs
anisotropic fluid drag (MuJoCo's medium density/viscosity); the engine
applies per-link drag forces perpendicular to each link — see
``_swimmer_drag`` below.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.locomotion import MujocoFuncEnv, PlanarLocomotionEnv
from gymnasium_tpu.envs.mujoco.mujoco_env import load_model
from gymnasium_tpu.physics.articulated import make_dynamics
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["SwimmerEnv", "SwimmerFunctional"]

# anisotropic drag: strong perpendicular to each link, weak along it
_DRAG_PERP = 15.0
_DRAG_PAR = 0.3


@functools.lru_cache(maxsize=2)
def _swimmer_step(frame_skip: int):
    """Jitted swimmer step with anisotropic link drag added to the engine."""
    import jax
    import jax.numpy as jnp

    model, _ = load_model("swimmer")
    dyn = make_dynamics(model)
    masses = jnp.asarray(model.bodies.mass)

    def com_world(q):
        R, p = dyn["fk"](q)
        return p + jnp.einsum("bij,bj->bi", R, jnp.asarray(model.bodies.com)), R

    def drag_torques(q, qd):
        # body com velocities and link axes via jvp of FK
        (pc, R), (pc_dot, _) = jax.jvp(com_world, (q,), (qd,))
        axes = R[:, :, 0]  # links extend along local x
        v_par = jnp.sum(pc_dot * axes, axis=-1, keepdims=True) * axes
        v_perp = pc_dot - v_par
        force = -_DRAG_PERP * v_perp - _DRAG_PAR * v_par

        def power(qd_):
            _, (pc_dot_, _) = jax.jvp(com_world, (q,), (qd_,))
            return jnp.sum(pc_dot_ * force)

        # generalized force = ∂(F·v)/∂qd
        return jax.grad(power)(qd)

    def step(q, qd, ctrl):
        def body(carry, _):
            q, qd = carry
            tau_drag = drag_torques(q, qd)
            # inject drag as extra velocity change before the engine step
            from gymnasium_tpu.physics.articulated import _spd_solve

            M = dyn["mass_matrix"](q)
            # unrolled Cholesky: batched jnp.linalg.solve serializes on TPU
            qd = qd + model.timestep * _spd_solve(
                jnp, M + 1e-9 * jnp.eye(model.nv), tau_drag
            )
            q, qd = dyn["step"](q, qd, ctrl)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=frame_skip)
        return q, qd

    # jit the per-host-step auxiliary helpers (see _compiled_step)
    jdyn = dict(dyn)
    for key in ("fk", "contact_points", "contact_wrenches", "com_world"):
        jdyn[key] = jax.jit(dyn[key])
    return jax.jit(step), jdyn


class SwimmerEnv(PlanarLocomotionEnv, EzPickle):
    """Swim forward through the viscous fluid."""

    forward_reward_weight = 1.0
    ctrl_cost_weight = 1e-4
    terminate_when_unhealthy = False
    report_xy = True  # swimmer reports y position/velocity + distance

    def __init__(
        self,
        forward_reward_weight: float = 1.0,
        ctrl_cost_weight: float = 1e-4,
        reset_noise_scale: float = 0.1,
        exclude_current_positions_from_observation: bool = True,
        render_mode: str | None = None,
        **kwargs: Any,
    ):
        EzPickle.__init__(
            self,
            forward_reward_weight,
            ctrl_cost_weight,
            reset_noise_scale,
            exclude_current_positions_from_observation,
            render_mode,
            **kwargs,
        )
        self.forward_reward_weight = forward_reward_weight
        self.ctrl_cost_weight = ctrl_cost_weight
        self._exclude_xy = exclude_current_positions_from_observation
        obs_dim = 8 if exclude_current_positions_from_observation else 10
        super().__init__(
            "swimmer",
            frame_skip=kwargs.pop("frame_skip", 4),
            observation_space=spaces.Box(-np.inf, np.inf, (obs_dim,), np.float64),
            render_mode=render_mode,
            reset_noise_scale=reset_noise_scale,
            **kwargs,
        )
        self._step_fn, self._dyn = _swimmer_step(self.frame_skip)

    def _get_obs(self) -> np.ndarray:
        qpos = self.qpos[2:] if self._exclude_xy else self.qpos
        return np.concatenate([qpos, self.qvel]).astype(np.float64)


class SwimmerFunctional(MujocoFuncEnv):
    """Device-resident Swimmer."""

    model_name = "swimmer"
    frame_skip = 4

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        self.observation_space = spaces.Box(-np.inf, np.inf, (8,), np.float64)
        self._swim_step, _ = _swimmer_step(self.frame_skip)

    def transition(self, state, action, rng, params: Any = None):
        q, qd = self._swim_step(state["qpos"], state["qvel"], action)
        return {"qpos": q, "qvel": qd, "prev_x": state["qpos"][0]}

    def observation(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        return jnp.concatenate([state["qpos"][2:], state["qvel"]])

    def reward(self, state, action, next_state, rng, params: Any = None):
        import jax.numpy as jnp

        x_velocity = (next_state["qpos"][0] - next_state["prev_x"]) / self.dt
        return x_velocity - 1e-4 * jnp.sum(jnp.square(action))
