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

@functools.lru_cache(maxsize=2)
def _swimmer_step(frame_skip: int):
    """Jitted swimmer step with MuJoCo's inertia-box fluid forces.

    The medium (swimmer.xml ``<option density="4000" viscosity="0.1">``)
    exerts, per body, the forces of MuJoCo's inertia-box fluid model
    (docs "Passive forces"): each body is replaced by the equivalent-inertia
    box with full side lengths ``d_i = sqrt(6 (I_j + I_k - I_i) / m)``; in
    the principal frame the medium applies

    - viscous (Stokes, equivalent-sphere diameter ``D = mean(d)``):
      force ``-3 pi D mu v``, torque ``-pi D^3 mu omega``;
    - quadratic density drag: force ``-1/2 rho d_j d_k |v_i| v_i``,
      torque ``-rho d_i (d_j^4 + d_k^4) |w_i| w_i / 64``.

    The anisotropy that propels a swimmer (slender boxes have far more
    broadside area than end-on) emerges from the inertia geometry instead
    of hand-tuned drag coefficients.
    """
    import jax
    import jax.numpy as jnp

    model, _ = load_model("swimmer")
    dyn = make_dynamics(model)

    rho = float(model.fluid_density)
    mu = float(model.fluid_viscosity)
    mass = np.maximum(np.asarray(model.bodies.mass, np.float64), 1e-12)
    evals, evecs = np.linalg.eigh(np.asarray(model.bodies.inertia, np.float64))
    # full box side lengths per principal axis: (B, 3)
    d_box = np.sqrt(
        np.maximum(1e-12, (evals.sum(-1, keepdims=True) - 2 * evals)) * 6.0 / mass[:, None]
    )
    diam = jnp.asarray(d_box.mean(-1))  # equivalent-sphere diameter (B,)
    area = jnp.asarray(d_box.prod(-1, keepdims=True) / d_box)  # d_j*d_k (B, 3)
    d4 = d_box**4
    tdrag = jnp.asarray(d_box * (d4.sum(-1, keepdims=True) - d4) / 64.0)  # (B, 3)
    d_box = jnp.asarray(d_box)
    evecs = jnp.asarray(evecs)  # columns: principal axes in the body frame

    def com_world(q):
        R, p = dyn["fk"](q)
        return p + jnp.einsum("bij,bj->bi", R, jnp.asarray(model.bodies.com)), R

    def principal_velocities(q, qd):
        """Per-body COM linear and angular velocity in the principal frame
        (MuJoCo's local object velocity); linear in ``qd``."""
        (_, R), (pc_dot, R_dot) = jax.jvp(com_world, (q,), (qd,))
        # world angular velocity: unskew(R_dot R^T)
        W = jnp.einsum("bij,bkj->bik", R_dot, R)
        w_world = (
            jnp.stack(
                [W[:, 2, 1] - W[:, 1, 2], W[:, 0, 2] - W[:, 2, 0], W[:, 1, 0] - W[:, 0, 1]],
                axis=-1,
            )
            / 2.0
        )
        axes = jnp.einsum("bij,bjk->bik", R, evecs)  # principal axes in world
        v_p = jnp.einsum("bik,bi->bk", axes, pc_dot)
        w_p = jnp.einsum("bik,bi->bk", axes, w_world)
        return v_p, w_p

    def drag_torques(q, qd):
        v_p, w_p = principal_velocities(q, qd)
        force = jnp.zeros_like(v_p)
        torque = jnp.zeros_like(w_p)
        if mu > 0:
            force = force - 3.0 * jnp.pi * mu * diam[:, None] * v_p
            torque = torque - jnp.pi * mu * (diam**3)[:, None] * w_p
        if rho > 0:
            force = force - 0.5 * rho * area * jnp.abs(v_p) * v_p
            torque = torque - rho * tdrag * jnp.abs(w_p) * w_p

        def power(qd_):
            v_, w_ = principal_velocities(q, qd_)
            return jnp.sum(v_ * force) + jnp.sum(w_ * torque)

        # generalized force = ∂(F·v + τ·ω)/∂qd with the wrench held fixed
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
