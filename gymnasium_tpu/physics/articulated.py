"""Articulated 3D rigid-body dynamics via autodiff Lagrangian mechanics.

The TPU-native replacement for the MuJoCo C engine (SURVEY.md §2.10): instead
of translating Featherstone's recursive algorithms, the only hand-written
physics here is forward kinematics over a chain of 1-DoF coordinate joints.
Everything else falls out of JAX autodiff:

- mass matrix     M(q)      = ∂²T/∂q̇²          (one ``jax.hessian``)
- bias forces     c(q, q̇)   = (∂(Mq̇)/∂q)q̇ − ∂T/∂q + ∂V/∂q   (jvp + grad)
- contact Jacobian J_c       = ∂p_contact/∂q    (``jax.jacfwd``)

and the step solves ``M q̈ = τ_actuation + J_cᵀ f_contact − c − damping·q̇``.

Joints are slide/hinge about arbitrary axes; a floating base is three slides
plus three hinges (Euler parametrization — adequate for the mostly-upright
locomotion robots; quaternion roots are a later refinement). Models are
static spec tables (numpy) extracted from the reference MJCF assets.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np

__all__ = ["JointSpec", "BodySpec", "ArticulatedModel", "fk", "step_fn", "make_dynamics"]

SLIDE = 0
HINGE = 1


class JointSpec(NamedTuple):
    """Per-DoF tables (length nv)."""

    body: np.ndarray  # (nv,) index of the body this dof moves
    jtype: np.ndarray  # (nv,) SLIDE or HINGE
    axis: np.ndarray  # (nv, 3) axis in the pre-joint frame
    anchor: np.ndarray  # (nv, 3) anchor point in the pre-joint frame
    damping: np.ndarray  # (nv,)
    limited: np.ndarray  # (nv,) bool
    lower: np.ndarray  # (nv,)
    upper: np.ndarray  # (nv,)
    stiffness: np.ndarray  # (nv,) joint spring stiffness toward springref 0
    armature: np.ndarray  # (nv,) rotor inertia added to M diagonal
    ref: np.ndarray  # (nv,) qpos0 reference value (joint value at rest pose)


class BodySpec(NamedTuple):
    """Per-body tables (length nbody); bodies in topological order, 0=world child."""

    parent: np.ndarray  # (nbody,) parent body index (-1 root attaches to world)
    pos: np.ndarray  # (nbody, 3) fixed offset in parent frame
    quat: np.ndarray  # (nbody, 4) fixed rotation (w, x, y, z) in parent frame
    mass: np.ndarray  # (nbody,)
    com: np.ndarray  # (nbody, 3) center of mass in body frame
    inertia: np.ndarray  # (nbody, 3, 3) about com, body frame
    dof_start: np.ndarray  # (nbody,) first dof index of this body (-1 = fixed)
    dof_count: np.ndarray  # (nbody,)


class ArticulatedModel(NamedTuple):
    """A full robot description."""

    bodies: BodySpec
    joints: JointSpec
    # contact spheres: (nc,) body index, (nc, 3) offset, (nc,) radius
    contact_body: np.ndarray
    contact_pos: np.ndarray
    contact_radius: np.ndarray
    # actuators: (nu,) dof index, (nu,) gear, (nu, 2) ctrlrange
    act_dof: np.ndarray
    act_gear: np.ndarray
    act_ctrlrange: np.ndarray
    gravity: float = -9.81
    timestep: float = 0.002
    # ground contact material
    contact_stiffness: float = 10000.0
    contact_damping: float = 100.0
    friction: float = 1.0
    limit_stiffness: float = 500.0
    # world ground-plane height; -inf-like when the model has no floor
    # (e.g. Pusher's table sits at z=-0.325, reference pusher_v5.xml:18)
    ground_z: float = 0.0

    @property
    def nv(self) -> int:
        return len(self.joints.body)

    @property
    def nu(self) -> int:
        return len(self.act_dof)


def _quat_to_mat_np(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _axis_angle_mat(jnp, axis, theta):
    """Rodrigues rotation about a fixed (numpy) unit axis."""
    ax = jnp.asarray(axis)
    K = jnp.asarray(
        np.array(
            [
                [0.0, -axis[2], axis[1]],
                [axis[2], 0.0, -axis[0]],
                [-axis[1], axis[0], 0.0],
            ]
        )
    )
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    eye = jnp.eye(3)
    return eye * c + s * K + (1 - c) * jnp.outer(ax, ax)


def fk(model: ArticulatedModel, q):
    """Forward kinematics: world rotation R (nbody,3,3) and frame origin p
    (nbody,3) for every body, as a pure jittable function of ``q``."""
    import jax.numpy as jnp

    nbody = len(model.bodies.parent)
    Rs = []
    ps = []
    for b in range(nbody):
        parent = int(model.bodies.parent[b])
        if parent < 0:
            R_p = jnp.eye(3)
            p_p = jnp.zeros(3)
        else:
            R_p = Rs[parent]
            p_p = ps[parent]
        R_fix = jnp.asarray(_quat_to_mat_np(model.bodies.quat[b]))
        R = R_p @ R_fix
        p = p_p + R_p @ jnp.asarray(model.bodies.pos[b])

        start = int(model.bodies.dof_start[b])
        count = int(model.bodies.dof_count[b])
        for k in range(start, start + count):
            axis = model.joints.axis[k]
            anchor = jnp.asarray(model.joints.anchor[k])
            qk = q[k] - float(model.joints.ref[k])
            if int(model.joints.jtype[k]) == SLIDE:
                p = p + R @ (jnp.asarray(axis) * qk)
            else:
                R_j = _axis_angle_mat(jnp, axis, qk)
                p = p + R @ (anchor - R_j @ anchor)
                R = R @ R_j
        Rs.append(R)
        ps.append(p)
    return jnp.stack(Rs), jnp.stack(ps)


def make_dynamics(model: ArticulatedModel):
    """Build jittable ``(q, qvel, ctrl) -> (q', qvel')`` plus helpers.

    Returns a dict of pure functions: ``step`` (one model.timestep),
    ``fk`` (kinematics), ``contacts(q) -> world points``, ``energy``.
    """
    import jax
    import jax.numpy as jnp

    nv = model.nv
    nbody = len(model.bodies.parent)
    masses = jnp.asarray(model.bodies.mass)
    coms = jnp.asarray(model.bodies.com)
    inertias = jnp.asarray(model.bodies.inertia)
    g = model.gravity

    def com_world(q):
        R, p = fk(model, q)
        return p + jnp.einsum("bij,bj->bi", R, coms), R

    def body_rotations_flat(q):
        R, p = fk(model, q)
        return R.reshape(-1)

    def kinetic_energy(q, qd):
        # linear com velocities and angular velocities via one jvp each
        (pc, R), (pc_dot, R_dot) = jax.jvp(com_world, (q,), (qd,))
        # omega from skew(R_dot R^T)
        W = jnp.einsum("bij,bkj->bik", R_dot, R)
        omega = jnp.stack([W[:, 2, 1], W[:, 0, 2], W[:, 1, 0]], axis=-1)
        I_world = jnp.einsum("bij,bjk,blk->bil", R, inertias, R)
        T_lin = 0.5 * jnp.sum(masses * jnp.sum(pc_dot**2, axis=-1))
        T_ang = 0.5 * jnp.sum(jnp.einsum("bi,bij,bj->b", omega, I_world, omega))
        T_arm = 0.5 * jnp.sum(jnp.asarray(model.joints.armature) * qd**2)
        return T_lin + T_ang + T_arm

    # V = -Σ m g·p with g = (0, 0, gravity); gravity < 0 ⇒ V grows with z.
    def potential(q):
        pc, _ = com_world(q)
        dq = q - jnp.asarray(model.joints.ref)
        spring = 0.5 * jnp.sum(jnp.asarray(model.joints.stiffness) * dq**2)
        return -jnp.sum(masses * g * pc[:, 2]) + spring

    def mass_matrix(q):
        return jax.hessian(kinetic_energy, argnums=1)(q, jnp.zeros(nv))

    def bias(q, qd):
        # (∂(M q̇)/∂q) q̇ − ∂T/∂q + ∂V/∂q
        def mom(q_):
            return mass_matrix(q_) @ qd

        _, mdot_qd = jax.jvp(mom, (q,), (qd,))
        dT_dq = jax.grad(kinetic_energy, argnums=0)(q, qd)
        dV_dq = jax.grad(potential)(q)
        return mdot_qd - dT_dq + dV_dq

    def contact_points(q):
        R, p = fk(model, q)
        body_idx = jnp.asarray(model.contact_body)
        offs = jnp.asarray(model.contact_pos)
        pts = p[body_idx] + jnp.einsum("cij,cj->ci", R[body_idx], offs)
        return pts

    def contact_torques(q, qd):
        """Ground-plane (z=0) spring-damper contact mapped to joint space."""
        if len(model.contact_body) == 0:
            return jnp.zeros(nv)
        radii = jnp.asarray(model.contact_radius)
        pts = contact_points(q)
        Jc = jax.jacfwd(contact_points)(q)  # (nc, 3, nv)
        vels = jnp.einsum("civ,v->ci", Jc, qd)

        # Stiffness scaled to the contacting body's mass keeps the explicit
        # spring stable across robots spanning 0.9 kg (Ant) to 42 kg
        # (Humanoid): k ≤ m (α/dt)² with α ≈ 1.
        m_eff = jnp.maximum(masses[jnp.asarray(model.contact_body)], 1e-3)
        k_c = jnp.minimum(model.contact_stiffness, m_eff / model.timestep**2)
        c_c = 1.4 * jnp.sqrt(k_c * m_eff)

        depth = radii - (pts[:, 2] - model.ground_z)
        in_contact = depth > 0.0
        fn = jnp.where(in_contact, k_c * depth - c_c * vels[:, 2], 0.0)
        fn = jnp.maximum(fn, 0.0)
        # tangential friction (viscous, clamped by the friction cone)
        ft_raw = -c_c[:, None] * vels[:, 0:2]
        ft_norm = jnp.sqrt(jnp.sum(ft_raw**2, axis=-1) + 1e-12)
        scale = jnp.minimum(1.0, model.friction * fn / ft_norm)
        ft = ft_raw * scale[:, None]
        f = jnp.concatenate([ft, fn[:, None]], axis=-1)
        return jnp.einsum("civ,ci->v", Jc, f)

    def limit_torques(q, qd):
        lim = jnp.asarray(model.joints.limited)
        lower = jnp.asarray(model.joints.lower)
        upper = jnp.asarray(model.joints.upper)
        below = jnp.minimum(q - lower, 0.0)
        above = jnp.maximum(q - upper, 0.0)
        tau = -model.limit_stiffness * (below + above)
        return jnp.where(lim, tau, 0.0)

    def actuation(ctrl):
        ctrl = jnp.clip(
            ctrl,
            jnp.asarray(model.act_ctrlrange[:, 0]),
            jnp.asarray(model.act_ctrlrange[:, 1]),
        )
        tau = jnp.zeros(nv)
        tau = tau.at[jnp.asarray(model.act_dof)].add(jnp.asarray(model.act_gear) * ctrl)
        return tau

    damping = jnp.asarray(model.joints.damping)

    def step(q, qd, ctrl):
        tau = actuation(ctrl)
        tau = tau + contact_torques(q, qd) + limit_torques(q, qd)
        M = mass_matrix(q)
        c = bias(q, qd)
        # Implicit joint damping: solve (M + dt·D) q̈ = τ − c − D·q̇ — keeps
        # heavily-damped low-inertia joints (Pusher wrist) unconditionally
        # stable where the explicit form explodes.
        D = jnp.diag(damping)
        rhs = tau - c - damping * qd
        qacc = jnp.linalg.solve(M + model.timestep * D + 1e-9 * jnp.eye(nv), rhs)
        qd_new = qd + model.timestep * qacc
        q_new = q + model.timestep * qd_new
        return q_new, qd_new

    return {
        "step": step,
        "fk": lambda q: fk(model, q),
        "contact_points": contact_points,
        "mass_matrix": mass_matrix,
        "kinetic_energy": kinetic_energy,
        "potential": potential,
        "com_world": com_world,
    }


def step_fn(model: ArticulatedModel, frame_skip: int = 1):
    """A ``(q, qd, ctrl) -> (q, qd)`` function running ``frame_skip`` substeps."""
    dyn = make_dynamics(model)

    def run(q, qd, ctrl):
        for _ in range(frame_skip):
            q, qd = dyn["step"](q, qd, ctrl)
        return q, qd

    return run
