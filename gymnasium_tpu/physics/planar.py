"""Mini 2D articulated rigid-body engine, fully jittable.

This is the TPU-native replacement for the Box2D C++ solver (SURVEY.md
§2.10): the same sequential-impulse algorithm Box2D uses — velocity-level
constraint solving with Baumgarte stabilization — but with a *fixed*
topology, *fixed* contact-candidate set, and *fixed* iteration counts, so
the whole step is static-shape XLA code that vmaps across thousands of
worlds.

Supported: revolute joints with limits and motors, heightfield ground
contact with Coulomb friction, semi-implicit Euler integration. Worlds are
described by static numpy spec tables; dynamic state is a ``(B, 6)`` array
``[x, y, angle, vx, vy, omega]`` per body.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

__all__ = ["BodySpec", "JointSpec", "ContactSpec", "PlanarWorld", "world_step", "joint_angles"]


class BodySpec(NamedTuple):
    """Static per-body properties (numpy, captured at trace time)."""

    inv_mass: np.ndarray  # (B,), 0 for static bodies
    inv_inertia: np.ndarray  # (B,)


class JointSpec(NamedTuple):
    """Revolute joints: point constraint + optional limits/motors."""

    body_a: np.ndarray  # (J,) parent index
    body_b: np.ndarray  # (J,) child index
    anchor_a: np.ndarray  # (J, 2) anchor in a's local frame
    anchor_b: np.ndarray  # (J, 2) anchor in b's local frame
    lower: np.ndarray  # (J,) lower joint-angle limit
    upper: np.ndarray  # (J,) upper limit
    ref_angle: np.ndarray  # (J,) angle_b - angle_a at the rest pose


class ContactSpec(NamedTuple):
    """Candidate contact probes (local points tested against the ground)."""

    body: np.ndarray  # (C,) body index
    point: np.ndarray  # (C, 2) local coordinates
    friction: np.ndarray  # (C,)


class PlanarWorld(NamedTuple):
    """A full static world description."""

    bodies: BodySpec
    joints: JointSpec
    contacts: ContactSpec
    gravity: float = -10.0
    dt: float = 1.0 / 50.0
    velocity_iterations: int = 8
    baumgarte: float = 0.2
    contact_slop: float = 0.005


def _rot(xp, px, py, c, s):
    return px * c - py * s, px * s + py * c


def joint_angles(xp, state, world: PlanarWorld):
    """Current joint angles and speeds: (J,), (J,)."""
    a = world.joints.body_a
    b = world.joints.body_b
    angle = state[..., 2]
    omega = state[..., 5]
    j_angle = angle[..., b] - angle[..., a] - world.joints.ref_angle
    j_speed = omega[..., b] - omega[..., a]
    return j_angle, j_speed


def world_step(
    xp,
    state,
    world: PlanarWorld,
    motor_speed,
    motor_torque,
    ground_height_fn,
    external_force=None,
):
    """Advance the world one ``dt``.

    Args:
        xp: numpy or jax.numpy.
        state: (B, 6) body states.
        motor_speed: (J,) target relative angular velocities.
        motor_torque: (J,) max motor torques (0 disables a motor).
        ground_height_fn: ``f(x) -> ground_y`` heightfield callback.
        external_force: optional (B, 3) [fx, fy, torque] per body.

    Returns:
        (new_state, contact_flags) where contact_flags is (C,) bool.
    """
    dt = world.dt
    inv_m = xp.asarray(world.bodies.inv_mass)
    inv_i = xp.asarray(world.bodies.inv_inertia)

    pos = state[..., 0:2]
    angle = state[..., 2]
    vel = state[..., 3:5]
    omega = state[..., 5]

    # --- integrate external forces + gravity into velocities --------------
    gravity_scale = xp.where(inv_m > 0, 1.0, 0.0)
    vel = vel + xp.stack(
        [xp.zeros_like(angle), xp.full_like(angle, world.gravity) * gravity_scale],
        axis=-1,
    ) * dt
    if external_force is not None:
        vel = vel + external_force[..., 0:2] * (inv_m[..., None] * dt)
        omega = omega + external_force[..., 2] * (inv_i * dt)

    c = xp.cos(angle)
    s = xp.sin(angle)

    J = len(world.joints.body_a)
    C = len(world.contacts.body)

    # Precompute joint anchor arms in world frame (from pre-step pose).
    joint_arms = []
    for j in range(J):
        a = int(world.joints.body_a[j])
        b = int(world.joints.body_b[j])
        rax, ray = _rot(
            xp, world.joints.anchor_a[j, 0], world.joints.anchor_a[j, 1], c[..., a], s[..., a]
        )
        rbx, rby = _rot(
            xp, world.joints.anchor_b[j, 0], world.joints.anchor_b[j, 1], c[..., b], s[..., b]
        )
        # position error for Baumgarte bias
        errx = (pos[..., b, 0] + rbx) - (pos[..., a, 0] + rax)
        erry = (pos[..., b, 1] + rby) - (pos[..., a, 1] + ray)
        joint_arms.append((a, b, rax, ray, rbx, rby, errx, erry))

    # Contact precomputation: world points, depths.
    contact_data = []
    for k in range(C):
        b = int(world.contacts.body[k])
        rx, ry = _rot(
            xp, world.contacts.point[k, 0], world.contacts.point[k, 1], c[..., b], s[..., b]
        )
        px = pos[..., b, 0] + rx
        py = pos[..., b, 1] + ry
        gy = ground_height_fn(px)
        depth = gy - py
        contact_data.append((b, rx, ry, depth))

    # --- velocity iterations ---------------------------------------------
    for _ in range(world.velocity_iterations):
        # joint motors + limits
        j_angle_all = None
        for j in range(J):
            a, b, rax, ray, rbx, rby, errx, erry = joint_arms[j]

            # motor: drive relative omega toward motor_speed, clamped
            rel_omega = omega[..., b] - omega[..., a]
            k_ang = inv_i[a] + inv_i[b]
            imp_motor = xp.where(
                k_ang > 0, (motor_speed[..., j] - rel_omega) / xp.maximum(k_ang, 1e-9), 0.0
            )
            max_imp = motor_torque[..., j] * dt
            imp_motor = xp.clip(imp_motor, -max_imp, max_imp)
            omega = _add_at(xp, omega, a, -imp_motor * inv_i[a])
            omega = _add_at(xp, omega, b, imp_motor * inv_i[b])

            # limits: push joint angle back into [lower, upper]
            j_angle = angle[..., b] - angle[..., a] - world.joints.ref_angle[j]
            rel_omega = omega[..., b] - omega[..., a]
            lower_err = j_angle - world.joints.lower[j]  # negative when violated
            upper_err = world.joints.upper[j] - j_angle  # negative when violated
            # lower limit: drive rel_omega up to at least β/dt·|violation|
            target_low = -xp.minimum(lower_err, 0.0) * (world.baumgarte / dt)
            imp_low = xp.where(
                lower_err < 0,
                xp.maximum(target_low - rel_omega, 0.0) / xp.maximum(k_ang, 1e-9),
                0.0,
            )
            omega = _add_at(xp, omega, a, -imp_low * inv_i[a])
            omega = _add_at(xp, omega, b, imp_low * inv_i[b])
            rel_omega = omega[..., b] - omega[..., a]
            # upper limit: drive rel_omega down to at most -β/dt·|violation|
            target_up = xp.minimum(upper_err, 0.0) * (world.baumgarte / dt)
            imp_up = xp.where(
                upper_err < 0,
                xp.minimum(target_up - rel_omega, 0.0) / xp.maximum(k_ang, 1e-9),
                0.0,
            )
            omega = _add_at(xp, omega, a, -imp_up * inv_i[a])
            omega = _add_at(xp, omega, b, imp_up * inv_i[b])

            # point constraint: zero relative velocity at the anchor
            vax = vel[..., a, 0] - omega[..., a] * ray
            vay = vel[..., a, 1] + omega[..., a] * rax
            vbx = vel[..., b, 0] - omega[..., b] * rby
            vby = vel[..., b, 1] + omega[..., b] * rbx
            cdx = vbx - vax + errx * (world.baumgarte / dt)
            cdy = vby - vay + erry * (world.baumgarte / dt)

            k11 = inv_m[a] + inv_m[b] + inv_i[a] * ray * ray + inv_i[b] * rby * rby
            k12 = -inv_i[a] * rax * ray - inv_i[b] * rbx * rby
            k22 = inv_m[a] + inv_m[b] + inv_i[a] * rax * rax + inv_i[b] * rbx * rbx
            det = k11 * k22 - k12 * k12
            det = xp.where(xp.abs(det) < 1e-12, 1e-12, det)
            ix = -(k22 * cdx - k12 * cdy) / det
            iy = -(k11 * cdy - k12 * cdx) / det

            vel = _add_at2(xp, vel, a, -ix * inv_m[a], -iy * inv_m[a])
            vel = _add_at2(xp, vel, b, ix * inv_m[b], iy * inv_m[b])
            omega = _add_at(xp, omega, a, -(rax * iy - ray * ix) * inv_i[a])
            omega = _add_at(xp, omega, b, (rbx * iy - rby * ix) * inv_i[b])

        # ground contacts
        for k in range(C):
            b, rx, ry, depth = contact_data[k]
            active = depth > 0.0

            pvx = vel[..., b, 0] - omega[..., b] * ry
            pvy = vel[..., b, 1] + omega[..., b] * rx

            bias = xp.maximum(depth - world.contact_slop, 0.0) * (world.baumgarte / dt)
            k_n = inv_m[b] + inv_i[b] * rx * rx
            jn = xp.where(active, xp.maximum(-(pvy - bias) / xp.maximum(k_n, 1e-9), 0.0), 0.0)

            k_t = inv_m[b] + inv_i[b] * ry * ry
            jt_raw = xp.where(active, -pvx / xp.maximum(k_t, 1e-9), 0.0)
            mu = world.contacts.friction[k]
            jt = xp.clip(jt_raw, -mu * jn, mu * jn)

            vel = _add_at2(xp, vel, b, jt * inv_m[b], jn * inv_m[b])
            omega = _add_at(xp, omega, b, (rx * jn - ry * jt) * inv_i[b])

    # --- integrate positions ----------------------------------------------
    pos = pos + vel * dt
    angle = angle + omega * dt

    new_state = xp.concatenate(
        [pos, angle[..., None], vel, omega[..., None]], axis=-1
    )
    contact_flags = xp.stack([cd[3] > 0.0 for cd in contact_data], axis=-1)
    return new_state, contact_flags


def _add_at(xp, arr, idx: int, delta):
    """arr[..., idx] += delta (functional on jax, in-place-free on numpy)."""
    if hasattr(arr, "at"):
        return arr.at[..., idx].add(delta)
    arr = arr.copy()
    arr[..., idx] += delta
    return arr


def _add_at2(xp, arr, idx: int, dx, dy):
    """arr[..., idx, 0] += dx; arr[..., idx, 1] += dy."""
    if hasattr(arr, "at"):
        arr = arr.at[..., idx, 0].add(dx)
        return arr.at[..., idx, 1].add(dy)
    arr = arr.copy()
    arr[..., idx, 0] += dx
    arr[..., idx, 1] += dy
    return arr
