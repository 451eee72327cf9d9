"""Mini 2D articulated rigid-body engine, fully jittable.

This is the TPU-native replacement for the Box2D C++ solver (SURVEY.md
§2.10): the same split-impulse sequential algorithm Box2D uses —
velocity-level constraint solving followed by a non-linear Gauss-Seidel
POSITION pass that removes penetration and joint drift by moving bodies
directly (zero kinetic energy injected) — but with a *fixed* topology,
*fixed* contact-candidate set, and *fixed* iteration counts, so the whole
step is static-shape XLA code that vmaps across thousands of worlds.

An earlier version stabilized positions with velocity-level Baumgarte bias
(penetration folded into the contact/joint velocity targets). That injects
real momentum: a deliberately-violated initial pose — e.g. BipedalWalker's
legs, which the reference creates 0.53 m away from their hip anchors and
lets Box2D's position solver assemble — was ejected at ~6 m/s instead of
settling, skewing every downstream return distribution.

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
    position_iterations: int = 4
    baumgarte: float = 0.2  # position-pass contact correction factor (b2_baumgarte)
    contact_slop: float = 0.005
    max_correction: float = 0.2  # per-iteration position clamp (b2_maxLinearCorrection)
    # Per-iteration clamp on the JOINT point-constraint position correction.
    # 0.0 = solve the full anchor error in one shot per iteration (default).
    # >0 = Box2D-style bounded sub-pulls: each iteration corrects at most
    # this many metres of anchor error, so a large violation (e.g. the
    # walker's 0.53 m creation-pose hip detachment) is resolved over several
    # iterations, transiently rotating the light links exactly like the real
    # engine's assembly transient (observed: Box2D bends the walker's knees
    # to 0.86 rad for one frame while snapping the legs up).
    joint_correction_clamp: float = 0.0


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
    warm_start=None,
):
    """Advance the world one ``dt``.

    Args:
        xp: numpy or jax.numpy.
        state: (B, 6) body states.
        motor_speed: (J,) target relative angular velocities.
        motor_torque: (J,) max motor torques (0 disables a motor).
        ground_height_fn: ``f(x) -> ground_y`` heightfield callback.
        external_force: optional (B, 3) [fx, fy, torque] per body.
        warm_start: optional ``(j_imp (..., J, 5), c_imp (..., C, 2))`` —
            the previous step's accumulated impulses, applied up front and
            used to seed the accumulators (Box2D warm starting,
            b2Island::Solve → initVelocityConstraints). Without it the
            sequential solver stalls in a limit cycle on heavy-on-light
            chains (LunarLander hull:leg inertia ratio ~3000): each
            iteration's motor/support impulse is undone by the point
            constraint, the hull never stops sinking, and the legs splay
            until the hull strikes the ground. Warm starting lets the
            support force build across steps exactly like Box2D's resting
            stacks.

    Returns:
        ``(new_state, contact_flags, (j_imp, c_imp))`` where contact_flags
        is (C,) bool and the impulse arrays feed the next call's
        ``warm_start``. Joint impulse rows are ``[motor, low, up, px, py]``;
        contact rows ``[normal, tangent]``.
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
        joint_arms.append((a, b, rax, ray, rbx, rby))

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

    # --- velocity iterations (no position terms: split impulse) -----------
    # Inequality/clamped impulses ACCUMULATE across iterations with the
    # clamp applied to the accumulated total (Box2D's scheme). Clamping each
    # iteration's increment instead lets a loaded motor re-apply its full
    # budget every iteration — measured up to velocity_iterations x the
    # specified torque, which made random-policy walkers thrash and fall in
    # a third of the reference's survival time.
    zero = xp.zeros_like(angle[..., 0])
    acc_motor = [zero] * J
    acc_low = [zero] * J
    acc_up = [zero] * J
    acc_n = [zero] * C
    acc_t = [zero] * C
    acc_jx = [zero] * J
    acc_jy = [zero] * J
    if warm_start is not None:
        j_imp, c_imp = warm_start
        for j in range(J):
            a, b, rax, ray, rbx, rby = joint_arms[j]
            wm = j_imp[..., j, 0]
            wl = j_imp[..., j, 1]
            wu = j_imp[..., j, 2]
            px = j_imp[..., j, 3]
            py = j_imp[..., j, 4]
            ang_l = wm + wl + wu
            acc_motor[j], acc_low[j], acc_up[j] = wm, wl, wu
            acc_jx[j], acc_jy[j] = px, py
            vel = _add_at2(xp, vel, a, -px * inv_m[a], -py * inv_m[a])
            vel = _add_at2(xp, vel, b, px * inv_m[b], py * inv_m[b])
            omega = _add_at(xp, omega, a, -((rax * py - ray * px) + ang_l) * inv_i[a])
            omega = _add_at(xp, omega, b, ((rbx * py - rby * px) + ang_l) * inv_i[b])
        for k in range(C):
            b, rx, ry, depth = contact_data[k]
            # a separated contact drops its stored impulse (Box2D destroys
            # the contact constraint when the AABBs separate)
            live = depth > 0.0
            jn = xp.where(live, c_imp[..., k, 0], 0.0)
            jt = xp.where(live, c_imp[..., k, 1], 0.0)
            acc_n[k], acc_t[k] = jn, jt
            vel = _add_at2(xp, vel, b, jt * inv_m[b], jn * inv_m[b])
            omega = _add_at(xp, omega, b, (rx * jn - ry * jt) * inv_i[b])
    for _ in range(world.velocity_iterations):
        # joint motors + limits
        for j in range(J):
            a, b, rax, ray, rbx, rby = joint_arms[j]

            # motor: drive relative omega toward motor_speed; total impulse
            # over the step bounded by maxMotorTorque * dt
            rel_omega = omega[..., b] - omega[..., a]
            k_ang = xp.maximum(inv_i[a] + inv_i[b], 1e-9)
            raw = (motor_speed[..., j] - rel_omega) / k_ang
            max_imp = motor_torque[..., j] * dt
            new_acc = xp.clip(acc_motor[j] + raw, -max_imp, max_imp)
            imp_motor = new_acc - acc_motor[j]
            acc_motor[j] = new_acc
            omega = _add_at(xp, omega, a, -imp_motor * inv_i[a])
            omega = _add_at(xp, omega, b, imp_motor * inv_i[b])

            # limits: block velocity INTO a violated limit (the angle
            # overshoot itself is removed by the position pass); the
            # accumulated impulse is one-signed but an iteration may undo
            # part of a previous over-correction
            j_angle = angle[..., b] - angle[..., a] - world.joints.ref_angle[j]
            rel_omega = omega[..., b] - omega[..., a]
            at_lower = j_angle - world.joints.lower[j] < 0
            raw = xp.where(at_lower, -rel_omega / k_ang, -acc_low[j])
            new_acc = xp.maximum(acc_low[j] + raw, 0.0)
            imp_low = new_acc - acc_low[j]
            acc_low[j] = new_acc
            omega = _add_at(xp, omega, a, -imp_low * inv_i[a])
            omega = _add_at(xp, omega, b, imp_low * inv_i[b])
            rel_omega = omega[..., b] - omega[..., a]
            at_upper = world.joints.upper[j] - j_angle < 0
            raw = xp.where(at_upper, -rel_omega / k_ang, -acc_up[j])
            new_acc = xp.minimum(acc_up[j] + raw, 0.0)
            imp_up = new_acc - acc_up[j]
            acc_up[j] = new_acc
            omega = _add_at(xp, omega, a, -imp_up * inv_i[a])
            omega = _add_at(xp, omega, b, imp_up * inv_i[b])

            # point constraint: zero relative velocity at the anchor
            # (equality constraint — no clamp, no accumulation needed)
            vax = vel[..., a, 0] - omega[..., a] * ray
            vay = vel[..., a, 1] + omega[..., a] * rax
            vbx = vel[..., b, 0] - omega[..., b] * rby
            vby = vel[..., b, 1] + omega[..., b] * rbx
            cdx = vbx - vax
            cdy = vby - vay

            k11 = inv_m[a] + inv_m[b] + inv_i[a] * ray * ray + inv_i[b] * rby * rby
            k12 = -inv_i[a] * rax * ray - inv_i[b] * rbx * rby
            k22 = inv_m[a] + inv_m[b] + inv_i[a] * rax * rax + inv_i[b] * rbx * rbx
            det = k11 * k22 - k12 * k12
            det = xp.where(xp.abs(det) < 1e-12, 1e-12, det)
            ix = -(k22 * cdx - k12 * cdy) / det
            iy = -(k11 * cdy - k12 * cdx) / det
            acc_jx[j] = acc_jx[j] + ix
            acc_jy[j] = acc_jy[j] + iy

            vel = _add_at2(xp, vel, a, -ix * inv_m[a], -iy * inv_m[a])
            vel = _add_at2(xp, vel, b, ix * inv_m[b], iy * inv_m[b])
            omega = _add_at(xp, omega, a, -(rax * iy - ray * ix) * inv_i[a])
            omega = _add_at(xp, omega, b, (rbx * iy - rby * ix) * inv_i[b])

        # ground contacts: stop approach velocity only (no Baumgarte bias —
        # penetration is removed positionally, so nothing gets launched);
        # friction clamps against the ACCUMULATED normal impulse so it keeps
        # acting across iterations while a foot slides
        for k in range(C):
            b, rx, ry, depth = contact_data[k]
            active = depth > 0.0

            pvy = vel[..., b, 1] + omega[..., b] * rx
            k_n = xp.maximum(inv_m[b] + inv_i[b] * rx * rx, 1e-9)
            raw_n = xp.where(active, -pvy / k_n, -acc_n[k])
            new_acc_n = xp.maximum(acc_n[k] + raw_n, 0.0)
            jn = new_acc_n - acc_n[k]
            acc_n[k] = new_acc_n
            vel = _add_at2(xp, vel, b, xp.zeros_like(jn), jn * inv_m[b])
            omega = _add_at(xp, omega, b, rx * jn * inv_i[b])

            pvx = vel[..., b, 0] - omega[..., b] * ry
            k_t = xp.maximum(inv_m[b] + inv_i[b] * ry * ry, 1e-9)
            raw_t = xp.where(active, -pvx / k_t, -acc_t[k])
            mu = world.contacts.friction[k]
            new_acc_t = xp.clip(acc_t[k] + raw_t, -mu * new_acc_n, mu * new_acc_n)
            jt = new_acc_t - acc_t[k]
            acc_t[k] = new_acc_t
            vel = _add_at2(xp, vel, b, jt * inv_m[b], xp.zeros_like(jt))
            omega = _add_at(xp, omega, b, -ry * jt * inv_i[b])

    # --- integrate positions ----------------------------------------------
    pos = pos + vel * dt
    angle = angle + omega * dt

    # --- position pass (non-linear Gauss-Seidel, Box2D SolvePosition...) ---
    # Joint drift and contact penetration are removed by moving bodies
    # directly; velocities are untouched, so no kinetic energy is injected.
    # Box2D's island order: contacts first, then joints (limit before point
    # within each joint), so an over-determined squeeze parks its residual
    # in the joints — not as ground penetration.
    max_ang_corr = 8.0 * 3.14159265 / 180.0  # b2_maxAngularCorrection
    for _ in range(world.position_iterations):
        c = xp.cos(angle)
        s = xp.sin(angle)
        for k in range(C):
            b = int(world.contacts.body[k])
            rx, ry = _rot(
                xp, world.contacts.point[k, 0], world.contacts.point[k, 1], c[..., b], s[..., b]
            )
            px = pos[..., b, 0] + rx
            py = pos[..., b, 1] + ry
            depth = ground_height_fn(px) - py
            corr = xp.clip(
                world.baumgarte * (depth - world.contact_slop), 0.0, world.max_correction
            )
            k_n = xp.maximum(inv_m[b] + inv_i[b] * rx * rx, 1e-9)
            lam = corr / k_n
            pos = _add_at2(xp, pos, b, xp.zeros_like(lam), lam * inv_m[b])
            angle = _add_at(xp, angle, b, rx * lam * inv_i[b])
            c = xp.cos(angle)
            s = xp.sin(angle)

        for j in range(J):
            a = int(world.joints.body_a[j])
            b = int(world.joints.body_b[j])

            # joint-limit overshoot first (b2RevoluteJoint order), clamped
            # per iteration like b2_maxAngularCorrection
            j_angle = angle[..., b] - angle[..., a] - world.joints.ref_angle[j]
            k_ang = xp.maximum(inv_i[a] + inv_i[b], 1e-9)
            over_low = xp.minimum(j_angle - world.joints.lower[j], 0.0)
            over_up = xp.maximum(j_angle - world.joints.upper[j], 0.0)
            corr = xp.clip(-(over_low + over_up), -max_ang_corr, max_ang_corr)
            angle = _add_at(xp, angle, a, -corr * inv_i[a] / k_ang)
            angle = _add_at(xp, angle, b, corr * inv_i[b] / k_ang)
            c = xp.cos(angle)
            s = xp.sin(angle)

            rax, ray = _rot(
                xp, world.joints.anchor_a[j, 0], world.joints.anchor_a[j, 1], c[..., a], s[..., a]
            )
            rbx, rby = _rot(
                xp, world.joints.anchor_b[j, 0], world.joints.anchor_b[j, 1], c[..., b], s[..., b]
            )
            errx = (pos[..., b, 0] + rbx) - (pos[..., a, 0] + rax)
            erry = (pos[..., b, 1] + rby) - (pos[..., a, 1] + ray)
            if world.joint_correction_clamp > 0.0:
                # Box2D-style bounded sub-pull (see PlanarWorld): correct at
                # most `joint_correction_clamp` metres of anchor error per
                # iteration. Re-rotates light links every sub-pull — the
                # real engine's assembly transient (knees bent ~0.86 rad for
                # one frame while the legs snap up to the hull).
                err_len = xp.sqrt(errx * errx + erry * erry)
                scale = xp.minimum(1.0, world.joint_correction_clamp / xp.maximum(err_len, 1e-9))
                errx = errx * scale
                erry = erry * scale
            # else: solve the full point error in one shot per iteration —
            # rotates once and converges without the transient.

            k11 = inv_m[a] + inv_m[b] + inv_i[a] * ray * ray + inv_i[b] * rby * rby
            k12 = -inv_i[a] * rax * ray - inv_i[b] * rbx * rby
            k22 = inv_m[a] + inv_m[b] + inv_i[a] * rax * rax + inv_i[b] * rbx * rbx
            det = k11 * k22 - k12 * k12
            det = xp.where(xp.abs(det) < 1e-12, 1e-12, det)
            ix = -(k22 * errx - k12 * erry) / det
            iy = -(k11 * erry - k12 * errx) / det

            pos = _add_at2(xp, pos, a, -ix * inv_m[a], -iy * inv_m[a])
            pos = _add_at2(xp, pos, b, ix * inv_m[b], iy * inv_m[b])
            angle = _add_at(xp, angle, a, -(rax * iy - ray * ix) * inv_i[a])
            angle = _add_at(xp, angle, b, (rbx * iy - rby * ix) * inv_i[b])
            c = xp.cos(angle)
            s = xp.sin(angle)

    new_state = xp.concatenate(
        [pos, angle[..., None], vel, omega[..., None]], axis=-1
    )
    contact_flags = xp.stack([cd[3] > 0.0 for cd in contact_data], axis=-1)
    j_imp_out = xp.stack(
        [
            xp.stack([acc_motor[j], acc_low[j], acc_up[j], acc_jx[j], acc_jy[j]], axis=-1)
            for j in range(J)
        ],
        axis=-2,
    ) if J else xp.zeros(angle.shape[:-1] + (0, 5))
    c_imp_out = xp.stack(
        [xp.stack([acc_n[k], acc_t[k]], axis=-1) for k in range(C)], axis=-2
    ) if C else xp.zeros(angle.shape[:-1] + (0, 2))
    return new_state, contact_flags, (j_imp_out, c_imp_out)


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
