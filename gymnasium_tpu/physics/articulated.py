"""Articulated 3D rigid-body dynamics in closed geometric form.

The TPU-native replacement for the MuJoCo C engine (SURVEY.md §2.10): instead
of translating Featherstone's recursive algorithms, forward kinematics over a
chain of 1-DoF coordinate joints also records each dof's world axis a_k and
pivot o_k (``fk_full``), from which everything assembles with shallow algebra:

- geometric Jacobians  ∂x/∂q_k = a_k × (x − o_k)  (hinge) / a_k (slide)
- mass matrix          M = Σ_b m JᵥᵀJᵥ + JωᵀI_wJω + diag(armature)
- bias forces          Newton–Euler with q̈=0 accelerations from ONE forward
                       tangent through the Jacobian code, mapped back via Jᵀ
- linear solve         statically-unrolled column-vectorized Cholesky
                       (batched ``jnp.linalg.solve`` serializes on TPU)

and the step solves ``(M + dt·D) q̈ = τ_actuation + J_cᵀ f_contact − c − D q̇``.
The Lagrangian-autodiff formulation (``kinetic_energy``/``potential``) is kept
as the test oracle; the geometric path is verified bit-equivalent against it
(tests/physics/). TPU lowering rules that shaped this code: docs/BENCHMARKS.md.

Joints are slide/hinge about arbitrary axes. A floating base
(``root_free=True``) is singularity-free: position state carries a unit
quaternion (``nq = nv + 1``, layout ``[x y z | qw qx qy qz | joints]``) while
velocity state stays ``nv``-dimensional with a body-frame angular velocity at
``qvel[3:6]`` — the same free-joint convention as the reference's MuJoCo
models (reference envs/mujoco/assets/ant.xml, humanoid.xml root joints).
Integration composes ``quat ⊗ exp(dt·ω/2)`` and renormalizes; all dynamics
quantities (M, bias, contacts) live in velocity space via geometric
Jacobians, so no Euler-angle singularity exists anywhere. Models are static
spec tables (numpy) extracted from the reference MJCF assets.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np

__all__ = [
    "JointSpec",
    "BodySpec",
    "ArticulatedModel",
    "fk",
    "step_fn",
    "make_dynamics",
    "init_qpos",
    "integrate_pos",
]

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
    # surrounding-medium properties (MuJoCo <option density viscosity>,
    # swimmer.xml:3); zero disables the fluid-force pass
    fluid_density: float = 0.0
    fluid_viscosity: float = 0.0
    # ground contact material
    # Ceiling on the per-contact penalty spring: a scalar, or a (nc,) array
    # for per-geom values (emitted by the MJCF compiler from geom solref
    # and per-model calibration — see mjcf.compile_mjcf). The binding bound
    # is almost always the explicit-stability one (m_eff/dt², see
    # _contact_point_forces). One global knob demonstrably cannot serve all
    # robots: 100000 fixed the HUMANOID's feet (they penetrated 2-6 cm
    # under fall transients at 10000 and it sank through the healthy-z
    # floor ~2.5 steps early) but kicked the supine HUMANOIDSTANDUP off
    # the floor (zero-action deviation 0.195 → 1.59 vs MuJoCo), so the
    # standup model carries a per-model 10000 in its compiled spec.
    contact_stiffness: Any = 100000.0
    contact_damping: float = 100.0
    # Contact damping ratio (c = ratio * sqrt(k_c * m_eff)); 2.0 is critical.
    contact_damp_ratio: float = 1.4
    # Explicit-stability fraction: k_c <= m_eff * (alpha / dt)^2. alpha = 1
    # puts the contact spring's half-period at the substep (Nyquist edge).
    contact_alpha: float = 1.0
    friction: float = 1.0
    limit_stiffness: float = 500.0
    # world ground-plane height; -inf-like when the model has no floor
    # (e.g. Pusher's table sits at z=-0.325, reference pusher_v5.xml:18)
    ground_z: float = 0.0
    # True when dofs 0-5 form a free root: qpos then has a quaternion at
    # [3:7] (nq = nv + 1) and qvel[3:6] is the body-frame angular velocity
    root_free: bool = False
    # MuJoCo sites: massless body-frame reference points (document order,
    # matching MjData.site_xpos row order); world position via FK
    site_body: np.ndarray = np.zeros((0,), dtype=np.int32)
    site_pos: np.ndarray = np.zeros((0, 3))

    @property
    def nv(self) -> int:
        return len(self.joints.body)

    @property
    def nq(self) -> int:
        return self.nv + 1 if self.root_free else self.nv

    @property
    def nu(self) -> int:
        return len(self.act_dof)

    @property
    def nbody(self) -> int:
        """Body count INCLUDING the implicit world body (MuJoCo convention:
        reference tests read ``env.model.nbody`` where row 0 is the world)."""
        return len(self.bodies.parent) + 1

    @property
    def body_mass(self) -> np.ndarray:
        """(nbody,) masses with the world's 0 at row 0 (MuJoCo layout)."""
        return np.concatenate([[0.0], np.asarray(self.bodies.mass, dtype=np.float64)])

    @property
    def ntendon(self) -> int:
        """Tendons are not modeled by this engine."""
        return 0


def _quat_to_mat_np(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _quat_to_mat_j(jnp, q):
    """(w,x,y,z) quaternion -> rotation matrix, jittable. Tolerates
    non-normalized input (the formula divides by |q|²), so reset noise on
    raw quat components behaves like MuJoCo's mj_normalizeQuat."""
    n = jnp.sum(q * q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    s = 2.0 / jnp.maximum(n, 1e-12)
    return jnp.stack(
        [
            jnp.stack([1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)]),
            jnp.stack([s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)]),
            jnp.stack([s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)]),
        ]
    )


def _quat_mul_j(jnp, a, b):
    """Hamilton product (w,x,y,z)."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def _rotvec_to_quat_j(jnp, v):
    """exp map: rotation vector -> quaternion, smooth at 0 to ALL autodiff
    orders (the oracle tests take hessians through this).

    Near θ=0 both factors switch to their Taylor series; the large branch's
    sqrt argument is replaced by 1 when unselected (double-where pattern) so
    its higher derivatives never see a zero and produce NaN."""
    theta2 = jnp.sum(v * v)
    big = theta2 > 1e-10
    theta = jnp.sqrt(jnp.where(big, theta2, 1.0))
    half = 0.5 * theta
    sinc_half = jnp.where(big, jnp.sin(half) / theta, 0.5 - theta2 / 48.0)
    cos_half = jnp.where(big, jnp.cos(half), 1.0 - theta2 / 8.0 + theta2 * theta2 / 384.0)
    return jnp.concatenate([cos_half[None], sinc_half * v])


def init_qpos(model: ArticulatedModel) -> np.ndarray:
    """The rest-pose position vector (nq).

    Free root: the root body's fixed pos and quat from the MJCF — MuJoCo
    folds a free-jointed body's pos/quat into qpos0, and qpos holds the
    ABSOLUTE world pose thereafter — then the joint references.
    """
    ref = np.asarray(model.joints.ref, dtype=np.float64)
    if not model.root_free:
        return ref.copy()
    root = int(model.joints.body[0])
    return np.concatenate(
        [np.asarray(model.bodies.pos[root]), np.asarray(model.bodies.quat[root]), ref[6:]]
    )


def dof_positions(model: ArticulatedModel, q):
    """Per-dof scalar positions (nv,) for springs/limits: with a free root
    the quaternion block contributes zeros (root dofs are never limited or
    sprung)."""
    import jax.numpy as jnp

    if not model.root_free:
        return q
    return jnp.concatenate([q[:3], jnp.zeros(3, q.dtype), q[7:]])


def integrate_pos(model: ArticulatedModel, q, v, dt):
    """Position update ``q ⊕ dt·v``: plain Euler for translations/joints,
    quaternion composition ``quat ⊗ exp(dt·ω_body/2)`` (right-multiplied:
    ω is body-frame) with renormalization for a free root.

    Also serves as the retraction for convective-term jvp's: holding ``v``
    fixed and differentiating along ``dt`` gives the true zero-acceleration
    motion of the quasi-velocity system.
    """
    import jax.numpy as jnp

    if not model.root_free:
        return q + dt * v
    pos = q[:3] + dt * v[:3]
    dq = _rotvec_to_quat_j(jnp, dt * v[3:6])
    quat = _quat_mul_j(jnp, q[3:7], dq)
    quat = quat / jnp.sqrt(jnp.sum(quat * quat) + 1e-24)
    joints = q[7:] + dt * v[6:]
    return jnp.concatenate([pos, quat, joints])


def _mm(jnp, A, B):
    """3x3 @ 3x3 as broadcast-multiply-sum: vmapped ``@`` lowers to a
    dot_general whose 3-wide dims pad to 128-wide MXU tiles AND break XLA
    elementwise fusion; this form stays on the VPU and fuses with its
    neighbors in the FK chain."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _mv(jnp, A, v):
    """3x3 @ 3 as broadcast-multiply-sum (see _mm)."""
    return jnp.sum(A * v[..., None, :], axis=-1)


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


def _is_free_root_body(model: ArticulatedModel, b: int) -> bool:
    return (
        model.root_free
        and int(model.bodies.dof_start[b]) == 0
        and int(model.bodies.dof_count[b]) == 6
    )


def _q_index(model: ArticulatedModel, k: int) -> int:
    """Position index of dof ``k`` (the root quaternion shifts joints by 1)."""
    return k + 1 if model.root_free and k >= 6 else k


def fk(model: ArticulatedModel, q):
    """Forward kinematics: world rotation R (nbody,3,3) and frame origin p
    (nbody,3) for every body, as a pure jittable function of ``q`` (nq)."""
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

        if _is_free_root_body(model, b):
            # free joint: qpos IS the absolute world pose of the body frame
            # (MuJoCo folds the XML body pos/quat into qpos0 — see init_qpos)
            p = q[0:3]
            R = _quat_to_mat_j(jnp, q[3:7])
            Rs.append(R)
            ps.append(p)
            continue

        R_fix = jnp.asarray(_quat_to_mat_np(model.bodies.quat[b]))
        R = _mm(jnp, R_p, R_fix)
        p = p_p + _mv(jnp, R_p, jnp.asarray(model.bodies.pos[b]))

        start = int(model.bodies.dof_start[b])
        count = int(model.bodies.dof_count[b])
        for k in range(start, start + count):
            axis = model.joints.axis[k]
            anchor = jnp.asarray(model.joints.anchor[k])
            qk = q[_q_index(model, k)] - float(model.joints.ref[k])
            if int(model.joints.jtype[k]) == SLIDE:
                p = p + _mv(jnp, R, jnp.asarray(axis) * qk)
            else:
                R_j = _axis_angle_mat(jnp, axis, qk)
                p = p + _mv(jnp, R, anchor - _mv(jnp, R_j, anchor))
                R = _mm(jnp, R, R_j)
        Rs.append(R)
        ps.append(p)
    return jnp.stack(Rs), jnp.stack(ps)


def fk_full(model: ArticulatedModel, q):
    """FK that also records each dof's world-frame axis and (for hinges) the
    world pivot point at the moment the dof is applied — the raw material for
    geometric Jacobians (``∂x/∂q_k = a_k × (x − o_k)`` for hinges, ``a_k``
    for slides).

    Returns ``(R (nbody,3,3), p (nbody,3), axes_w (nv,3), pivots_w (nv,3))``.
    """
    import jax.numpy as jnp

    nbody = len(model.bodies.parent)
    Rs, ps = [], []
    axes_w = [None] * model.nv
    pivots_w = [None] * model.nv
    for b in range(nbody):
        parent = int(model.bodies.parent[b])
        if parent < 0:
            R_p = jnp.eye(3)
            p_p = jnp.zeros(3)
        else:
            R_p = Rs[parent]
            p_p = ps[parent]

        if _is_free_root_body(model, b):
            p = q[0:3]
            R = _quat_to_mat_j(jnp, q[3:7])
            # translational dofs: world axes, no pivot
            for k in range(3):
                axes_w[k] = jnp.asarray(np.eye(3)[k])
                pivots_w[k] = jnp.zeros(3)
            # rotational dofs: ω is body-frame, so the world axes are the
            # body's basis vectors (columns of R); rotation pivots at the
            # body frame origin
            for k in range(3):
                axes_w[3 + k] = R[:, k]
                pivots_w[3 + k] = p
            Rs.append(R)
            ps.append(p)
            continue

        R_fix = jnp.asarray(_quat_to_mat_np(model.bodies.quat[b]))
        R = _mm(jnp, R_p, R_fix)
        p = p_p + _mv(jnp, R_p, jnp.asarray(model.bodies.pos[b]))

        start = int(model.bodies.dof_start[b])
        count = int(model.bodies.dof_count[b])
        for k in range(start, start + count):
            axis = model.joints.axis[k]
            anchor = jnp.asarray(model.joints.anchor[k])
            qk = q[_q_index(model, k)] - float(model.joints.ref[k])
            axes_w[k] = _mv(jnp, R, jnp.asarray(axis))
            if int(model.joints.jtype[k]) == SLIDE:
                pivots_w[k] = jnp.zeros(3)
                p = p + _mv(jnp, R, jnp.asarray(axis) * qk)
            else:
                pivots_w[k] = p + _mv(jnp, R, anchor)  # fixed point of the rotation
                R_j = _axis_angle_mat(jnp, axis, qk)
                p = p + _mv(jnp, R, anchor - _mv(jnp, R_j, anchor))
                R = _mm(jnp, R, R_j)
        Rs.append(R)
        ps.append(p)
    return jnp.stack(Rs), jnp.stack(ps), jnp.stack(axes_w), jnp.stack(pivots_w)


def _build_fk_levels(model: ArticulatedModel):
    """Static node plan for level-batched FK.

    Nodes = body-fix transforms and dof transforms interleaved in kinematic
    order; nodes at equal tree depth compose in ONE batched op set, cutting
    the sequential chain from ~(nbody + nv) steps to the tree depth
    (humanoid: 36 -> 15)."""
    nbody = len(model.bodies.parent)
    nodes = []  # (kind, index, parent_node) kind: 0=body-fix, 1=dof
    body_final_node = {}
    for b in range(nbody):
        parent = int(model.bodies.parent[b])
        parent_node = body_final_node[parent] if parent >= 0 else -1
        nodes.append((0, b, parent_node))
        cur = len(nodes) - 1
        start, count = int(model.bodies.dof_start[b]), int(model.bodies.dof_count[b])
        for k in range(start, start + count):
            nodes.append((1, k, cur))
            cur = len(nodes) - 1
        body_final_node[b] = cur

    depth = [0] * len(nodes)
    for i, (_, _, p) in enumerate(nodes):
        depth[i] = 0 if p < 0 else depth[p] + 1
    levels = []
    for d in range(max(depth) + 1):
        levels.append([i for i in range(len(nodes)) if depth[i] == d])
    return nodes, levels, body_final_node


def fk_full_batched(model: ArticulatedModel, q, plan=None):
    """Level-batched :func:`fk_full`: identical outputs, sequential depth
    equal to the kinematic tree depth instead of the node count.

    Not implemented for free-root models (the sequential form is the hot
    path anyway — see the note in ``all_jacobians``)."""
    import jax.numpy as jnp

    assert not model.root_free, "fk_full_batched does not support free roots"

    nodes, levels, body_final_node = plan if plan is not None else _build_fk_levels(model)
    n_nodes = len(nodes)
    nbody = len(model.bodies.parent)

    # --- local transforms, all nodes at once ------------------------------
    R_loc = [None] * n_nodes
    p_loc = [None] * n_nodes
    # dof nodes: batched Rodrigues over all hinge dofs
    axes = jnp.asarray(model.joints.axis)  # (nv, 3)
    anchors = jnp.asarray(model.joints.anchor)
    refs = jnp.asarray(model.joints.ref)
    th = q - refs
    c = jnp.cos(th)[:, None, None]
    s = jnp.sin(th)[:, None, None]
    ax, ay, az = axes[:, 0], axes[:, 1], axes[:, 2]
    zero = jnp.zeros_like(ax)
    K = jnp.stack(
        [
            jnp.stack([zero, -az, ay], axis=-1),
            jnp.stack([az, zero, -ax], axis=-1),
            jnp.stack([-ay, ax, zero], axis=-1),
        ],
        axis=-2,
    )  # (nv, 3, 3) skew matrices, no scatters
    aa = axes[:, :, None] * axes[:, None, :]
    R_dof = jnp.eye(3) * c + s * K + (1 - c) * aa  # (nv, 3, 3)
    p_hinge = anchors - jnp.sum(R_dof * anchors[:, None, :], axis=-1)
    is_slide = jnp.asarray(model.joints.jtype == SLIDE)
    R_dof = jnp.where(is_slide[:, None, None], jnp.eye(3), R_dof)
    p_dof = jnp.where(is_slide[:, None], axes * th[:, None], p_hinge)

    for i, (kind, idx, _) in enumerate(nodes):
        if kind == 0:
            R_loc[i] = jnp.asarray(_quat_to_mat_np(model.bodies.quat[idx]))
            p_loc[i] = jnp.asarray(model.bodies.pos[idx])
        else:
            R_loc[i] = R_dof[idx]
            p_loc[i] = p_dof[idx]

    # --- compose level by level ------------------------------------------
    Rw = [None] * n_nodes
    pw = [None] * n_nodes
    for level in levels:
        for i in level:  # nodes in a level are independent; XLA runs them
            _, _, parent = nodes[i]  # in parallel (no data deps between them)
            if parent < 0:
                Rw[i] = R_loc[i]
                pw[i] = p_loc[i]
            else:
                Rw[i] = Rw[parent] @ R_loc[i]
                pw[i] = pw[parent] + jnp.sum(Rw[parent] * p_loc[i][None, :], axis=-1)

    R = jnp.stack([Rw[body_final_node[b]] for b in range(nbody)])
    p = jnp.stack([pw[body_final_node[b]] for b in range(nbody)])
    # per-dof world axis/pivot from the dof node's PARENT frame
    axes_w, pivots_w = [None] * model.nv, [None] * model.nv
    for i, (kind, idx, parent) in enumerate(nodes):
        if kind == 1:
            axes_w[idx] = jnp.sum(Rw[parent] * axes[idx][None, :], axis=-1)
            if int(model.joints.jtype[idx]) == SLIDE:
                pivots_w[idx] = jnp.zeros(3)
            else:
                pivots_w[idx] = pw[parent] + jnp.sum(
                    Rw[parent] * anchors[idx][None, :], axis=-1
                )
    return R, p, jnp.stack(axes_w), jnp.stack(pivots_w)


def _build_stacked_plan(model: ArticulatedModel):
    """Node plan for :func:`fk_full_stacked`.

    Nodes: kind 0 = body fixed transform, kind 1 = one dof, kind 2 = free
    root (consumes q[0:7] in one node). Returns (nodes, levels) with nodes =
    [(kind, index, parent_node)] and levels = lists of node ids at equal
    depth (composable in one stacked op)."""
    nbody = len(model.bodies.parent)
    nodes: list[tuple[int, int, int]] = []
    body_final: dict[int, int] = {}
    for b in range(nbody):
        parent = int(model.bodies.parent[b])
        parent_node = body_final[parent] if parent >= 0 else -1
        if _is_free_root_body(model, b):
            nodes.append((2, b, parent_node))
            body_final[b] = len(nodes) - 1
            continue
        nodes.append((0, b, parent_node))
        cur = len(nodes) - 1
        start, count = int(model.bodies.dof_start[b]), int(model.bodies.dof_count[b])
        for k in range(start, start + count):
            nodes.append((1, k, cur))
            cur = len(nodes) - 1
        body_final[b] = cur
    depth = [0] * len(nodes)
    for i, (_, _, p) in enumerate(nodes):
        depth[i] = 0 if p < 0 else depth[p] + 1
    levels = [
        [i for i in range(len(nodes)) if depth[i] == d] for d in range(max(depth) + 1)
    ]
    return nodes, levels, body_final


def fk_full_stacked(model: ArticulatedModel, q, plan=None):
    """:func:`fk_full` with per-LEVEL stacked composition: all nodes at equal
    tree depth compose in ONE batched multiply-sum, so the sequential chain
    is the tree depth (~6 for Ant) instead of the node count (~28). Output
    identical to ``fk_full``; free roots supported (the root collapses to a
    single quaternion node)."""
    import jax.numpy as jnp

    nodes, levels, body_final = plan if plan is not None else _build_stacked_plan(model)
    nbody = len(model.bodies.parent)
    nv = model.nv

    # --- all local transforms up front (one fused batch for the dofs) -----
    axes = jnp.asarray(model.joints.axis)
    anchors = jnp.asarray(model.joints.anchor)
    refs = jnp.asarray(model.joints.ref)
    qj = jnp.stack([q[_q_index(model, k)] for k in range(nv)]) if model.root_free else q
    th = qj - refs
    c = jnp.cos(th)[:, None, None]
    s = jnp.sin(th)[:, None, None]
    ax, ay, az = axes[:, 0], axes[:, 1], axes[:, 2]
    zero = jnp.zeros_like(ax)
    K = jnp.stack(
        [
            jnp.stack([zero, -az, ay], axis=-1),
            jnp.stack([az, zero, -ax], axis=-1),
            jnp.stack([-ay, ax, zero], axis=-1),
        ],
        axis=-2,
    )
    aa = axes[:, :, None] * axes[:, None, :]
    R_dof = jnp.eye(3) * c + s * K + (1 - c) * aa  # (nv,3,3)
    p_hinge = anchors - jnp.sum(R_dof * anchors[:, None, :], axis=-1)
    is_slide = jnp.asarray(model.joints.jtype == SLIDE)
    R_dof = jnp.where(is_slide[:, None, None], jnp.eye(3), R_dof)
    p_dof = jnp.where(is_slide[:, None], axes * th[:, None], p_hinge)

    R_loc, p_loc = [None] * len(nodes), [None] * len(nodes)
    for i, (kind, idx, _) in enumerate(nodes):
        if kind == 0:
            R_loc[i] = jnp.asarray(_quat_to_mat_np(model.bodies.quat[idx]))
            p_loc[i] = jnp.asarray(model.bodies.pos[idx])
        elif kind == 1:
            R_loc[i] = R_dof[idx]
            p_loc[i] = p_dof[idx]
        else:  # free root: absolute pose from state
            R_loc[i] = _quat_to_mat_j(jnp, q[3:7])
            p_loc[i] = q[0:3]

    # --- compose one level at a time --------------------------------------
    Rw, pw = [None] * len(nodes), [None] * len(nodes)
    for level in levels:
        roots = [i for i in level if nodes[i][2] < 0]
        inner = [i for i in level if nodes[i][2] >= 0]
        for i in roots:
            Rw[i], pw[i] = R_loc[i], p_loc[i]
        if not inner:
            continue
        Rp = jnp.stack([Rw[nodes[i][2]] for i in inner])  # (L,3,3)
        pp = jnp.stack([pw[nodes[i][2]] for i in inner])
        Rl = jnp.stack([R_loc[i] for i in inner])
        pl = jnp.stack([p_loc[i] for i in inner])
        Rn = jnp.sum(Rp[:, :, :, None] * Rl[:, None, :, :], axis=2)  # (L,3,3)
        pn = pp + jnp.sum(Rp * pl[:, None, :], axis=-1)
        for slot, i in enumerate(inner):
            Rw[i], pw[i] = Rn[slot], pn[slot]

    R = jnp.stack([Rw[body_final[b]] for b in range(nbody)])
    p = jnp.stack([pw[body_final[b]] for b in range(nbody)])

    # --- per-dof world axes/pivots from the pre-dof frames -----------------
    axes_w, pivots_w = [None] * nv, [None] * nv
    for i, (kind, idx, parent) in enumerate(nodes):
        if kind == 1:
            Rpre = Rw[parent]
            ppre = pw[parent]
            axes_w[idx] = jnp.sum(Rpre * axes[idx][None, :], axis=-1)
            if int(model.joints.jtype[idx]) == SLIDE:
                pivots_w[idx] = jnp.zeros(3)
            else:
                pivots_w[idx] = ppre + jnp.sum(Rpre * anchors[idx][None, :], axis=-1)
        elif kind == 2:
            Rroot, proot = Rw[i], pw[i]
            start = int(model.bodies.dof_start[idx])
            for k in range(3):
                axes_w[start + k] = jnp.asarray(np.eye(3)[k])
                pivots_w[start + k] = jnp.zeros(3)
            for k in range(3):
                axes_w[start + 3 + k] = Rroot[:, k]
                pivots_w[start + 3 + k] = proot
    return R, p, jnp.stack(axes_w), jnp.stack(pivots_w)


def ancestor_dof_mask(model: ArticulatedModel) -> np.ndarray:
    """Static (nbody, nv) bool: dof k moves body b (k belongs to b or an
    ancestor of b)."""
    nbody = len(model.bodies.parent)
    mask = np.zeros((nbody, model.nv), dtype=bool)
    for b in range(nbody):
        node = b
        while node >= 0:
            s = int(model.bodies.dof_start[node])
            c = int(model.bodies.dof_count[node])
            mask[b, s : s + c] = True
            node = int(model.bodies.parent[node])
    return mask


def strict_dof_ancestors(model: ArticulatedModel) -> np.ndarray:
    """Static (nv, nv) bool: dof j is applied BEFORE dof k on k's chain
    (ancestor-body dofs plus same-body dofs with smaller index)."""
    nv = model.nv
    body_mask = ancestor_dof_mask(model)
    strict = np.zeros((nv, nv), dtype=bool)
    for k in range(nv):
        b = int(model.joints.body[k])
        parent = int(model.bodies.parent[b])
        if parent >= 0:
            strict[k] = body_mask[parent]
        s = int(model.bodies.dof_start[b])
        strict[k, s:k] = True
    return strict


def _spd_solve(jnp, A, b):
    """Solve the SPD system ``A x = b`` with a statically-unrolled,
    column-vectorized Cholesky. ``jnp.linalg.solve`` on batched tiny
    matrices lowers to a serial LU on TPU (~10 ms/substep for the whole
    batch); this runs as ~15·nv fused vector ops instead."""
    n = A.shape[-1]
    dtype = A.dtype
    import numpy as _np

    idx = _np.arange(n)
    L = jnp.zeros_like(A)
    for j in range(n):
        c = A[:, j] - jnp.sum(L * L[j][None, :], axis=1)
        d = jnp.sqrt(jnp.maximum(c[j], 1e-12))
        col = jnp.where(jnp.asarray(idx >= j), c / d, jnp.zeros((), dtype))
        L = L.at[:, j].set(col)
    # forward: L y = b
    y = jnp.zeros_like(b)
    r = b
    for j in range(n):
        yj = r[j] / L[j, j]
        y = y.at[j].set(yj)
        r = r - L[:, j] * yj
    # backward: Lᵀ x = y
    x = jnp.zeros_like(b)
    s = y
    for j in reversed(range(n)):
        xj = s[j] / L[j, j]
        x = x.at[j].set(xj)
        s = s - L[j, :] * xj
    return x


def make_dynamics(model: ArticulatedModel):
    """Build jittable ``(q, qvel, ctrl) -> (q', qvel')`` plus helpers.

    Returns a dict of pure functions: ``step`` (one model.timestep),
    ``fk`` (kinematics), ``contacts(q) -> world points``, ``energy``.
    """
    import jax
    import jax.numpy as jnp

    # NOTE: all tiny tensor contractions below are written as
    # broadcast-multiply-sum instead of einsum/matmul: dims of size 3/7/9
    # would be MXU-tile-padded to 128 by dot_general, costing ~50x on TPU.

    nv = model.nv
    nbody = len(model.bodies.parent)
    masses = jnp.asarray(model.bodies.mass)
    coms = jnp.asarray(model.bodies.com)
    inertias = jnp.asarray(model.bodies.inertia)
    g = model.gravity

    def com_world(q):
        R, p = fk(model, q)
        return p + jnp.sum(R * coms[:, None, :], axis=-1), R

    def kinetic_energy(q, qd):
        # body velocities by differentiating FK along the position flow
        # q_t = q ⊕ t·qd (the plain coordinate tangent when there is no free
        # root, the quaternion retraction when there is) — autodiff-only,
        # independent of the closed-form geometric Jacobians, which keeps
        # this a valid oracle for them (tests/physics/).
        def flow(t):
            return com_world(integrate_pos(model, q, qd, t))

        (pc, R), (pc_dot, R_dot) = jax.jvp(flow, (jnp.zeros(()),), (jnp.ones(()),))
        # omega from skew(R_dot R^T)
        W = jnp.sum(R_dot[:, :, None, :] * R[:, None, :, :], axis=-1)
        omega = jnp.stack([W[:, 2, 1], W[:, 0, 2], W[:, 1, 0]], axis=-1)
        RI = jnp.sum(R[:, :, :, None] * inertias[:, None, :, :], axis=2)
        I_world = jnp.sum(RI[:, :, None, :] * R[:, None, :, :], axis=-1)
        T_lin = 0.5 * jnp.sum(masses * jnp.sum(pc_dot**2, axis=-1))
        T_ang = 0.5 * jnp.sum(jnp.sum(I_world * omega[:, :, None] * omega[:, None, :], axis=(1, 2)))
        T_arm = 0.5 * jnp.sum(jnp.asarray(model.joints.armature) * qd**2)
        return T_lin + T_ang + T_arm

    # V = -Σ m g·p with g = (0, 0, gravity); gravity < 0 ⇒ V grows with z.
    def potential(q):
        pc, _ = com_world(q)
        dq = dof_positions(model, q) - jnp.asarray(model.joints.ref)
        spring = 0.5 * jnp.sum(jnp.asarray(model.joints.stiffness) * dq**2)
        return -jnp.sum(masses * g * pc[:, 2]) + spring

    armature = jnp.asarray(model.joints.armature)

    contact_offs = jnp.asarray(model.contact_pos)
    has_contacts = len(model.contact_body) > 0
    # Static gathers as one-hot matmuls: indexed gathers lower to serial
    # dynamic-slices on TPU (~100x slower under vmap); the selection matrix
    # is a compile-time constant so XLA turns it into a tiny dense contract.
    nc = len(model.contact_body)
    sel_np = np.zeros((nc, nbody), dtype=np.float32)
    sel_np[np.arange(nc), np.asarray(model.contact_body)] = 1.0
    contact_sel = jnp.asarray(sel_np)
    scat_np = np.zeros((nv, model.nu), dtype=np.float32)
    scat_np[np.asarray(model.act_dof), np.arange(model.nu)] = 1.0
    act_scatter = jnp.asarray(scat_np)

    def kin_all(q):
        """FK outputs every downstream consumer needs — differentiated once."""
        R, p = fk(model, q)
        pc = p + jnp.sum(R * coms[:, None, :], axis=-1)
        if has_contacts:
            p_c = jnp.sum(contact_sel[:, :, None] * p[None, :, :], axis=1)  # (nc, 3)
            R_c = jnp.sum(contact_sel[:, :, None, None] * R[None, :, :, :], axis=1)
            cpts = p_c + jnp.sum(R_c * contact_offs[:, None, :], axis=-1)
        else:
            cpts = jnp.zeros((0, 3))
        return pc, R, cpts

    # static structure tables for the geometric Jacobians
    amask = jnp.asarray(ancestor_dof_mask(model).astype(np.float32))  # (nbody, nv)
    cmask = (
        jnp.asarray(
            ancestor_dof_mask(model)[np.asarray(model.contact_body)].astype(np.float32)
        )
        if has_contacts
        else jnp.zeros((0, nv))
    )
    slide_mask = jnp.asarray((np.asarray(model.joints.jtype) == SLIDE)[None, :, None])

    def all_jacobians(q):
        """Geometric Jacobians in closed form: for a hinge dof k with world
        axis a_k and pivot o_k, ``∂x/∂q_k = a_k × (x − o_k)`` for any
        downstream point x and ``∂ω/∂q̇_k = a_k``; for a slide,
        ``∂x/∂q_k = a_k``, no rotation. Shallow algebra over ONE plain FK
        traversal — no autodiff pass through the kinematic chain at all.

        Layout: Jv/Jw are (nbody, nv, 3); Jc is (nc, nv, 3).
        """
        R, p, aw, ow = fk_full(model, q)
        pc = p + jnp.sum(R * coms[:, None, :], axis=-1)
        if has_contacts:
            p_c = jnp.sum(contact_sel[:, :, None] * p[None, :, :], axis=1)
            R_c = jnp.sum(contact_sel[:, :, None, None] * R[None, :, :, :], axis=1)
            cpts = p_c + jnp.sum(R_c * contact_offs[:, None, :], axis=-1)
        else:
            cpts = jnp.zeros((0, 3))

        aw_b = aw[None, :, :]  # (1, nv, 3)
        Jv = (
            jnp.where(slide_mask, aw_b, jnp.cross(aw_b, pc[:, None, :] - ow[None, :, :]))
            * amask[:, :, None]
        )
        Jw = jnp.where(slide_mask, 0.0, aw_b) * amask[:, :, None]
        if has_contacts:
            Jc = (
                jnp.where(
                    slide_mask, aw_b, jnp.cross(aw_b, cpts[:, None, :] - ow[None, :, :])
                )
                * cmask[:, :, None]
            )
        else:
            Jc = jnp.zeros((0, nv, 3))

        RI = jnp.sum(R[:, :, :, None] * inertias[:, None, :, :], axis=2)
        I_world = jnp.sum(RI[:, :, None, :] * R[:, None, :, :], axis=-1)
        return pc, R, cpts, Jv, Jw, Jc, I_world

    # Static Cholesky factors of the body inertias: I_w = R I Rᵀ = (RL)(RL)ᵀ,
    # so the angular Gram term factors like the linear one and the whole mass
    # matrix becomes ONE MXU matmul M = XᵀX with X (6·nbody, nv). The naive
    # broadcast-sum form materializes an (nbody, nv, nv, 3) product —
    # ~2 GB/batch for humanoid — while the Gram form never leaves (6b, nv).
    _inertia_chol = np.linalg.cholesky(
        np.asarray(model.bodies.inertia) + 1e-12 * np.eye(3)
    )
    inertia_chol = jnp.asarray(_inertia_chol)
    sqrt_masses = jnp.asarray(np.sqrt(np.asarray(model.bodies.mass)))

    def _assemble_mass(Jv, Jw, R):
        # rows of X: per body, √m·Jvᵀ (3 rows) and (RL)ᵀJwᵀ (3 rows)
        A_lin = sqrt_masses[:, None, None] * jnp.swapaxes(Jv, -1, -2)  # (b,3,nv)
        RL = jnp.sum(R[:, :, :, None] * inertia_chol[:, None, :, :], axis=2)
        # G[b,i,k] = Σ_j RL[b,j,i] Jw[b,k,j]
        G = jnp.sum(RL[:, :, :, None] * jnp.swapaxes(Jw, -1, -2)[:, :, None, :], axis=1)
        X = jnp.concatenate((A_lin, G), axis=1).reshape(6 * nbody, nv)
        M = jax.lax.dot_general(
            X, X, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return M + jnp.diag(armature)

    def mass_matrix(q):
        _, R, _, Jv, Jw, _, _ = all_jacobians(q)
        return _assemble_mass(Jv, Jw, R)

    stiffness = jnp.asarray(model.joints.stiffness)
    joint_ref = jnp.asarray(model.joints.ref)

    # static strict-ancestor masks for the closed-form Jacobian rates. A
    # quaternion root's three angular "axes" are body-fixed vectors, so each
    # rotates with the FULL body angular velocity — complete the ball block
    # in the rotation mask (their own cross terms a_k × a_k q̇_k vanish).
    _strict_np = strict_dof_ancestors(model)
    _strict_rot_np = _strict_np.copy()
    if model.root_free:
        _strict_rot_np[3:6, 3:6] = True
    strict_anc = jnp.asarray(_strict_np.astype(np.float32))
    strict_rot = jnp.asarray(_strict_rot_np.astype(np.float32))
    hinge_dof = jnp.asarray((np.asarray(model.joints.jtype) == HINGE)[:, None].astype(np.float32))
    slide_dof = 1.0 - hinge_dof

    def _jacobians_with_rates(q, qd):
        """ONE primal FK pass; the Jacobian time-derivatives (convective
        accelerations a⁰ = (dJᵥ/dt)q̇, α⁰ = (dJ_ω/dt)q̇) assemble in CLOSED
        FORM from the same axes/pivots — no tangent traversal of the
        kinematic chain at all:

        - a world axis is a material vector of its pre-joint frame:
          ȧ_k = ω_pre(k) × a_k with ω_pre(k) = Σ_{j≺k, hinge} a_j q̇_j;
        - a pivot is a material point:
          ȯ_k = Σ_{j≺k} q̇_j (slide: a_j; hinge: a_j × (o_k − o_j))
              = S_k + W_k × o_k − C_k   (three (nv,nv)·(nv,3) mask
          contractions — parallel work instead of a sequential chain);
        - product rule: dJᵥ[b,k]/dt = ȧ_k × (pc_b − o_k)
          + a_k × (ṗc_b − ȯ_k), with ṗc_b = Jᵥ[b]·q̇.

        Verified against the Lagrangian oracle (non-free robots) and the
        energy/momentum/MuJoCo-parity suite (free roots) in tests/physics/.
        """
        # NOTE: fk_full_stacked (level-stacked composition) is bit-equal and
        # shortens the op chain ~4x, but its stack/slice-heavy graph blew
        # XLA:TPU compile time past 9 minutes for the rollout scan (vs ~10 s
        # warm here) — unusable until compile cost is addressed. Sequential
        # fk_full stays on the hot path.
        R, p, aw, ow = fk_full(model, q)
        pc = p + jnp.sum(R * coms[:, None, :], axis=-1)

        aw_b = aw[None, :, :]
        lever = pc[:, None, :] - ow[None, :, :]
        Jv = jnp.where(slide_mask, aw_b, jnp.cross(aw_b, lever)) * amask[:, :, None]
        Jw = jnp.where(slide_mask, 0.0, aw_b) * amask[:, :, None]

        # closed-form rates
        u = aw * qd[:, None] * hinge_dof  # (nv,3) hinge rotation rates
        s = aw * qd[:, None] * slide_dof  # (nv,3) slide velocities
        w_pre_rot = jnp.sum(strict_rot[:, :, None] * u[None, :, :], axis=1)
        daw = jnp.cross(w_pre_rot, aw)  # (nv,3)
        S = jnp.sum(strict_anc[:, :, None] * s[None, :, :], axis=1)
        W = jnp.sum(strict_anc[:, :, None] * u[None, :, :], axis=1)
        C = jnp.sum(strict_anc[:, :, None] * jnp.cross(u, ow)[None, :, :], axis=1)
        dow = S + jnp.cross(W, ow) - C  # (nv,3) pivot velocities
        dpc = jnp.sum(Jv * qd[None, :, None], axis=1)  # (nbody,3) com velocities

        daw_b = daw[None, :, :]
        dlever = dpc[:, None, :] - dow[None, :, :]
        dJv = (
            jnp.where(
                slide_mask,
                daw_b,
                jnp.cross(daw_b, lever) + jnp.cross(aw_b, dlever),
            )
            * amask[:, :, None]
        )
        a0 = jnp.sum(dJv * qd[None, :, None], axis=1)
        al0 = jnp.sum(
            jnp.where(slide_mask, 0.0, daw_b) * amask[:, :, None] * qd[None, :, None],
            axis=1,
        )

        if has_contacts:
            p_c = jnp.sum(contact_sel[:, :, None] * p[None, :, :], axis=1)
            R_c = jnp.sum(contact_sel[:, :, None, None] * R[None, :, :, :], axis=1)
            cpts = p_c + jnp.sum(R_c * contact_offs[:, None, :], axis=-1)
            Jc = (
                jnp.where(
                    slide_mask, aw_b, jnp.cross(aw_b, cpts[:, None, :] - ow[None, :, :])
                )
                * cmask[:, :, None]
            )
        else:
            cpts = jnp.zeros((0, 3))
            Jc = jnp.zeros((0, nv, 3))
        RI = jnp.sum(R[:, :, :, None] * inertias[:, None, :, :], axis=2)
        I_world = jnp.sum(RI[:, :, None, :] * R[:, None, :, :], axis=-1)
        return (pc, R, cpts, Jv, Jw, Jc, I_world), a0, al0

    def _bias_terms(q, qd, Jv, Jw, I_world, a0, al0):
        """Newton–Euler velocity bias + conservative forces.

        With q̈ = 0, body accelerations are a⁰ = (dJᵥ/dt)q̇, α⁰ = (dJ_ω/dt)q̇
        (one forward tangent through the shallow geometric-Jacobian code).
        Virtual work maps the body wrenches back through Jᵀ:
        c = Σ_b Jᵥᵀ m a⁰ + J_ωᵀ (I_w α⁰ + ω×I_w ω) + ∂V/∂q.
        Equal to the Lagrangian form (∂(Mq̇)/∂q)q̇ − ∂T/∂q + ∂V/∂q but ~5x
        fewer ops than forward-over-reverse through the kinetic energy.
        """
        w = jnp.sum(Jw * qd[None, :, None], axis=1)
        Iw_w = jnp.sum(I_world * w[:, None, :], axis=-1)
        t_ang = jnp.sum(I_world * al0[:, None, :], axis=-1) + jnp.cross(w, Iw_w)
        f_lin = masses[:, None] * a0
        c_kin = jnp.sum(Jv * f_lin[:, None, :], axis=(0, 2)) + jnp.sum(
            Jw * t_ang[:, None, :], axis=(0, 2)
        )
        # ∂V/∂q: gravity (V = −Σ m g pc_z) through Jv_z, plus joint springs
        dV = -g * jnp.sum(masses[:, None] * Jv[..., 2], axis=0)
        dV = dV + stiffness * (dof_positions(model, q) - joint_ref)
        return c_kin + dV

    def bias(q, qd):
        (_, _, _, Jv, Jw, _, I_world), a0, al0 = _jacobians_with_rates(q, qd)
        return _bias_terms(q, qd, Jv, Jw, I_world, a0, al0)

    def contact_points(q):
        _, _, cpts = kin_all(q)
        return cpts

    def _contact_point_forces(pts, Jc, qd):
        """World-frame contact force per contact sphere (nc, 3)."""
        radii = jnp.asarray(model.contact_radius)
        vels = jnp.sum(Jc * qd[None, :, None], axis=1)  # (nc, 3)

        # Stiffness scaled to the contacting body's mass keeps the explicit
        # spring stable across robots spanning 0.9 kg (Ant) to 42 kg
        # (Humanoid): k ≤ m (α/dt)² with α ≈ 1.
        # static per-contact body masses (host-computed constant)
        m_eff = jnp.asarray(
            np.maximum(np.asarray(model.bodies.mass)[np.asarray(model.contact_body)], 1e-3)
        )
        k_c = jnp.minimum(
            jnp.asarray(model.contact_stiffness, dtype=m_eff.dtype),
            m_eff * (model.contact_alpha / model.timestep) ** 2,
        )
        c_c = model.contact_damp_ratio * jnp.sqrt(k_c * m_eff)

        depth = radii - (pts[:, 2] - model.ground_z)
        in_contact = depth > 0.0
        fn = jnp.where(in_contact, k_c * depth - c_c * vels[:, 2], 0.0)
        fn = jnp.maximum(fn, 0.0)
        # tangential friction (viscous, clamped by the friction cone)
        ft_raw = -c_c[:, None] * vels[:, 0:2]
        ft_norm = jnp.sqrt(jnp.sum(ft_raw**2, axis=-1) + 1e-12)
        scale = jnp.minimum(1.0, model.friction * fn / ft_norm)
        ft = ft_raw * scale[:, None]
        return jnp.concatenate([ft, fn[:, None]], axis=-1)

    def _contact_forces(pts, Jc, qd):
        """Ground contact mapped to joint space via the contact Jacobian."""
        f = _contact_point_forces(pts, Jc, qd)
        return jnp.sum(Jc * f[:, None, :], axis=(0, 2))

    def contact_wrenches(q, qd):
        """Per-body external contact wrench (nbody, 6) as ``[torque, force]``
        about the body com — the engine's ``cfrc_ext`` (reference
        ``data.cfrc_ext`` layout: rotational first)."""
        if not has_contacts:
            return jnp.zeros((nbody, 6))
        pc, _, cpts, _, _, Jc, _ = all_jacobians(q)
        f = _contact_point_forces(cpts, Jc, qd)  # (nc, 3)
        lever = cpts - jnp.sum(contact_sel[:, :, None] * pc[None, :, :], axis=1)
        t = jnp.cross(lever, f)  # (nc, 3) torque about the body com
        F = jnp.sum(contact_sel[:, :, None] * f[:, None, :], axis=0)  # (nbody, 3)
        T = jnp.sum(contact_sel[:, :, None] * t[:, None, :], axis=0)
        return jnp.concatenate([T, F], axis=-1)

    # Limit stiffness scaled to each dof's peak actuator torque so a
    # max-torque push penetrates <= ~0.05 rad (MuJoCo treats limits as hard
    # constraints; a fixed weak spring let 150 N·m ant hips whip through
    # their range and catapult the body). Capped for explicit stability.
    _tau_max = np.zeros(nv)
    for _d, _g in zip(np.asarray(model.act_dof), np.abs(np.asarray(model.act_gear))):
        _tau_max[_d] = max(_tau_max[_d], _g)
    _m_dof = np.asarray(model.joints.armature) + 0.02
    _k_lim = np.clip(
        np.maximum(model.limit_stiffness, _tau_max / 0.05),
        None,
        0.25 * _m_dof / model.timestep**2,
    )
    limit_k = jnp.asarray(_k_lim)
    limit_c = jnp.asarray(1.4 * np.sqrt(_k_lim * _m_dof))

    def limit_torques(q, qd):
        qj = dof_positions(model, q)
        lim = jnp.asarray(model.joints.limited)
        lower = jnp.asarray(model.joints.lower)
        upper = jnp.asarray(model.joints.upper)
        below = jnp.minimum(qj - lower, 0.0)
        above = jnp.maximum(qj - upper, 0.0)
        violating = (below < 0.0) | (above > 0.0)
        tau = -limit_k * (below + above) - jnp.where(violating, limit_c * qd, 0.0)
        return jnp.where(lim, tau, 0.0)

    def actuation(ctrl):
        ctrl = jnp.clip(
            ctrl,
            jnp.asarray(model.act_ctrlrange[:, 0]),
            jnp.asarray(model.act_ctrlrange[:, 1]),
        )
        # static scatter as a dense (nv, nu) constant matmul (see contact_sel)
        return act_scatter @ (jnp.asarray(model.act_gear) * ctrl)

    damping = jnp.asarray(model.joints.damping)

    def step(q, qd, ctrl):
        # ONE jvp'd geometric-Jacobian pass serves M, the contact solve, AND
        # the Newton-Euler bias (primals + flow-tangents shared).
        (_, R, cpts, Jv, Jw, Jc, I_world), a0, al0 = _jacobians_with_rates(q, qd)
        M = _assemble_mass(Jv, Jw, R)
        tau = actuation(ctrl) + limit_torques(q, qd)
        if has_contacts:
            tau = tau + _contact_forces(cpts, Jc, qd)
        c = _bias_terms(q, qd, Jv, Jw, I_world, a0, al0)
        # Implicit joint damping: solve (M + dt·D) q̈ = τ − c − D·q̇ — keeps
        # heavily-damped low-inertia joints (Pusher wrist) unconditionally
        # stable where the explicit form explodes.
        D = jnp.diag(damping)
        rhs = tau - c - damping * qd
        qacc = _spd_solve(jnp, M + model.timestep * D + 1e-9 * jnp.eye(nv), rhs)
        qd_new = qd + model.timestep * qacc
        q_new = integrate_pos(model, q, qd_new, model.timestep)
        return q_new, qd_new

    return {
        "step": step,
        "fk": lambda q: fk(model, q),
        "contact_points": contact_points,
        "mass_matrix": mass_matrix,
        "bias": bias,
        "contact_wrenches": contact_wrenches,
        # per-dof constraint (joint-limit penalty) torques — the engine's
        # ``data.qfrc_constraint`` analogue (reference
        # inverted_double_pendulum_v5.py:200-210 reads it into the obs)
        "limit_torques": limit_torques,
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
