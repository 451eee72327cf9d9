"""Quaternion floating-base correctness — the Euler root's failure modes.

The free root stores a unit quaternion (articulated.py: ``root_free``) and a
body-frame angular velocity, integrated as ``quat ⊗ exp(dt·ω/2)``. These
tests drive it through exactly the regimes where an Euler parametrization
breaks: large rotations, tumbling, upside-down states — including a direct
orientation-trajectory comparison against the real MuJoCo engine on the
reference ant.xml (reference envs/mujoco/assets/ant.xml free root joint).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymnasium_tpu.envs.mujoco.mujoco_env import load_model
from gymnasium_tpu.physics.articulated import init_qpos, integrate_pos, make_dynamics

REFERENCE_ASSETS = "/root/reference/gymnasium/envs/mujoco/assets"


@pytest.fixture(scope="module")
def ant():
    model, meta = load_model("ant")
    assert model.root_free
    return model, make_dynamics(model)


def _contact_free(model):
    """Strip ground contacts so orientation dynamics are smooth."""
    return model._replace(
        contact_body=np.zeros((0,), np.int32),
        contact_pos=np.zeros((0, 3)),
        contact_radius=np.zeros((0,)),
    )


def test_quat_stays_normalized_while_tumbling(ant):
    model, _ = ant
    dyn = make_dynamics(_contact_free(model))
    q = jnp.asarray(init_qpos(model)).at[2].set(10.0)
    qd = jnp.zeros(model.nv).at[3:6].set(jnp.asarray([4.0, -3.0, 2.0]))
    step = jax.jit(dyn["step"])
    ctrl = jnp.zeros(model.nu)
    for _ in range(300):
        q, qd = step(q, qd, ctrl)
    assert np.isfinite(np.asarray(q)).all()
    np.testing.assert_allclose(float(jnp.linalg.norm(q[3:7])), 1.0, atol=1e-5)


def test_angular_momentum_conserved_zero_gravity(ant):
    """No gravity, no damping, no limits, no contacts: the world angular
    momentum about the system COM is a constant of motion. This is exactly
    the quantity an Euler-singularity (or a wrong ω frame convention)
    corrupts while tumbling."""
    model, _ = ant
    model = _contact_free(model)._replace(
        gravity=0.0,
        joints=model.joints._replace(
            damping=np.zeros(model.nv), limited=np.zeros(model.nv, dtype=bool)
        ),
    )
    dyn = make_dynamics(model)

    masses = np.asarray(model.bodies.mass)
    inertias = np.asarray(model.bodies.inertia)
    coms = np.asarray(model.bodies.com)

    def momentum(q, qd):
        """L about the system COM from body poses + velocities (autodiff)."""

        def pose(t):
            q_t = integrate_pos(model, q, qd, t)
            R, p = dyn["fk"](q_t)
            pc = p + jnp.einsum("bij,bj->bi", R, jnp.asarray(coms))
            return pc, R

        (pc, R), (pc_dot, R_dot) = jax.jvp(pose, (0.0,), (1.0,))
        W = jnp.einsum("bik,bjk->bij", R_dot, R)
        omega = jnp.stack([W[:, 2, 1], W[:, 0, 2], W[:, 1, 0]], axis=-1)
        I_w = jnp.einsum("bik,bkl,bjl->bij", R, jnp.asarray(inertias), R)
        com_sys = jnp.sum(jnp.asarray(masses)[:, None] * pc, axis=0) / masses.sum()
        L_spin = jnp.einsum("bij,bj->bi", I_w, omega).sum(axis=0)
        L_orb = jnp.sum(
            jnp.asarray(masses)[:, None] * jnp.cross(pc - com_sys, pc_dot), axis=0
        )
        return L_spin + L_orb

    q = jnp.asarray(init_qpos(model)).at[2].set(10.0)
    rng = np.random.default_rng(0)
    qd = jnp.asarray(rng.uniform(-1, 1, model.nv)).at[3:6].set(
        jnp.asarray([3.0, 2.0, -4.0])
    )
    L0 = np.asarray(momentum(q, qd))
    step = jax.jit(dyn["step"])
    ctrl = jnp.zeros(model.nu)
    for _ in range(200):
        q, qd = step(q, qd, ctrl)
    L1 = np.asarray(momentum(q, qd))
    drift = np.linalg.norm(L1 - L0) / (np.linalg.norm(L0) + 1e-9)
    # bound is the semi-implicit Euler integrator's own first-order drift
    # (halving dt halves it), not a property of the root parametrization
    assert drift < 0.05, f"angular momentum drift {drift}: L {L0} -> {L1}"


def test_tumbling_orientation_matches_mujoco(ant):
    """Mid-air tumbling Ant: from an identical state with a large body-frame
    angular velocity, the root quaternion must track the real MuJoCo engine.
    An Euler root diverges or hits the gimbal singularity on this
    trajectory."""
    mujoco = pytest.importorskip("mujoco")

    model, dyn = ant
    mj_model = mujoco.MjModel.from_xml_path(f"{REFERENCE_ASSETS}/ant.xml")
    assert abs(mj_model.opt.timestep - model.timestep) < 1e-9
    # apples-to-apples: ant.xml defaults to RK4; run MuJoCo with the same
    # semi-implicit Euler scheme we use, and strip the (differently-modeled)
    # joint limits and damping on BOTH engines so the comparison isolates
    # the free-root + joint kinematics. With matched integrators the
    # deviation is ~7e-4 rad after a full second of tumbling.
    mj_model.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    mj_model.jnt_limited[:] = 0
    mj_model.dof_damping[:] = 0.0
    mj_data = mujoco.MjData(mj_model)
    model = _contact_free(model)._replace(
        joints=model.joints._replace(
            damping=np.zeros(model.nv), limited=np.zeros(model.nv, dtype=bool)
        )
    )

    # identical initial state: high above ground, tumbling fast
    qpos = init_qpos(model).copy()
    qpos[2] = 50.0
    qvel = np.zeros(model.nv)
    qvel[3:6] = [3.0, -2.0, 1.5]

    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel
    mujoco.mj_forward(mj_model, mj_data)

    q = jnp.asarray(qpos)
    qd = jnp.asarray(qvel)
    step = jax.jit(make_dynamics(model)["step"])
    ctrl = jnp.zeros(model.nu)

    worst_angle = 0.0
    for i in range(100):  # 1 full second of tumbling at |ω| ≈ 4 rad/s
        mujoco.mj_step(mj_model, mj_data)
        q, qd = step(q, qd, ctrl)
        dot = abs(float(np.dot(np.asarray(q[3:7]), mj_data.qpos[3:7])))
        angle = 2 * np.arccos(min(dot, 1.0))
        worst_angle = max(worst_angle, angle)
    assert worst_angle < 0.01, (
        f"orientation deviates {worst_angle:.4f} rad from MuJoCo while tumbling"
    )
    # translation (free fall + initial height) must agree too
    np.testing.assert_allclose(np.asarray(q[:3]), mj_data.qpos[:3], atol=0.02)
    # and the body-frame angular velocity convention matches exactly
    np.testing.assert_allclose(np.asarray(qd[3:6]), mj_data.qvel[3:6], atol=1e-3)


def test_upside_down_ant_is_stable(ant):
    """A flipped Ant (180° roll) must simulate without blowup and settle
    resting on its back — exactly the state the Euler root handled worst
    (the singularity sits at ±90° pitch en route). Note MuJoCo's flipped
    ant also rests INSIDE the healthy-z band (the well-known flipped-ant
    non-termination), so stability — not termination — is the contract."""
    import gymnasium_tpu as gym

    env = gym.make("Ant-v5", disable_env_checker=True).unwrapped
    env.reset(seed=0)
    qpos = init_qpos(env.model).copy()
    qpos[2] = 0.4
    qpos[3:7] = [0.0, 1.0, 0.0, 0.0]  # 180° about x: on its back
    env.set_state(qpos, np.zeros(env.model.nv))
    for _ in range(60):
        obs, r, te, tr, info = env.step(np.zeros(env.action_space.shape, np.float32))
        assert np.isfinite(obs).all()
        if te:
            break
    # settled low, still inverted, nothing exploded
    assert 0.05 < env.torso_z < 0.6, f"flipped ant at improbable height {env.torso_z}"
    w = abs(float(env.qpos[3]))
    assert w < 0.5, f"ant should still be (mostly) inverted, got qw={w}"
    env.close()


def test_humanoid_free_root_runs(ant):
    """Humanoid (the other quaternion-root robot) steps stably from rest."""
    model, meta = load_model("humanoid")
    assert model.root_free
    dyn = make_dynamics(model)
    q = jnp.asarray(init_qpos(model))
    qd = jnp.zeros(model.nv)
    step = jax.jit(dyn["step"])
    ctrl = jnp.zeros(model.nu)
    for _ in range(100):
        q, qd = step(q, qd, ctrl)
    assert np.isfinite(np.asarray(q)).all()
    np.testing.assert_allclose(float(jnp.linalg.norm(q[3:7])), 1.0, atol=1e-5)
