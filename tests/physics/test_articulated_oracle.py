"""Geometric-form dynamics vs the Lagrangian-autodiff oracle.

The hot path (geometric Jacobians → M, Newton–Euler bias, unrolled Cholesky)
must be mathematically identical to the autodiff formulation it replaced
(hessian of kinetic energy / jvp-of-grad momentum). f32 here; the f64 check
(≤1e-12 relative) was run at development time — see physics/articulated.py
docstring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymnasium_tpu.envs.mujoco.mujoco_env import load_model
from gymnasium_tpu.physics.articulated import _spd_solve, make_dynamics

# Autodiff oracles (hessian of KE) on the big trees take minutes in f32 on
# CPU; those robots run only with `-m ""` / `-m slow` (pyproject deselects
# `slow` by default). The small trees keep the oracle honest in default CI.
ROBOTS = [
    "hopper",
    "swimmer",
    "reacher",
    pytest.param("half_cheetah", marks=pytest.mark.slow),
    pytest.param("ant", marks=pytest.mark.slow),
    pytest.param("humanoid", marks=pytest.mark.slow),
    pytest.param("pusher", marks=pytest.mark.slow),
]


@pytest.fixture(scope="module", params=ROBOTS)
def robot(request):
    model, _ = load_model(request.param)
    return request.param, model, make_dynamics(model)


def _rand_state(model, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-0.4, 0.4, model.nq)
    if model.root_free:
        # a genuinely large random orientation — quaternion roots must be
        # correct far from upright (the Euler root's failure mode)
        quat = rng.normal(size=4)
        q[3:7] = quat / np.linalg.norm(quat)
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, model.nv), jnp.float32)
    return jnp.asarray(q, jnp.float32), qd


def test_mass_matrix_matches_hessian_oracle(robot):
    name, model, dyn = robot
    q, _ = _rand_state(model)
    M_geo = dyn["mass_matrix"](q)
    M_ora = jax.hessian(dyn["kinetic_energy"], argnums=1)(q, jnp.zeros(model.nv))
    rel = float(jnp.max(jnp.abs(M_geo - M_ora)) / jnp.max(jnp.abs(M_ora)))
    assert rel < 5e-4, f"{name}: mass matrix rel dev {rel}"


def test_mass_matrix_symmetric_positive_definite(robot):
    name, model, dyn = robot
    q, _ = _rand_state(model, seed=4)
    M = dyn["mass_matrix"](q)
    assert float(jnp.max(jnp.abs(M - M.T))) < 1e-4
    eigs = np.linalg.eigvalsh(np.asarray(M, np.float64))
    assert eigs.min() > 0, f"{name}: M not positive definite ({eigs.min()})"


def test_bias_matches_lagrangian_oracle(robot):
    name, model, dyn = robot
    if model.root_free:
        pytest.skip(
            "Lagrangian momentum oracle needs coordinate velocities; "
            "free (quaternion) roots use quasi-velocities — covered by "
            "test_free_root.py (energy/momentum conservation + MuJoCo parity)"
        )
    q, qd = _rand_state(model, seed=1)
    ke, pot = dyn["kinetic_energy"], dyn["potential"]

    def momentum(q_):
        return jax.grad(ke, argnums=1)(q_, qd)

    _, mdot_qd = jax.jvp(momentum, (q,), (qd,))
    oracle = mdot_qd - jax.grad(ke, argnums=0)(q, qd) + jax.grad(pot)(q)
    got = dyn["bias"](q, qd)
    scale = float(jnp.max(jnp.abs(oracle))) + 1e-6
    rel = float(jnp.max(jnp.abs(got - oracle))) / scale
    assert rel < 5e-3, f"{name}: bias rel dev {rel}"


def test_bias_zero_velocity_equals_gravity_gradient(robot):
    name, model, dyn = robot
    if model.root_free:
        pytest.skip("∂V/∂q is an nq-gradient for quaternion roots; see test_free_root.py")
    q, _ = _rand_state(model, seed=2)
    got = dyn["bias"](q, jnp.zeros(model.nv))
    oracle = jax.grad(dyn["potential"])(q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), atol=2e-4)


def test_spd_solve_matches_numpy():
    rng = np.random.default_rng(3)
    for n in (3, 9, 23):
        B = rng.normal(size=(n, n))
        A = B @ B.T + n * np.eye(n)
        b = rng.normal(size=n)
        x = np.asarray(_spd_solve(jnp, jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=2e-3, atol=2e-4)


def test_energy_conservation_free_fall(robot):
    """Without contacts/damping/actuation, total energy drifts only at the
    integrator's order. Uses a contact-free elevated state."""
    name, model, dyn = robot
    if name in ("pusher", "reacher", "swimmer"):
        pytest.skip("zero gravity or joint damping dominates")
    q, qd = _rand_state(model, seed=5)
    # lift the root high so nothing touches the ground plane
    if model.bodies.dof_count[0] >= 3:
        q = q.at[2].set(5.0)
    model_free = model._replace(
        joints=model.joints._replace(
            damping=np.zeros(model.nv),
            # one-sided limit springs are conservative but not part of
            # `potential`; exclude them from the energy audit
            limited=np.zeros(model.nv, dtype=bool),
        ),
        contact_body=np.zeros((0,), np.int32),
        contact_pos=np.zeros((0, 3)),
        contact_radius=np.zeros((0,)),
    )
    dyn_free = make_dynamics(model_free)
    e0 = float(dyn_free["kinetic_energy"](q, qd) + dyn_free["potential"](q))
    ctrl = jnp.zeros(model.nu)
    step = jax.jit(dyn_free["step"])
    for _ in range(100):
        q, qd = step(q, qd, ctrl)
    ke1 = float(dyn_free["kinetic_energy"](q, qd))
    e1 = ke1 + float(dyn_free["potential"](q))
    # normalize by the energy actually exchanged (KE gained in the fall);
    # total energy near zero makes |e0| a meaningless scale
    scale = max(ke1, 1.0)
    assert abs(e1 - e0) / scale < 0.05, (
        f"{name}: energy drift {e0} -> {e1} vs exchanged {ke1}"
    )


def test_level_batched_fk_matches_sequential(robot):
    """fk_full_batched (level-parallel composition) must reproduce fk_full
    exactly — kept as verified infrastructure for deeper kinematic trees."""
    from gymnasium_tpu.physics.articulated import fk_full, fk_full_batched

    name, model, _ = robot
    if model.root_free:
        pytest.skip("level-batched FK does not support free roots (unused path)")
    q, _ = _rand_state(model, seed=7)
    for a, b in zip(fk_full(model, q), fk_full_batched(model, q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_level_stacked_fk_matches_sequential(robot):
    """fk_full_stacked (level-STACKED composition, free roots included) must
    reproduce fk_full exactly — verified infrastructure; kept off the hot
    path because its graph blows XLA:TPU compile time (see
    _jacobians_with_rates note)."""
    from gymnasium_tpu.physics.articulated import fk_full, fk_full_stacked

    name, model, _ = robot
    q, _ = _rand_state(model, seed=9)
    for a, b in zip(fk_full(model, q), fk_full_stacked(model, q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
