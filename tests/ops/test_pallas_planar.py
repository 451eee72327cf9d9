"""Fused Pallas planar (Box2D-class) step vs the XLA engine.

On CPU the ROW PROGRAM (the exact computation the kernel runs) executes as
a plain jitted function via ``rows_step`` — same scheme as
test_pallas_articulated. Set GYMTPU_TPU_TESTS=1 to run the compiled kernel
on real hardware instead.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import gymnasium_tpu.envs.dynamics.lunar_lander as L
from gymnasium_tpu.ops.pallas_planar import BLOCK_ENVS, make_fused_planar_step
from gymnasium_tpu.physics.planar import world_step

ON_TPU = os.environ.get("GYMTPU_TPU_TESTS") == "1"


def _random_lander_states(n, seed=0):
    rng = np.random.default_rng(seed)
    terrain_u = rng.uniform(0, 1, (n, L.CHUNKS + 1))
    terrain = np.asarray(L.generate_terrain(np, terrain_u), np.float32)
    bodies = np.zeros((n, 3, 6), np.float32)
    bodies[:, 0, 0] = L.W / 2 + rng.uniform(-1, 1, n)
    bodies[:, 0, 1] = rng.uniform(3.4, 6.0, n)
    bodies[:, 0, 2] = rng.uniform(-0.4, 0.4, n)
    bodies[:, 0, 3:6] = rng.uniform(-1, 1, (n, 3))
    for i, sgn in enumerate((-1.0, 1.0)):
        bodies[:, 1 + i, 0] = bodies[:, 0, 0] - sgn * L.LEG_AWAY / L.SCALE
        bodies[:, 1 + i, 1] = bodies[:, 0, 1] - 0.3
        bodies[:, 1 + i, 2] = bodies[:, 0, 2] + sgn * 0.05
        bodies[:, 1 + i, 3:6] = rng.uniform(-1, 1, (n, 3))
    ext = np.zeros((n, 3, 3), np.float32)
    ext[:, 0, :] = rng.uniform(-5, 5, (n, 3))
    jimp = rng.uniform(-0.05, 0.05, (n, 2, 5)).astype(np.float32)
    cimp = np.abs(rng.uniform(0, 0.05, (n, 10, 2))).astype(np.float32)
    return bodies, ext, terrain, jimp, cimp


def _run_fused(world, bodies, ext, terrain, jimp, cimp):
    fused = make_fused_planar_step(
        world,
        L.CHUNKS,
        L.W / (L.CHUNKS - 1),
        L._MOTOR_SPEED,
        L._MOTOR_TORQUE,
        substeps=L._SUBSTEPS,
    )
    if ON_TPU:
        return fused(bodies, ext, terrain, jimp, cimp)
    # CPU: run the identical row program without pallas_call
    n = bodies.shape[0]
    nblk = n // BLOCK_ENVS

    def to_rows(x, rows):
        x = jnp.asarray(x, jnp.float32).reshape(n, rows)
        return [
            x.reshape(nblk, 8, 128, rows).transpose(0, 3, 1, 2)[0, i]
            for i in range(rows)
        ]

    assert nblk == 1, "CPU row-program test runs one block"
    body_r, jimp_r, cimp_r, flags = fused.rows_step(
        to_rows(bodies, 18), to_rows(ext, 9), to_rows(terrain, L.CHUNKS),
        to_rows(jimp, 10), to_rows(cimp, 20)
    )

    def from_rows(rows_list):
        flat = jnp.stack([r for grp in rows_list for r in grp])  # (rows, 8, 128)
        rows = flat.shape[0]
        return flat.reshape(rows, 8, 128).transpose(1, 2, 0).reshape(n, rows)

    bodies_o = from_rows(body_r).reshape(n, 3, 6)
    jimp_o = from_rows(jimp_r).reshape(n, 2, 5)
    cimp_o = from_rows(cimp_r).reshape(n, 10, 2)
    flags_o = from_rows([[f.astype(jnp.float32)] for f in flags]).reshape(n, 10) > 0.5
    return bodies_o, jimp_o, cimp_o, flags_o


def test_fused_planar_matches_world_step():
    """The fused program reproduces ``world_step`` chained over both
    substeps (warm starts and external forces included) to f32 round-off
    over 1024 random lander states."""
    world = L._lander_world(-10.0)
    bodies, ext, terrain, jimp, cimp = _random_lander_states(BLOCK_ENVS)

    gh = lambda px: L.ground_height(jnp, jnp.asarray(terrain), px)  # noqa: E731
    b = jnp.asarray(bodies)
    warm = (jnp.asarray(jimp), jnp.asarray(cimp))
    flags = None
    for _ in range(L._SUBSTEPS):
        b, flags, warm = world_step(
            jnp,
            b,
            world,
            jnp.asarray(L._MOTOR_SPEED),
            jnp.asarray(L._MOTOR_TORQUE),
            gh,
            external_force=jnp.asarray(ext),
            warm_start=warm,
        )

    bo, jo, co, fo = _run_fused(world, bodies, ext, terrain, jimp, cimp)
    assert float(jnp.max(jnp.abs(bo - b))) < 2e-4
    assert float(jnp.max(jnp.abs(jo - warm[0]))) < 1e-4
    assert float(jnp.max(jnp.abs(co - warm[1]))) < 1e-4
    assert bool(jnp.all(fo == flags))


def test_batched_transition_matches_vmapped():
    """LunarLanderFunctional.transition_batched (interpret) equals the
    vmapped per-env transition under engine-off actions (dispersion draws
    then cancel, isolating the physics path)."""
    from gymnasium_tpu.envs.box2d.lunar_lander import LunarLanderFunctional

    env = LunarLanderFunctional()
    env.fused_kernel_mode = "auto" if ON_TPU else "interpret"
    n = BLOCK_ENVS
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    state = jax.vmap(env.initial, in_axes=(0, None))(keys, None)
    bf = env.transition_batched(n)
    assert bf is not None
    a0 = jnp.zeros((n,), jnp.int32)
    s1 = bf(state, a0, jax.random.PRNGKey(3), None)
    s2 = jax.vmap(env.transition, in_axes=(0, 0, 0, None))(
        state, a0, jax.random.split(jax.random.PRNGKey(3), n), None
    )
    for k in s1:
        d = float(
            jnp.max(
                jnp.abs(
                    jnp.asarray(s1[k], jnp.float32) - jnp.asarray(s2[k], jnp.float32)
                )
            )
        )
        assert d < 1e-4, f"{k}: {d}"
