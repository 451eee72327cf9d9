"""Fused multi-step CartPole rollout as a single Pallas TPU kernel.

Why a kernel at all: the XLA path (`jit(lax.scan(autoreset_step))`) is
HBM-bandwidth-bound on the trajectory writes (each env-step emits
16 B obs + 4 B reward + 2 B flags). XLA reaches ~65-90% of that roofline;
the remaining loss is per-iteration threefry key math and loop-carried
state traffic. This kernel keeps the whole env batch state in VMEM for all
``num_steps`` iterations (grid = steps, scratch persists across grid
iterations on TPU), draws actions and reset noise from the on-core PRNG,
and lets the Pallas pipeline double-buffer the per-step trajectory block
writes back to HBM.

Layout is struct-of-arrays: state is ``(4, N)`` — env axis on lanes — the
same orientation the reference's own batched CartPole uses
(reference classic_control/cartpole.py:355-605 keeps ``(4, num_envs)``).
AoS ``(N, 4)`` would waste 31/32 lanes of every VPU op.

Semantics match :func:`gymnasium_tpu.functional.make_autoreset_step`
(NEXT_STEP autoreset: the step after a done returns the reset observation,
reward 0, flags False) with the dynamics of
:mod:`gymnasium_tpu.envs.dynamics.cartpole` (reference
classic_control/cartpole.py:163-195). Only the RNG stream differs
(on-core PRNG vs threefry), so trajectories are distribution- but not
bit-identical to the scan path; tests verify the physics transition
exactly by reconstructing the action from the state delta.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from gymnasium_tpu.envs.dynamics.cartpole import CartPoleParams

__all__ = ["cartpole_rollout_fused"]


def _rollout_kernel(
    seed_ref,  # SMEM (1,) int32
    state_ref,  # VMEM (4, N) f32   initial state
    steps_ref,  # VMEM (1, N) i32   per-env step counters
    done_ref,  # VMEM (1, N) i32   prev_done mask (0/1)
    fstate_ref,  # VMEM (4, N) f32   final state
    fsteps_ref,  # VMEM (1, N) i32
    fdone_ref,  # VMEM (1, N) i32
    obs_ref,  # VMEM block (1, 4, N) of (S, 4, N) f32
    rew_ref,  # VMEM block (1, N) of (S, N) f32
    term_ref,  # VMEM block (1, N) of (S, N) bool
    trunc_ref,  # VMEM block (1, N) of (S, N) bool
    state_s,  # VMEM scratch (4, N) f32 — persists across grid iterations
    steps_s,  # VMEM scratch (1, N) i32
    done_s,  # VMEM scratch (1, N) i32
    *,
    params: CartPoleParams,
    time_limit: int,
    obs_dtype: Any = jnp.float32,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        state_s[:] = state_ref[:]
        steps_s[:] = steps_ref[:]
        done_s[:] = done_ref[:]

    # Deterministic per-step stream; reseeding each iteration keeps the
    # kernel correct under any pipelining/revisit order. The seed is mixed
    # with a Weyl constant so that consecutive base seeds (e.g. block b and
    # b+1 from bench.py) do not produce overlapping per-step streams.
    pltpu.prng_seed(seed_ref[0] * jnp.int32(-1640531527) + i)  # 0x9E3779B9 mod 2^32

    state = state_s[:]  # (4, N)
    x, x_dot = state[0:1, :], state[1:2, :]
    theta, theta_dot = state[2:3, :], state[3:4, :]
    n = x.shape[-1]

    # --- uniform random policy: one bit per env ---------------------------
    abits = pltpu.prng_random_bits((1, n))
    force = jnp.where((abits & 1) == 1, params.force_mag, -params.force_mag).astype(
        jnp.float32
    )

    # --- Florian cart-pole ODE, explicit Euler (dynamics/cartpole.py) -----
    total_mass = params.masspole + params.masscart
    polemass_length = params.masspole * params.length
    costheta = jnp.cos(theta)
    sintheta = jnp.sin(theta)
    temp = (force + polemass_length * jnp.square(theta_dot) * sintheta) / total_mass
    thetaacc = (params.gravity * sintheta - costheta * temp) / (
        params.length * (4.0 / 3.0 - params.masspole * jnp.square(costheta) / total_mass)
    )
    xacc = temp - polemass_length * thetaacc * costheta / total_mass
    nx = x + params.tau * x_dot
    nx_dot = x_dot + params.tau * xacc
    ntheta = theta + params.tau * theta_dot
    ntheta_dot = theta_dot + params.tau * thetaacc
    next_state = jnp.concatenate((nx, nx_dot, ntheta, ntheta_dot), axis=0)  # (4, N)

    # --- NEXT_STEP autoreset: reset lanes ignore the transition -----------
    # top 24 bits -> [0, 1): logical shift as uint32, then reinterpret as
    # int32 (< 2^24, so non-negative) because Mosaic lacks uint32->f32 casts
    rbits = pltpu.bitcast(pltpu.prng_random_bits((4, n)), jnp.uint32) >> 8
    u01 = pltpu.bitcast(rbits, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    reset_state = (u01 * 2.0 - 1.0) * params.reset_bound

    dmask = done_s[:] != 0  # (1, N) bool
    new_state = jnp.where(dmask, reset_state, next_state)
    steps = jnp.where(dmask, 0, steps_s[:] + 1)

    terminated = (
        (jnp.abs(new_state[0:1, :]) > params.x_threshold)
        | (jnp.abs(new_state[2:3, :]) > params.theta_threshold)
    ) & ~dmask
    truncated = ~terminated & (steps >= time_limit) & ~dmask
    reward = jnp.where(dmask, 0.0, 1.0).astype(jnp.float32)

    state_s[:] = new_state
    steps_s[:] = steps
    done_s[:] = (terminated | truncated).astype(jnp.int32)

    obs_ref[0] = new_state.astype(obs_dtype)
    rew_ref[0] = reward
    term_ref[0] = terminated
    trunc_ref[0] = truncated

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        fstate_ref[:] = state_s[:]
        fsteps_ref[:] = steps_s[:]
        fdone_ref[:] = done_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "time_limit", "params", "interpret", "obs_dtype"),
)
def cartpole_rollout_fused(
    state: Any,
    steps: Any,
    prev_done: Any,
    seed: Any,
    num_steps: int,
    time_limit: int = 500,
    params: CartPoleParams | None = None,
    interpret: bool = False,
    obs_dtype: Any = jnp.float32,
):
    """Run ``num_steps`` autoresetting CartPole steps under a uniform random
    policy as ONE fused Pallas program.

    Args:
        state: ``(4, N)`` float32 — struct-of-arrays env states.
        steps: ``(N,)`` or ``(1, N)`` int32 step counters.
        prev_done: ``(N,)`` or ``(1, N)`` bool/int32 done mask.
        seed: int32 scalar; per-step streams derive from ``seed + step``.
        num_steps: trajectory length ``S``.
        time_limit: truncation horizon (CartPole-v1: 500).
        params: dynamics constants (static; baked into the kernel).
        interpret: run in the Pallas interpreter (for CPU-only tests).

    Returns:
        ``(final_state, final_steps, final_done, obs, reward, terminated,
        truncated)`` with ``obs`` of shape ``(S, 4, N)`` (struct-of-arrays —
        the TPU-native layout) and the rest ``(S, N)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if params is None:
        params = CartPoleParams()
    n = state.shape[-1]
    s = int(num_steps)

    steps2 = jnp.reshape(steps.astype(jnp.int32), (1, n))
    done2 = jnp.reshape(prev_done.astype(jnp.int32), (1, n))
    seed_arr = jnp.reshape(jnp.asarray(seed, dtype=jnp.int32), (1,))

    kernel = functools.partial(
        _rollout_kernel, params=params, time_limit=time_limit, obs_dtype=obs_dtype
    )

    out_shape = (
        jax.ShapeDtypeStruct((4, n), jnp.float32),  # final state
        jax.ShapeDtypeStruct((1, n), jnp.int32),  # final steps
        jax.ShapeDtypeStruct((1, n), jnp.int32),  # final done
        jax.ShapeDtypeStruct((s, 4, n), obs_dtype),  # obs traj
        # (S, 1, N): TPU blocks must tile the last two dims, so the per-step
        # scalars carry a singleton row that is reshaped away on return
        jax.ShapeDtypeStruct((s, 1, n), jnp.float32),  # reward traj
        jax.ShapeDtypeStruct((s, 1, n), jnp.bool_),  # terminated traj
        jax.ShapeDtypeStruct((s, 1, n), jnp.bool_),  # truncated traj
    )

    full = lambda *_: (0, 0)  # noqa: E731 — same (4,N)/(1,N) block every step
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((4, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.int32),
            pltpu.VMEM((1, n), jnp.int32),
        ],
    )

    fstate, fsteps, fdone, obs, reward, term, trunc = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(seed_arr, state.astype(jnp.float32), steps2, done2)

    return (
        fstate,
        fsteps[0],
        fdone[0].astype(bool),
        obs,
        reward.reshape(s, n),
        term.reshape(s, n),
        trunc.reshape(s, n),
    )
