"""Fused Pallas rollout kernel tests.

These run only on a real TPU: the kernel uses `pltpu.prng_*`, which has no
CPU lowering, and TPU interpret mode is too slow for CI. The conftest pins
tests to the CPU backend, so the whole module is skipped there; run
`GYMTPU_TPU_TESTS=1 pytest tests/ops/` on a TPU host to execute it.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if jax.default_backend() in ("cpu", "gpu"):
    pytest.skip("pallas TPU kernel requires a TPU backend", allow_module_level=True)

import jax.numpy as jnp

from gymnasium_tpu.envs.dynamics import cartpole as cp
from gymnasium_tpu.ops import cartpole_rollout_fused


@pytest.fixture(scope="module")
def rollout():
    N, S = 128, 600
    state = jnp.zeros((4, N), jnp.float32)
    out = cartpole_rollout_fused(
        state, jnp.zeros((N,), jnp.int32), jnp.zeros((N,), bool), 42, S
    )
    return [np.asarray(x) for x in jax.block_until_ready(out)]


def test_shapes_and_dtypes(rollout):
    fstate, fsteps, fdone, obs, rew, term, trunc = rollout
    S, N = rew.shape
    assert obs.shape == (S, 4, N) and obs.dtype == np.float32
    assert fstate.shape == (4, N)
    assert term.dtype == bool and trunc.dtype == bool


def test_physics_matches_shared_dynamics(rollout):
    """Each non-reset transition must equal integrate() under one of the two
    actions — the kernel re-implements dynamics/cartpole.py and must agree."""
    _, _, _, obs, rew, term, trunc = rollout
    done = term | trunc
    p = cp.CartPoleParams()
    prev = obs[:-1]  # (S-1, 4, N)
    nxt = obs[1:]
    for s in range(0, 64):
        for e in range(0, obs.shape[2], 16):
            if done[s, e]:
                continue  # next step is a reset, no transition
            state = prev[s + 1 - 1, :, e] if s == 0 else None
            st = obs[s, :, e]
            target = nxt[s, :, e]
            cands = [
                cp.integrate(np, st[None, :], f, p, euler=True)[0]
                for f in (-p.force_mag, p.force_mag)
            ]
            assert any(
                np.allclose(c.astype(np.float32), target, atol=2e-5) for c in cands
            ), (s, e, st, target, cands)


def test_autoreset_next_step(rollout):
    _, _, _, obs, rew, term, trunc = rollout
    done = term | trunc
    S = done.shape[0]
    assert done.any(), "random-policy CartPole must terminate within 600 steps"
    for s in range(S - 1):
        idx = np.where(done[s])[0]
        if len(idx) == 0:
            continue
        assert np.all(rew[s + 1, idx] == 0.0)
        assert np.all(np.abs(obs[s + 1, :, idx]) <= 0.05 + 1e-6)
        assert not np.any(done[s + 1, idx])


def test_termination_thresholds(rollout):
    _, _, _, obs, rew, term, trunc = rollout
    p = cp.CartPoleParams()
    exceeded = (np.abs(obs[:, 0, :]) > p.x_threshold) | (
        np.abs(obs[:, 2, :]) > p.theta_threshold
    )
    # every terminated flag coincides with a threshold crossing
    assert np.all(exceeded[term])


def test_reward_is_one_until_reset(rollout):
    _, _, _, obs, rew, term, trunc = rollout
    done = term | trunc
    reset_mask = np.zeros_like(done)
    reset_mask[1:] = done[:-1]
    assert np.all(rew[reset_mask] == 0.0)
    assert np.all(rew[~reset_mask] == 1.0)


def test_deterministic_given_seed():
    N, S = 64, 100
    args = (jnp.zeros((4, N), jnp.float32), jnp.zeros((N,), jnp.int32), jnp.zeros((N,), bool))
    a = jax.block_until_ready(cartpole_rollout_fused(*args, 7, S))
    b = jax.block_until_ready(cartpole_rollout_fused(*args, 7, S))
    c = jax.block_until_ready(cartpole_rollout_fused(*args, 8, S))
    assert np.array_equal(np.asarray(a[3]), np.asarray(b[3]))
    assert not np.array_equal(np.asarray(a[3]), np.asarray(c[3]))


def test_bf16_obs_variant():
    N, S = 64, 50
    out = cartpole_rollout_fused(
        jnp.zeros((4, N), jnp.float32),
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,), bool),
        3,
        S,
        obs_dtype=jnp.bfloat16,
    )
    obs = jax.block_until_ready(out[3])
    assert obs.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(obs.astype(jnp.float32)).all())
