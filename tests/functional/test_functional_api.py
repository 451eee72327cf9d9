"""Functional-core tests: jit/vmap equivalence and autoreset semantics.

Pattern: reference tests/functional/test_functional.py (same env, multiple
execution modes, identical trajectories) + this framework's folded-autoreset
invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
from gymnasium_tpu.envs.phys2d.pendulum import PendulumFunctional
from gymnasium_tpu.functional import (
    make_autoreset_step,
    make_initial_carry,
    vectorize_func_env,
)

FUNC_ENVS = [CartPoleFunctional, PendulumFunctional]


@pytest.mark.parametrize("env_cls", FUNC_ENVS)
def test_jit_equivalence(env_cls):
    """jitted hooks produce the same trajectory as raw hooks."""
    env = env_cls()
    key = jax.random.PRNGKey(0)
    state_raw = env.initial(key)
    state_jit = jax.jit(env.initial)(key)
    np.testing.assert_allclose(np.asarray(state_raw), np.asarray(state_jit), rtol=1e-6)

    action = env.action_space.sample_jax(jax.random.PRNGKey(1))
    for _ in range(20):
        next_raw = env.transition(state_raw, action, key)
        next_jit = jax.jit(env.transition)(state_jit, action, key)
        np.testing.assert_allclose(np.asarray(next_raw), np.asarray(next_jit), rtol=1e-5)
        state_raw, state_jit = next_raw, next_jit


@pytest.mark.parametrize("env_cls", FUNC_ENVS)
def test_vmap_equivalence(env_cls):
    """vmapped batch rows match independent per-env calls."""
    env = env_cls()
    n = 8
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    states = jax.vmap(env.initial)(keys)
    individual = [env.initial(keys[i]) for i in range(n)]
    for i in range(n):
        np.testing.assert_allclose(np.asarray(states[i]), np.asarray(individual[i]), rtol=1e-6)

    actions = env.action_space.sample_jax(jax.random.PRNGKey(2), (n,))
    batched_next = jax.vmap(env.transition, in_axes=(0, 0, None))(states, actions, keys[0])
    for i in range(n):
        single = env.transition(states[i], actions[i], keys[0])
        np.testing.assert_allclose(np.asarray(batched_next[i]), np.asarray(single), rtol=1e-5)


def test_autoreset_semantics():
    """NEXT_STEP autoreset: step after done returns reset obs, 0 reward,
    cleared flags, and ignores the action."""
    env = vectorize_func_env(CartPoleFunctional(), 16)
    step = jax.jit(make_autoreset_step(env, CartPoleFunctional().get_default_params(), time_limit=20))
    carry, obs = make_initial_carry(env, jax.random.PRNGKey(0), None)

    prev_done = np.zeros(16, dtype=bool)
    for t in range(60):
        actions = jnp.ones(16, dtype=jnp.int32)
        carry, ts = step(carry, actions)
        reward = np.asarray(ts.reward)
        term = np.asarray(ts.terminated)
        trunc = np.asarray(ts.truncated)
        # envs that were done last step must report a clean reset step
        assert np.all(reward[prev_done] == 0.0)
        assert not np.any(term[prev_done])
        assert not np.any(trunc[prev_done])
        # reset states must be inside the reset distribution
        obs_arr = np.asarray(ts.obs)
        assert np.all(np.abs(obs_arr[prev_done]) <= 0.05 + 1e-6)
        prev_done = term | trunc

    # truncation fires at the time limit
    assert prev_done.any() or t < 20


def test_equal_episode_length_under_truncation():
    """With autoreset + time limit and no termination, episodes tile exactly."""
    env = vectorize_func_env(PendulumFunctional(), 4)
    step = jax.jit(make_autoreset_step(env, PendulumFunctional().get_default_params(), time_limit=10))
    carry, _ = make_initial_carry(env, jax.random.PRNGKey(1), None)
    dones = []
    for t in range(40):
        carry, ts = step(carry, jnp.zeros((4, 1)))
        dones.append(np.asarray(ts.truncated))
    dones = np.stack(dones)
    # episodes end exactly every 11 steps (10 live steps + 1 reset step)
    first_done = np.argmax(dones[:, 0])
    assert dones[first_done, 0]
    assert dones[first_done + 11, 0]


def test_rng_stream_advances():
    """Each step advances the carried PRNG (no stuck randomness)."""
    env = vectorize_func_env(CartPoleFunctional(), 4)
    step = make_autoreset_step(env, None, time_limit=5)
    carry, _ = make_initial_carry(env, jax.random.PRNGKey(3), None)
    k0 = np.asarray(carry.rng)
    carry, _ = step(carry, jnp.zeros(4, dtype=jnp.int32))
    assert not np.array_equal(k0, np.asarray(carry.rng))
