"""Bit-exact trajectory parity vs the reference Gymnasium implementation.

The reference package (mounted read-only) is imported directly and each of
our host classic-control/toy-text envs is held to identical observations,
rewards, and termination flags under a fixed seed — the north-star
correctness criterion from BASELINE.md.
"""

import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

ref_gym = pytest.importorskip("gymnasium")

import gymnasium_tpu as gym  # noqa: E402

PARITY_ENV_IDS = [
    "CartPole-v1",
    "MountainCar-v0",
    "MountainCarContinuous-v0",
    "Pendulum-v1",
    "Acrobot-v1",
    "FrozenLake-v1",
    "FrozenLake8x8-v1",
    "CliffWalking-v1",
    "Taxi-v3",
    "Blackjack-v1",
]


def _rollout(env, actions, seed):
    obs, info = env.reset(seed=seed)
    trace = [obs]
    rewards, terms, truncs = [], [], []
    for action in actions:
        obs, reward, terminated, truncated, _ = env.step(action)
        trace.append(obs)
        rewards.append(reward)
        terms.append(terminated)
        truncs.append(truncated)
        if terminated or truncated:
            obs, _ = env.reset()
            trace.append(obs)
    return trace, rewards, terms, truncs


@pytest.mark.parametrize("env_id", PARITY_ENV_IDS)
@pytest.mark.parametrize("seed", [0, 123])
def test_bit_exact_vs_reference(env_id, seed):
    try:
        ref_env = ref_gym.make(env_id)
    except Exception as e:  # pragma: no cover - env not in this reference version
        pytest.skip(f"reference cannot build {env_id}: {e}")
    env = gym.make(env_id)

    # identical action streams from the reference's action space sampling
    ref_env.action_space.seed(seed)
    num_steps = 300
    actions = [ref_env.action_space.sample() for _ in range(num_steps)]

    ref_trace, ref_rew, ref_term, ref_trunc = _rollout(ref_env, actions, seed)
    our_trace, our_rew, our_term, our_trunc = _rollout(env, actions, seed)

    assert len(ref_trace) == len(our_trace)
    for t, (a, b) in enumerate(zip(ref_trace, our_trace)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype, f"obs dtype mismatch at {t}: {a.dtype} vs {b.dtype}"
        assert np.array_equal(a, b), f"obs diverged at step {t}: {a} vs {b}"
    assert ref_rew == our_rew, "rewards diverged"
    assert ref_term == our_term, "terminations diverged"
    assert ref_trunc == our_trunc, "truncations diverged"

    ref_env.close()
    env.close()


@pytest.mark.parametrize("env_id", ["CartPole-v1", "Pendulum-v1", "MountainCar-v0", "Acrobot-v1"])
def test_functional_matches_host(env_id):
    """The device-resident functional env reproduces the host env's dynamics
    (same state in, same transition out) within float32 tolerance."""
    import jax

    spec = gym.spec(env_id)
    func_env = gym.envs.registration.load_env_creator(spec.jax_entry_point)()
    host = gym.make(env_id, disable_env_checker=True).unwrapped

    rng = np.random.default_rng(7)
    key = jax.random.PRNGKey(0)
    host.reset(seed=11)

    for _ in range(50):
        state = np.asarray(host.state, dtype=np.float64)
        action = host.action_space.sample()
        obs_h, rew_h, term_h, trunc_h, _ = host.step(action)

        next_state = func_env.transition(np.asarray(state), np.asarray(action), key)
        obs_f = func_env.observation(np.asarray(next_state), key)
        term_f = func_env.terminal(np.asarray(next_state), key)

        np.testing.assert_allclose(
            np.asarray(obs_f, dtype=np.float64),
            np.asarray(obs_h, dtype=np.float64),
            atol=1e-4,
            err_msg=f"{env_id} functional transition diverged from host",
        )
        assert bool(term_f) == bool(term_h)
        if term_h or trunc_h:
            host.reset()
