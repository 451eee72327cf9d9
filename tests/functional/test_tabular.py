"""Device tabular envs vs host toy-text envs: distributional equivalence.

Pattern from reference tests/functional/test_jax_blackjack.py — the JAX
functional env must produce the same reward/termination statistics as the
numpy original under a random policy."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv


def host_random_stats(env_id, episodes=400, seed=0, max_steps=200):
    env = gym.make(env_id, disable_env_checker=True)
    rng = np.random.default_rng(seed)
    returns, lengths = [], []
    for ep in range(episodes):
        env.reset(seed=seed + ep)
        total, length = 0.0, 0
        for _ in range(max_steps):
            _, r, te, tr, _ = env.step(int(rng.integers(env.action_space.n)))
            total += float(r)
            length += 1
            if te or tr:
                break
        returns.append(total)
        lengths.append(length)
    return np.mean(returns), np.mean(lengths)


def device_random_stats(env_id, seed=0, num_envs=256, steps=200):
    # match the 200-step truncation the host loop applies
    env = gym.make_vec(
        env_id,
        num_envs=num_envs,
        vectorization_mode="jax",
        vector_kwargs={"max_episode_steps": 200},
    )
    env.reset(seed=seed)
    _, traj = env.rollout(steps, unroll=1)
    reward = np.asarray(traj.reward)
    done = np.asarray(traj.terminated) | np.asarray(traj.truncated)
    # mean return per episode = total reward / episodes completed
    episodes = max(int(done.sum()), 1)
    return reward.sum() / episodes, reward.size / episodes


@pytest.mark.parametrize(
    "env_id, rtol",
    [
        ("FrozenLake-v1", 0.35),
        ("CliffWalking-v1", 0.35),
        ("Blackjack-v1", 0.15),
    ],
)
def test_tabular_distribution_match(env_id, rtol):
    host_ret, host_len = host_random_stats(env_id)
    if env_id == "Blackjack-v1":
        from gymnasium_tpu.envs.tabular.blackjack import BlackjackFunctional

        env = JaxVectorEnv(BlackjackFunctional({"sab": True}), num_envs=512, seed=3)
        env.reset()
        _, traj = env.rollout(400, unroll=1)
        done = np.asarray(traj.terminated)
        dev_ret = np.asarray(traj.reward).sum() / max(int(done.sum()), 1)
        dev_len = done.size / max(int(done.sum()), 1)
    else:
        dev_ret, dev_len = device_random_stats(env_id)

    assert np.isclose(dev_ret, host_ret, rtol=rtol, atol=0.05), (
        f"{env_id}: device mean return {dev_ret} vs host {host_ret}"
    )
    assert np.isclose(dev_len, host_len, rtol=rtol, atol=2.0), (
        f"{env_id}: device mean length {dev_len} vs host {host_len}"
    )
