"""BlockchainCPD env behavioral tests (reference blockchain/cpd_env.py —
fork-specific CPD mining game, SURVEY.md §2.9)."""

import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu.envs.blockchain.cpd_env import (
    BlockchainCPDEnv,
    MultiAgentBlockchainCPDEnv,
    compute_utilities,
    simplex_normalize,
    update_efficiencies,
)


def test_simplex_normalize():
    out = simplex_normalize(np.array([2.0, 1.0, 1.0]))
    assert out.shape == (3,)
    assert np.isclose(out.sum(), 1.0)
    assert np.all(out >= 0)
    # degenerate all-zero action falls back to a valid simplex point
    out0 = simplex_normalize(np.array([0.0, 0.0, 0.0]))
    assert np.isclose(out0.sum(), 1.0)


def test_registered_variants_build():
    for env_id in ["BlockchainCPD-v0", "BlockchainCPD-v0-TFT", "BlockchainCPD-v0-Random"]:
        env = gym.make(env_id)
        obs, info = env.reset(seed=0)
        assert env.observation_space.contains(obs)
        env.close()


def test_episode_terminates_at_max_rounds():
    env = BlockchainCPDEnv(max_rounds=5)
    env.reset(seed=0)
    for i in range(5):
        _, _, terminated, truncated, _ = env.step(np.array([1.0, 0.0, 0.0]))
    assert terminated and not truncated


def test_constructive_beats_destructive_against_honest():
    """Against honest opponents, full-constructive play must out-earn
    full-destructive (the d² cost and efficiency damage are pure loss)."""

    def total(action):
        env = BlockchainCPDEnv(max_rounds=30, opponent_policy="honest")
        env.reset(seed=0)
        tot = 0.0
        for _ in range(30):
            _, r, term, *_ = env.step(action)
            tot += r
        return tot

    assert total(np.array([1.0, 0.0, 0.0])) > total(np.array([0.0, 0.0, 1.0]))


def test_destructive_actions_reduce_efficiency():
    env = BlockchainCPDEnv(max_rounds=10, opponent_policy="honest")
    env.reset(seed=0)
    env.step(np.array([0.0, 0.0, 1.0]))
    effs = env._efficiencies
    # opponents were attacked; their efficiency must drop below 1
    mask = np.arange(env.num_miners) != env.agent_id
    assert np.all(effs[mask] < 1.0)


def test_efficiency_recovers_without_attacks():
    env = BlockchainCPDEnv(max_rounds=20, opponent_policy="honest")
    env.reset(seed=0)
    env.step(np.array([0.0, 0.0, 1.0]))
    low = env._efficiencies.copy()
    for _ in range(10):
        env.step(np.array([1.0, 0.0, 0.0]))
    mask = np.arange(env.num_miners) != env.agent_id
    assert np.all(env._efficiencies[mask] > low[mask])


def test_opponent_policies_differ():
    """Policies show up in the opponents' recorded actions (the agent's obs
    only exposes mean opponent eta, which its own actions drive — same as
    the reference)."""

    def opponent_actions(policy):
        env = BlockchainCPDEnv(max_rounds=10, opponent_policy=policy)
        env.reset(seed=3)
        acts = []
        for _ in range(10):
            *_, info = env.step(np.array([0.2, 0.3, 0.5]))
            acts.append(info["round_record"]["actions"][1])
        return np.stack(acts)

    honest = opponent_actions("honest")
    rand = opponent_actions("random")
    tft = opponent_actions("tit_for_tat")
    assert np.allclose(honest, [1.0, 0.0, 0.0])
    assert not np.allclose(rand, honest)
    # TFT mirrors the agent's (normalized) action from the previous round
    assert np.allclose(tft[1:], np.array([0.2, 0.3, 0.5]))
    assert np.allclose(tft[0], [1.0, 0.0, 0.0])  # first round: honest


def test_history_and_round_record():
    env = BlockchainCPDEnv(max_rounds=10)
    env.reset(seed=0)
    _, _, _, _, info = env.step(env.action_space.sample())
    assert "round_record" in info
    assert len(env.get_history()) == 1
    env.step(env.action_space.sample())
    assert len(env.get_last_n_rounds(1)) == 1
    assert env.get_last_n_rounds(1)[0]["round"] == 2


def test_multi_agent_env_steps():
    env = MultiAgentBlockchainCPDEnv(num_miners=3, max_rounds=5)
    obs, info = env.reset(seed=0)
    actions = [np.array([1.0, 0.0, 0.0])] * 3
    obs, rewards, terminated, truncated, info = env.step(actions)
    assert len(rewards) == 3
    assert not terminated


def test_utilities_math():
    """U_i = R·α·c + R·p·η^β − λd² (reference cpd_env.py:255-295)."""
    actions = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    eff = np.ones(2)
    alpha = np.array([0.5, 0.5])
    u = compute_utilities(actions, eff, alpha, base_reward=10.0, beta=1.5, lambda_=2.0)
    # miner 0: pure constructive -> R*alpha*c = 10*0.5*1 = 5
    assert np.isclose(u[0], 5.0)
    # miner 1: pure destructive -> -lambda*d^2 = -2
    assert np.isclose(u[1], -2.0)


def test_update_efficiencies_floor():
    actions = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    eff = np.ones(2)
    for _ in range(100):
        eff = update_efficiencies(actions, eff, kappa=0.5, eta_recovery=0.0, eta_min=0.1)
    assert np.all(eff >= 0.1 - 1e-12)
