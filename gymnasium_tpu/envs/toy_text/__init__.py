"""Toy-text environments (reference gymnasium/envs/toy_text/__init__.py)."""

from gymnasium_tpu.envs.toy_text.blackjack import BlackjackEnv
from gymnasium_tpu.envs.toy_text.cliffwalking import CliffWalkingEnv
from gymnasium_tpu.envs.toy_text.frozen_lake import FrozenLakeEnv
from gymnasium_tpu.envs.toy_text.taxi import TaxiEnv

__all__ = [
    "BlackjackEnv",
    "CliffWalkingEnv",
    "FrozenLakeEnv",
    "TaxiEnv",
]
