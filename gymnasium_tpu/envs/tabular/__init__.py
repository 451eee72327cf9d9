"""Tabular JAX FuncEnvs (reference gymnasium/envs/tabular/__init__.py)."""

from gymnasium_tpu.envs.tabular.blackjack import BlackJackJaxEnv
from gymnasium_tpu.envs.tabular.cliffwalking import CliffWalkingJaxEnv

__all__ = [
    "BlackJackJaxEnv",
    "CliffWalkingJaxEnv",
]
