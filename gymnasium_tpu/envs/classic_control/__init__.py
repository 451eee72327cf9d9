"""Classic-control environments (reference gymnasium/envs/classic_control/__init__.py)."""

from gymnasium_tpu.envs.classic_control.acrobot import AcrobotEnv
from gymnasium_tpu.envs.classic_control.cartpole import CartPoleEnv, CartPoleVectorEnv
from gymnasium_tpu.envs.classic_control.continuous_mountain_car import (
    Continuous_MountainCarEnv,
)
from gymnasium_tpu.envs.classic_control.mountain_car import MountainCarEnv
from gymnasium_tpu.envs.classic_control.pendulum import PendulumEnv

__all__ = [
    "AcrobotEnv",
    "CartPoleEnv",
    "CartPoleVectorEnv",
    "Continuous_MountainCarEnv",
    "MountainCarEnv",
    "PendulumEnv",
]
