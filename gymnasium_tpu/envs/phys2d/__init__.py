"""Functional 2D-physics environments (reference gymnasium/envs/phys2d/__init__.py)."""

from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional, CartPoleJaxEnv
from gymnasium_tpu.envs.phys2d.pendulum import PendulumFunctional, PendulumJaxEnv

__all__ = [
    "CartPoleFunctional",
    "CartPoleJaxEnv",
    "PendulumFunctional",
    "PendulumJaxEnv",
]
