"""Box2D-class environments (reference gymnasium/envs/box2d/__init__.py)."""

from gymnasium_tpu.envs.box2d.bipedal_walker import (
    BipedalWalker,
    BipedalWalkerHardcore,
)
from gymnasium_tpu.envs.box2d.car_racing import CarRacing
from gymnasium_tpu.envs.box2d.lunar_lander import LunarLander, LunarLanderContinuous

__all__ = [
    "BipedalWalker",
    "BipedalWalkerHardcore",
    "CarRacing",
    "LunarLander",
    "LunarLanderContinuous",
]
