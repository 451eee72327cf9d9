"""MuJoCo-class robots over the autodiff articulated engine."""

from gymnasium_tpu.envs.mujoco.mujoco_env import MujocoEnv, load_model

__all__ = ["MujocoEnv", "load_model"]
