"""Vector-level array-conversion wrappers (jax / numpy / torch).

Parity surface: reference gymnasium/wrappers/vector/ array conversion
mirrors (JaxToNumpy, JaxToTorch, NumpyToTorch).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from gymnasium_tpu.vector.vector_env import VectorEnv, VectorWrapper
from gymnasium_tpu.wrappers.array_conversion import array_conversion, module_namespace

__all__ = ["ArrayConversion", "JaxToNumpy", "JaxToTorch", "NumpyToTorch"]


class ArrayConversion(VectorWrapper):
    """Convert batched actions/results between array frameworks."""

    def __init__(self, env: VectorEnv, env_xp, target_xp):
        super().__init__(env)
        self._env_xp = module_namespace(env_xp) if isinstance(env_xp, str) else env_xp
        self._target_xp = (
            module_namespace(target_xp) if isinstance(target_xp, str) else target_xp
        )

    def step(self, actions):
        actions = array_conversion(actions, self._env_xp)
        obs, reward, terminated, truncated, info = self.env.step(actions)
        return (
            array_conversion(obs, self._target_xp),
            array_conversion(reward, self._target_xp),
            array_conversion(terminated, self._target_xp),
            array_conversion(truncated, self._target_xp),
            array_conversion(info, self._target_xp),
        )

    def reset(self, *, seed: int | list[int] | None = None, options: dict[str, Any] | None = None):
        if options:
            options = array_conversion(options, self._env_xp)
        obs, info = self.env.reset(seed=seed, options=options)
        return array_conversion(obs, self._target_xp), array_conversion(info, self._target_xp)


class JaxToNumpy(ArrayConversion):
    """Batched jax env exposed through numpy arrays."""

    def __init__(self, env: VectorEnv):
        import jax.numpy as jnp

        super().__init__(env, env_xp=jnp, target_xp=np)


class JaxToTorch(ArrayConversion):
    """Batched jax env exposed through torch tensors."""

    def __init__(self, env: VectorEnv, device: Any = None):
        import jax.numpy as jnp
        import torch

        super().__init__(env, env_xp=jnp, target_xp=torch)
        self.device = device


class NumpyToTorch(ArrayConversion):
    """Batched numpy env exposed through torch tensors."""

    def __init__(self, env: VectorEnv, device: Any = None):
        import torch

        super().__init__(env, env_xp=np, target_xp=torch)
        self.device = device
