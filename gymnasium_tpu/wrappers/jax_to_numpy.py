"""JaxToNumpy: expose a jax-based env through numpy arrays.

Parity surface: reference gymnasium/wrappers/jax_to_numpy.py:33.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu.wrappers.array_conversion import ArrayConversion, array_conversion

__all__ = ["JaxToNumpy", "jax_to_numpy", "numpy_to_jax"]


def jax_to_numpy(value: Any) -> Any:
    """Convert a (possibly nested) jax structure to numpy."""
    return array_conversion(value, np)


def numpy_to_jax(value: Any) -> Any:
    """Convert a (possibly nested) numpy structure to jax."""
    import jax.numpy as jnp

    return array_conversion(value, jnp)


class JaxToNumpy(ArrayConversion):
    """Wraps a jax env so actions/observations are numpy arrays."""

    def __init__(self, env: gym.Env):
        import jax.numpy as jnp

        from gymnasium_tpu.utils import RecordConstructorArgs

        RecordConstructorArgs.__init__(self)  # no user kwargs to rebuild
        super().__init__(env, env_xp=jnp, target_xp=np)
