"""JaxToTorch: expose a jax-based env through torch tensors.

Parity surface: reference gymnasium/wrappers/jax_to_torch.py:49.
"""

from __future__ import annotations

from typing import Any

import gymnasium_tpu as gym
from gymnasium_tpu.wrappers.array_conversion import ArrayConversion, array_conversion

__all__ = ["JaxToTorch", "jax_to_torch", "torch_to_jax"]


def jax_to_torch(value: Any) -> Any:
    """Convert a (possibly nested) jax structure to torch."""
    import torch

    return array_conversion(value, torch)


def torch_to_jax(value: Any) -> Any:
    """Convert a (possibly nested) torch structure to jax."""
    import jax.numpy as jnp

    return array_conversion(value, jnp)


class JaxToTorch(ArrayConversion):
    """Wraps a jax env so actions/observations are torch tensors."""

    def __init__(self, env: gym.Env, device: Any = None):
        import jax.numpy as jnp
        import torch

        from gymnasium_tpu.utils import RecordConstructorArgs

        RecordConstructorArgs.__init__(self, device=device)
        super().__init__(env, env_xp=jnp, target_xp=torch)
        self.device = device
