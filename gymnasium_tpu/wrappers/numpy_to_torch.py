"""NumpyToTorch: expose a numpy-based env through torch tensors.

Parity surface: reference gymnasium/wrappers/numpy_to_torch.py:35.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu.wrappers.array_conversion import ArrayConversion, array_conversion

__all__ = ["NumpyToTorch", "numpy_to_torch", "torch_to_numpy"]


def numpy_to_torch(value: Any) -> Any:
    """Convert a (possibly nested) numpy structure to torch."""
    import torch

    return array_conversion(value, torch)


def torch_to_numpy(value: Any) -> Any:
    """Convert a (possibly nested) torch structure to numpy."""
    return array_conversion(value, np)


class NumpyToTorch(ArrayConversion):
    """Wraps a numpy env so actions/observations are torch tensors."""

    def __init__(self, env: gym.Env, device: Any = None):
        import torch

        from gymnasium_tpu.utils import RecordConstructorArgs

        RecordConstructorArgs.__init__(self, device=device)
        super().__init__(env, env_xp=np, target_xp=torch)
        self.device = device
