"""Vector-level NormalizeObservation.

Parity surface: reference gymnasium/wrappers/vector/stateful_observation.py:27.
"""

from __future__ import annotations

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.vector.vector_env import VectorEnv, VectorObservationWrapper
from gymnasium_tpu.wrappers.utils import RunningMeanStd

__all__ = ["NormalizeObservation"]


class NormalizeObservation(VectorObservationWrapper):
    """Running mean/std normalization over the batched observations."""

    def __init__(self, env: VectorEnv, epsilon: float = 1e-8):
        super().__init__(env)

        assert env.single_observation_space.shape is not None
        self.single_observation_space = spaces.Box(
            low=-np.inf,
            high=np.inf,
            shape=env.single_observation_space.shape,
            dtype=np.float64,
        )
        self.observation_space = spaces.Box(
            low=-np.inf,
            high=np.inf,
            shape=env.observation_space.shape,
            dtype=np.float64,
        )

        self.obs_rms = RunningMeanStd(
            shape=self.single_observation_space.shape,
            dtype=self.single_observation_space.dtype,
        )
        self.epsilon = epsilon
        self._update_running_mean = True

    @property
    def update_running_mean(self) -> bool:
        """Freeze/continue updating the running statistics."""
        return self._update_running_mean

    @update_running_mean.setter
    def update_running_mean(self, setting: bool):
        self._update_running_mean = setting

    def observations(self, observations):
        """Normalize the batch with the current statistics."""
        observations = np.asarray(observations)
        if self._update_running_mean:
            self.obs_rms.update(observations)
        return (observations - self.obs_rms.mean) / np.sqrt(self.obs_rms.var + self.epsilon)
