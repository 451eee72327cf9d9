"""Vectorization runtime.

Primary implementation is the device-resident :class:`JaxVectorEnv`; the
host-side :class:`SyncVectorEnv` and :class:`AsyncVectorEnv` mirror the
reference API for wrapping arbitrary Python envs.
"""

from gymnasium_tpu.vector.vector_env import (
    AutoresetMode,
    VectorActionWrapper,
    VectorEnv,
    VectorObservationWrapper,
    VectorRewardWrapper,
    VectorWrapper,
)

__all__ = [
    "VectorEnv",
    "VectorWrapper",
    "VectorObservationWrapper",
    "VectorActionWrapper",
    "VectorRewardWrapper",
    "AutoresetMode",
    "JaxVectorEnv",
    "SyncVectorEnv",
    "AsyncVectorEnv",
    "utils",
]


def __getattr__(name):
    # Heavy implementations import lazily (JAX / multiprocessing).
    if name == "JaxVectorEnv":
        from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

        return JaxVectorEnv
    if name == "SyncVectorEnv":
        from gymnasium_tpu.vector.sync_vector_env import SyncVectorEnv

        return SyncVectorEnv
    if name == "AsyncVectorEnv":
        from gymnasium_tpu.vector.async_vector_env import AsyncVectorEnv

        return AsyncVectorEnv
    if name == "utils":
        import gymnasium_tpu.vector.utils as utils

        return utils
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
