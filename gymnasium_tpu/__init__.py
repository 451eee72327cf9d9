"""gymnasium_tpu: a TPU-native RL environment framework.

Capability parity with the reference Gymnasium API (spaces, Env/Wrapper
protocol, registration, vectorization, wrappers) built JAX-first: every
environment is a pure functional MDP jitted/vmapped/sharded on device, with
the classic stateful API kept as a thin host shell.
"""

from gymnasium_tpu import error, logger, spaces
from gymnasium_tpu.core import (
    ActionWrapper,
    ActType,
    Env,
    ObservationWrapper,
    ObsType,
    RewardWrapper,
    Wrapper,
)
from gymnasium_tpu.functional import FuncEnv
from gymnasium_tpu.spaces import Space

__version__ = "0.1.0"

__all__ = [
    "Env",
    "Wrapper",
    "ObservationWrapper",
    "RewardWrapper",
    "ActionWrapper",
    "Space",
    "FuncEnv",
    "spaces",
    "error",
    "logger",
    "envs",
    "vector",
    "wrappers",
    "utils",
    "register",
    "make",
    "make_vec",
    "spec",
    "registry",
    "pprint_registry",
    "register_envs",
    "VectorizeMode",
    "experimental",
    "VectorEnv",
    "VectorWrapper",
    "VectorObservationWrapper",
    "VectorActionWrapper",
    "VectorRewardWrapper",
    "__version__",
]


def __getattr__(name):
    # Registration/vector/wrapper layers import lazily so that space-only and
    # functional-only users don't pay for the full framework import.
    if name in (
        "register",
        "make",
        "make_vec",
        "spec",
        "registry",
        "pprint_registry",
        "register_envs",
        "VectorizeMode",
    ):
        import gymnasium_tpu.envs  # noqa: F401  (populates the registry)
        from gymnasium_tpu.envs import registration

        return getattr(registration, name)
    if name in (
        "VectorEnv",
        "VectorWrapper",
        "VectorObservationWrapper",
        "VectorActionWrapper",
        "VectorRewardWrapper",
    ):
        from gymnasium_tpu import vector

        return getattr(vector, name)
    if name in ("envs", "vector", "wrappers", "utils", "functional", "experimental"):
        import importlib

        return importlib.import_module(f"gymnasium_tpu.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
