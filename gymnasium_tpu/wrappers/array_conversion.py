"""Cross-framework array conversion wrappers.

Parity surface: reference gymnasium/wrappers/array_conversion.py:156 — a
generic converter between array frameworks (numpy / jax / torch), without
the array-api-compat dependency: conversions dispatch on module pairs.
"""

from __future__ import annotations

import functools
import numbers
from collections import abc
from typing import Any, Callable, Iterable, Mapping, SupportsFloat

import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu.core import ActType, ObsType, RenderFrame, WrapperActType, WrapperObsType
from gymnasium_tpu.error import DependencyNotInstalled
from gymnasium_tpu.utils import RecordConstructorArgs

__all__ = ["ArrayConversion", "module_namespace", "array_conversion"]


def module_namespace(xp_name: str):
    """Import the array namespace for ``"numpy"``, ``"jax"`` or ``"torch"``."""
    if xp_name in ("numpy", "np"):
        return np
    if xp_name in ("jax", "jax.numpy", "jnp"):
        import jax.numpy as jnp

        return jnp
    if xp_name == "torch":
        try:
            import torch
        except ImportError as e:
            raise DependencyNotInstalled("torch is not installed") from e
        return torch
    raise ValueError(f"Unknown array namespace: {xp_name}")


def _namespace_name(xp) -> str:
    name = getattr(xp, "__name__", str(xp))
    if "jax" in name:
        return "jax"
    if "torch" in name:
        return "torch"
    return "numpy"


def _to_numpy(value):
    if hasattr(value, "detach"):  # torch tensor
        return value.detach().cpu().numpy()
    return np.asarray(value)


def _from_numpy(value: np.ndarray, xp):
    name = _namespace_name(xp)
    if name == "jax":
        import jax.numpy as jnp

        return jnp.asarray(value)
    if name == "torch":
        import torch

        # NOT np.ascontiguousarray: it promotes 0-d arrays to 1-d, breaking
        # scalar-tensor roundtrips. as_tensor copies when layout requires.
        return torch.as_tensor(np.asarray(value))
    return np.asarray(value)


@functools.singledispatch
def array_conversion(value: Any, xp) -> Any:
    """Convert ``value`` (array or nested container) into namespace ``xp``."""
    if value is None:
        return None
    if hasattr(value, "__array__") or hasattr(value, "detach"):
        return _from_numpy(_to_numpy(value), xp)
    return value


@array_conversion.register(abc.Mapping)
def _mapping_conversion(value: Mapping[str, Any], xp) -> Mapping[str, Any]:
    return type(value)(**{k: array_conversion(v, xp) for k, v in value.items()})


@array_conversion.register(tuple)
def _tuple_conversion(value, xp):
    if hasattr(value, "_fields"):  # NamedTuple
        return type(value)(*(array_conversion(v, xp) for v in value))
    return tuple(array_conversion(v, xp) for v in value)


@array_conversion.register(list)
def _list_conversion(value, xp):
    return [array_conversion(v, xp) for v in value]


@array_conversion.register(numbers.Number)
def _number_conversion(value, xp):
    name = _namespace_name(xp)
    if name == "numpy":
        return value
    if name == "torch":
        import torch

        # torch's own scalar rules (float -> float32, int -> int64) so a
        # python-float -> torch -> numpy roundtrip yields float32
        return torch.as_tensor(value)
    return _from_numpy(np.asarray(value), xp)


class ArrayConversion(gym.Wrapper, RecordConstructorArgs):
    """Convert actions from / results to a target array framework.

    The env itself operates in ``env_xp`` arrays; the user sees ``target_xp``
    arrays. E.g. ``ArrayConversion(env, env_xp="jax", target_xp="torch")``.

    Inherits ``RecordConstructorArgs`` (as the reference does,
    array_conversion.py:156) so the wrapper appears reconstructibly in
    ``EnvSpec.additional_wrappers``.
    """

    def __init__(self, env: gym.Env, env_xp, target_xp):
        RecordConstructorArgs.__init__(
            self, env_xp=env_xp, target_xp=target_xp, _disable_deepcopy=True
        )
        gym.Wrapper.__init__(self, env)
        self._env_xp = module_namespace(env_xp) if isinstance(env_xp, str) else env_xp
        self._target_xp = module_namespace(target_xp) if isinstance(target_xp, str) else target_xp

    def step(self, action: WrapperActType):
        jax_action = array_conversion(action, self._env_xp)
        obs, reward, terminated, truncated, info = self.env.step(jax_action)
        return (
            array_conversion(obs, self._target_xp),
            float(reward),
            bool(terminated),
            bool(truncated),
            array_conversion(info, self._target_xp),
        )

    def reset(self, *, seed: int | None = None, options: dict[str, Any] | None = None):
        if options:
            options = array_conversion(options, self._env_xp)
        obs, info = self.env.reset(seed=seed, options=options)
        return array_conversion(obs, self._target_xp), array_conversion(info, self._target_xp)

    def render(self) -> RenderFrame | list[RenderFrame] | None:
        return self.env.render()

    def __getstate__(self):
        """Pickle by namespace NAME — module objects are unpicklable
        (reference array_conversion.py:261-273)."""
        return {
            "env_xp_name": _namespace_name(self._env_xp),
            "target_xp_name": _namespace_name(self._target_xp),
            "env": self.env,
        }

    def __setstate__(self, d):
        """Restore namespaces by re-importing them from their names; the
        Wrapper base state (lazy space/metadata overrides) re-initializes."""
        self._env_xp = module_namespace(d["env_xp_name"])
        self._target_xp = module_namespace(d["target_xp_name"])
        gym.Wrapper.__init__(self, d["env"])
