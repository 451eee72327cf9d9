"""Conversion between the old done-based and new terminated/truncated step APIs.

Parity surface: reference gymnasium/utils/step_api_compatibility.py:27-138.
"""

from __future__ import annotations

from typing import SupportsFloat, Tuple, Union

import numpy as np

__all__ = [
    "convert_to_terminated_truncated_step_api",
    "convert_to_done_step_api",
    "step_api_compatibility",
]

DoneStepType = Tuple[Union[dict, np.ndarray], Union[float, np.ndarray], Union[bool, np.ndarray], Union[dict, list]]
TerminatedTruncatedStepType = Tuple[
    Union[dict, np.ndarray], Union[float, np.ndarray], Union[bool, np.ndarray], Union[bool, np.ndarray], Union[dict, list]
]


def convert_to_terminated_truncated_step_api(step_returns, is_vector_env: bool = False):
    """Convert a 4-tuple ``(obs, reward, done, info)`` to the 5-tuple API.

    ``TimeLimit.truncated`` is popped from the info to recover truncation
    (reference step_api_compatibility.py:27-78).
    """
    if len(step_returns) == 5:
        return step_returns

    assert len(step_returns) == 4
    observations, rewards, dones, infos = step_returns

    if is_vector_env is False:
        truncated = infos.pop("TimeLimit.truncated", False)
        return (
            observations,
            rewards,
            dones and not truncated,
            dones and truncated,
            infos,
        )
    if isinstance(infos, list):
        truncated = np.array(
            [info.pop("TimeLimit.truncated", False) for info in infos]
        )
        return (
            observations,
            rewards,
            np.logical_and(dones, np.logical_not(truncated)),
            np.logical_and(dones, truncated),
            infos,
        )
    if isinstance(infos, dict):
        num_envs = len(dones)
        truncated = infos.pop("TimeLimit.truncated", np.zeros(num_envs, dtype=bool))
        return (
            observations,
            rewards,
            np.logical_and(dones, np.logical_not(truncated)),
            np.logical_and(dones, truncated),
            infos,
        )
    raise TypeError(
        f"Unexpected value of infos, as is_vector_envs=False, expects `info` to be a list or dict, actual type: {type(infos)}"
    )


def convert_to_done_step_api(step_returns, is_vector_env: bool = False):
    """Convert a 5-tuple step return to the old 4-tuple ``done`` API.

    Writes ``TimeLimit.truncated`` into the info (in place) whenever the
    episode ended — including a ``False`` value when it terminated — so the
    conversion roundtrips (reference step_api_compatibility.py:81-135).
    """
    if len(step_returns) == 4:
        return step_returns

    assert len(step_returns) == 5
    observations, rewards, terminated, truncated, infos = step_returns

    if is_vector_env is False:
        if truncated or terminated:
            infos["TimeLimit.truncated"] = truncated and not terminated
        return (
            observations,
            rewards,
            terminated or truncated,
            infos,
        )
    if isinstance(infos, list):
        for info, env_truncated, env_terminated in zip(
            infos, truncated, terminated, strict=True
        ):
            if env_truncated or env_terminated:
                info["TimeLimit.truncated"] = env_truncated and not env_terminated
        return (
            observations,
            rewards,
            np.logical_or(terminated, truncated),
            infos,
        )
    if isinstance(infos, dict):
        if np.logical_or(np.any(truncated), np.any(terminated)):
            infos["TimeLimit.truncated"] = np.logical_and(
                truncated, np.logical_not(terminated)
            )
        return (
            observations,
            rewards,
            np.logical_or(terminated, truncated),
            infos,
        )
    raise TypeError(
        f"Unexpected value of infos, as is_vector_envs=False, expects `info` to be a list or dict, actual type: {type(infos)}"
    )


def step_api_compatibility(
    step_returns,
    output_truncation_bool: bool = True,
    is_vector_env: bool = False,
):
    """Normalize step returns to the requested API shape."""
    if output_truncation_bool:
        return convert_to_terminated_truncated_step_api(step_returns, is_vector_env)
    return convert_to_done_step_api(step_returns, is_vector_env)
