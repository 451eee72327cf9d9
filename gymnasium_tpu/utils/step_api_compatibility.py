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
    """Convert a 4-tuple ``(obs, reward, done, info)`` to the 5-tuple API."""
    if len(step_returns) == 5:
        return step_returns

    observations, rewards, dones, infos = step_returns

    if is_vector_env is False:
        if isinstance(infos, dict) and "TimeLimit.truncated" in infos:
            truncated = infos.pop("TimeLimit.truncated")
            terminated = dones and not truncated
        else:
            truncated = False
            terminated = dones
        return observations, rewards, bool(terminated), bool(truncated), infos

    # vector case: infos can be dict-of-arrays or list-of-dicts
    if isinstance(infos, list):
        truncated = np.array(
            [info.pop("TimeLimit.truncated", False) for info in infos]
        )
    elif isinstance(infos, dict):
        truncated = np.asarray(infos.pop("TimeLimit.truncated", np.zeros_like(dones, dtype=bool)))
        infos.pop("_TimeLimit.truncated", None)
    else:
        raise TypeError(f"Unexpected value of infos, vector environments infos should be list or dict, actual type: {type(infos)}")
    dones = np.asarray(dones)
    return (
        observations,
        rewards,
        np.logical_and(dones, np.logical_not(truncated)),
        np.logical_and(dones, truncated),
        infos,
    )


def convert_to_done_step_api(step_returns, is_vector_env: bool = False):
    """Convert a 5-tuple step return to the old 4-tuple ``done`` API."""
    if len(step_returns) == 4:
        return step_returns

    observations, rewards, terminated, truncated, infos = step_returns
    if is_vector_env is False:
        if truncated and not terminated:
            if isinstance(infos, dict):
                infos = {**infos, "TimeLimit.truncated": True}
        return observations, rewards, bool(terminated or truncated), infos

    terminated = np.asarray(terminated)
    truncated = np.asarray(truncated)
    if isinstance(infos, dict):
        infos = {**infos, "TimeLimit.truncated": np.logical_and(truncated, np.logical_not(terminated))}
    elif isinstance(infos, list):
        infos = [
            {**info, "TimeLimit.truncated": bool(trunc and not term)}
            for info, term, trunc in zip(infos, terminated, truncated)
        ]
    return observations, rewards, np.logical_or(terminated, truncated), infos


def step_api_compatibility(
    step_returns,
    output_truncation_bool: bool = True,
    is_vector_env: bool = False,
):
    """Normalize step returns to the requested API shape."""
    if output_truncation_bool:
        return convert_to_terminated_truncated_step_api(step_returns, is_vector_env)
    return convert_to_done_step_api(step_returns, is_vector_env)
