"""Taxi as a device-resident tabular FuncEnv."""

from __future__ import annotations

from typing import Any

from gymnasium_tpu.envs.tabular.core import TabularFuncEnv
from gymnasium_tpu.envs.toy_text.taxi import build_taxi_model

__all__ = ["TaxiFunctional"]


class TaxiFunctional(TabularFuncEnv):
    """Taxi dense-tensor MDP (500 states, 6 actions).

    The host env's ``fickle_passenger`` post-step rewrite is outside the MDP
    tensors and not represented here; ``is_rainy`` is.
    """

    def __init__(self, options: dict[str, Any] | None = None):
        options = dict(options or {})
        is_rainy = options.pop("is_rainy", False)
        options.pop("fickle_passenger", None)
        super().__init__(build_taxi_model(is_rainy), options)
