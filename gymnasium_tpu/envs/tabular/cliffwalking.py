"""CliffWalking as a device-resident tabular FuncEnv."""

from __future__ import annotations

from typing import Any

from gymnasium_tpu.envs.tabular.core import TabularFuncEnv
from gymnasium_tpu.envs.toy_text.cliffwalking import build_cliffwalking_model

__all__ = ["CliffWalkingFunctional"]


class CliffWalkingFunctional(TabularFuncEnv):
    """CliffWalking dense-tensor MDP."""

    def __init__(self, options: dict[str, Any] | None = None):
        options = dict(options or {})
        is_slippery = options.pop("is_slippery", False)
        super().__init__(build_cliffwalking_model(is_slippery), options)
