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


from gymnasium_tpu.envs.functional_jax_env import FunctionalJaxEnv  # noqa: E402


class CliffWalkingJaxEnv(FunctionalJaxEnv):
    """Stateful JAX CliffWalking (reference tabular/cliffwalking.py:360-380)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 50, "jax": True}

    def __init__(self, render_mode: str | None = None, **kwargs: Any):
        super().__init__(
            CliffWalkingFunctional(kwargs or None),
            metadata=self.metadata,
            render_mode=render_mode,
        )
