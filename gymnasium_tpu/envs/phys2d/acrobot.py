"""Acrobot as a pure JAX functional env (RK4 under vmap/jit)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.dynamics.acrobot import (
    AcrobotParams,
    integrate,
    is_terminated,
    observe,
)
from gymnasium_tpu.functional import FuncEnv

__all__ = ["AcrobotFunctional"]

_TORQUES = np.array([-1.0, 0.0, 1.0])


class AcrobotFunctional(FuncEnv):
    """Stateless acrobot: state is the raw ``[θ1, θ2, θ1', θ2']`` array."""

    rng_hooks = frozenset({"initial"})

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        params = self.get_default_params()
        high = np.array(
            [1.0, 1.0, 1.0, 1.0, params.max_vel_1, params.max_vel_2], dtype=np.float32
        )
        self.observation_space = spaces.Box(-high, high, dtype=np.float32)
        self.action_space = spaces.Discrete(3)

    def get_default_params(self, **kwargs: Any) -> AcrobotParams:
        return AcrobotParams(**kwargs)

    def initial(self, rng, params: AcrobotParams | None = None):
        params = params or AcrobotParams()
        return jax.random.uniform(
            rng, (4,), minval=-params.reset_bound, maxval=params.reset_bound
        )

    def initial_batched(self, rng, n: int, params: AcrobotParams | None = None):
        params = params or AcrobotParams()
        return jax.random.uniform(
            rng, (n, 4), minval=-params.reset_bound, maxval=params.reset_bound
        )

    def transition(self, state, action, rng, params: AcrobotParams | None = None):
        params = params or AcrobotParams()
        torque = jnp.asarray(_TORQUES)[action]
        return integrate(jnp, state, torque, params)

    def observation(self, state, rng, params: AcrobotParams | None = None):
        return observe(jnp, state).astype(jnp.float32)

    def reward(self, state, action, next_state, rng, params: AcrobotParams | None = None):
        return jnp.where(is_terminated(jnp, next_state), 0.0, -1.0).astype(jnp.float32)

    def terminal(self, state, rng, params: AcrobotParams | None = None):
        return is_terminated(jnp, state)
