"""Mountain car (discrete + continuous) as pure JAX functional envs."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.dynamics.mountain_car import (
    ContinuousMountainCarParams,
    MountainCarParams,
    integrate,
    is_goal,
)
from gymnasium_tpu.functional import FuncEnv

__all__ = ["MountainCarFunctional", "ContinuousMountainCarFunctional"]


class MountainCarFunctional(FuncEnv):
    """Stateless discrete-action mountain car."""

    rng_hooks = frozenset({"initial"})

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        params = self.get_default_params()
        low = np.array([params.min_position, -params.max_speed], dtype=np.float32)
        high = np.array([params.max_position, params.max_speed], dtype=np.float32)
        self.observation_space = spaces.Box(low, high, dtype=np.float32)
        self.action_space = spaces.Discrete(3)

    def get_default_params(self, **kwargs: Any) -> MountainCarParams:
        return MountainCarParams(**kwargs)

    def initial(self, rng, params: MountainCarParams | None = None):
        params = params or MountainCarParams()
        pos = jax.random.uniform(rng, (), minval=params.reset_low, maxval=params.reset_high)
        return jnp.stack((pos, jnp.zeros_like(pos)), axis=-1)

    def initial_batched(self, rng, n: int, params: MountainCarParams | None = None):
        params = params or MountainCarParams()
        pos = jax.random.uniform(rng, (n,), minval=params.reset_low, maxval=params.reset_high)
        return jnp.stack((pos, jnp.zeros_like(pos)), axis=-1)

    def transition(self, state, action, rng, params: MountainCarParams | None = None):
        params = params or MountainCarParams()
        push = (action - 1) * params.force
        return integrate(jnp, state, push, params)

    def observation(self, state, rng, params: MountainCarParams | None = None):
        return state.astype(jnp.float32)

    def reward(self, state, action, next_state, rng, params: MountainCarParams | None = None):
        return jnp.asarray(-1.0, dtype=jnp.float32)

    def terminal(self, state, rng, params: MountainCarParams | None = None):
        params = params or MountainCarParams()
        return is_goal(jnp, state, params)


class ContinuousMountainCarFunctional(FuncEnv):
    """Stateless continuous-action mountain car."""

    rng_hooks = frozenset({"initial"})

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        params = self.get_default_params()
        low = np.array([params.min_position, -params.max_speed], dtype=np.float32)
        high = np.array([params.max_position, params.max_speed], dtype=np.float32)
        self.observation_space = spaces.Box(low, high, dtype=np.float32)
        self.action_space = spaces.Box(
            params.min_action, params.max_action, shape=(1,), dtype=np.float32
        )

    def get_default_params(self, **kwargs: Any) -> ContinuousMountainCarParams:
        return ContinuousMountainCarParams(**kwargs)

    def initial(self, rng, params: ContinuousMountainCarParams | None = None):
        params = params or ContinuousMountainCarParams()
        pos = jax.random.uniform(rng, (), minval=params.reset_low, maxval=params.reset_high)
        return jnp.stack((pos, jnp.zeros_like(pos)), axis=-1)

    def initial_batched(self, rng, n: int, params: ContinuousMountainCarParams | None = None):
        params = params or ContinuousMountainCarParams()
        pos = jax.random.uniform(rng, (n,), minval=params.reset_low, maxval=params.reset_high)
        return jnp.stack((pos, jnp.zeros_like(pos)), axis=-1)

    def transition(self, state, action, rng, params: ContinuousMountainCarParams | None = None):
        params = params or ContinuousMountainCarParams()
        force = jnp.clip(jnp.reshape(action, ()), params.min_action, params.max_action)
        return integrate(jnp, state, force * params.power, params)

    def observation(self, state, rng, params: ContinuousMountainCarParams | None = None):
        return state.astype(jnp.float32)

    def reward(self, state, action, next_state, rng, params: ContinuousMountainCarParams | None = None):
        params = params or ContinuousMountainCarParams()
        reached = is_goal(jnp, next_state, params)
        a = jnp.reshape(action, ())
        return jnp.where(reached, 100.0, 0.0) - 0.1 * jnp.square(a)

    def terminal(self, state, rng, params: ContinuousMountainCarParams | None = None):
        params = params or ContinuousMountainCarParams()
        return is_goal(jnp, state, params)
