"""Pendulum as a pure JAX functional env (device-resident primary path).

Dynamics shared with the host env via gymnasium_tpu/envs/dynamics/pendulum.py
(reference counterpart: phys2d/pendulum.py:39-252).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.dynamics.pendulum import (
    PendulumParams,
    cost,
    integrate,
    observe,
)
from gymnasium_tpu.functional import FuncEnv

__all__ = ["PendulumFunctional", "PendulumParams"]


class PendulumFunctional(FuncEnv):
    """Stateless pendulum: state is the raw ``[θ, θ']`` array."""

    rng_hooks = frozenset({"initial"})

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        params = self.get_default_params()
        high = np.array([1.0, 1.0, params.max_speed], dtype=np.float32)
        self.observation_space = spaces.Box(-high, high, dtype=np.float32)
        self.action_space = spaces.Box(
            -params.max_torque, params.max_torque, shape=(1,), dtype=np.float32
        )

    def get_default_params(self, **kwargs: Any) -> PendulumParams:
        return PendulumParams(**kwargs)

    def initial(self, rng, params: PendulumParams | None = None):
        params = params or PendulumParams()
        high = jnp.asarray([params.reset_x, params.reset_y])
        return jax.random.uniform(rng, (2,), minval=-high, maxval=high)

    def initial_batched(self, rng, n: int, params: PendulumParams | None = None):
        params = params or PendulumParams()
        high = jnp.asarray([params.reset_x, params.reset_y])
        return jax.random.uniform(rng, (n, 2), minval=-high, maxval=high)

    def transition(self, state, action, rng, params: PendulumParams | None = None):
        params = params or PendulumParams()
        u = jnp.clip(jnp.reshape(action, ()), -params.max_torque, params.max_torque)
        return integrate(jnp, state, u, params)

    def observation(self, state, rng, params: PendulumParams | None = None):
        return observe(jnp, state).astype(jnp.float32)

    def reward(self, state, action, next_state, rng, params: PendulumParams | None = None):
        params = params or PendulumParams()
        u = jnp.clip(jnp.reshape(action, ()), -params.max_torque, params.max_torque)
        return -cost(jnp, state, u, params).astype(jnp.float32)

    def terminal(self, state, rng, params: PendulumParams | None = None):
        return jnp.asarray(False)

    # -- host-side rendering ----------------------------------------------

    def render_init(self, screen_width: int = 500, screen_height: int = 500):
        return (screen_width, screen_height)

    def render_image(self, state, render_state, params: PendulumParams | None = None):
        import math

        from gymnasium_tpu.utils.raster import Canvas

        width, height = render_state
        canvas = Canvas(width, height)
        cx, cy = width / 2, height / 2
        scale = width / 4.4
        theta = float(np.asarray(state)[0])
        tipx = cx + scale * math.sin(theta)
        tipy = cy - scale * math.cos(theta)
        canvas.line((cx, cy), (tipx, tipy), (204, 77, 77), 0.2 * scale)
        canvas.circle((tipx, tipy), 0.1 * scale, (204, 77, 77))
        return render_state, canvas.rgb_array()

    def render_close(self, render_state) -> None:
        pass


from gymnasium_tpu.envs.functional_jax_env import FunctionalJaxEnv  # noqa: E402
from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv  # noqa: E402


class PendulumJaxEnv(FunctionalJaxEnv):
    """Stateful JAX Pendulum (reference phys2d/pendulum.py:228-252)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 30, "jax": True}

    def __init__(self, render_mode: str | None = None, **kwargs: Any):
        super().__init__(
            PendulumFunctional(kwargs or None),
            metadata=self.metadata,
            render_mode=render_mode,
        )


class PendulumJaxVectorEnv(JaxVectorEnv):
    """Vectorized JAX Pendulum (reference phys2d/pendulum.py:255-290)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 30, "jax": True}

    def __init__(
        self,
        num_envs: int,
        render_mode: str | None = None,
        max_episode_steps: int = 200,
        **kwargs: Any,
    ):
        super().__init__(
            PendulumFunctional(kwargs or None),
            num_envs=num_envs,
            max_episode_steps=max_episode_steps,
        )
