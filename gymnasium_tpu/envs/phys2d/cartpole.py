"""CartPole as a pure JAX functional env — the primary TPU implementation.

Same Florian cart-pole ODE as the host env (shared module
gymnasium_tpu/envs/dynamics/cartpole.py), so unlike the reference's phys2d
variant (whose ``polemass_length`` bug makes it diverge from the numpy env,
reference phys2d/cartpole.py:33) this functional env reproduces
CartPoleEnv dynamics exactly (up to dtype).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.dynamics.cartpole import CartPoleParams, integrate, is_terminated
from gymnasium_tpu.functional import FuncEnv

__all__ = ["CartPoleFunctional", "CartPoleParams"]


class CartPoleFunctional(FuncEnv):
    """Stateless CartPole: state pytree is the raw ``[x, x', θ, θ']`` array."""

    # Only reset draws randomness; the dynamics are deterministic.
    rng_hooks = frozenset({"initial"})

    def __init__(self, options: dict[str, Any] | None = None):
        super().__init__(options)
        params = self.get_default_params()
        high = np.array(
            [params.x_threshold * 2, np.inf, params.theta_threshold * 2, np.inf],
            dtype=np.float32,
        )
        self.observation_space = spaces.Box(-high, high, dtype=np.float32)
        self.action_space = spaces.Discrete(2)

    def get_default_params(self, **kwargs: Any) -> CartPoleParams:
        return CartPoleParams(**kwargs)

    def initial(self, rng, params: CartPoleParams | None = None):
        params = params or CartPoleParams()
        return jax.random.uniform(
            rng, (4,), minval=-params.reset_bound, maxval=params.reset_bound
        )

    def initial_batched(self, rng, n: int, params: CartPoleParams | None = None):
        params = params or CartPoleParams()
        return jax.random.uniform(
            rng, (n, 4), minval=-params.reset_bound, maxval=params.reset_bound
        )

    def transition(self, state, action, rng, params: CartPoleParams | None = None):
        params = params or CartPoleParams()
        force = jnp.where(action == 1, params.force_mag, -params.force_mag)
        return integrate(jnp, state, force, params, euler=True)

    def observation(self, state, rng, params: CartPoleParams | None = None):
        return state.astype(jnp.float32)

    def reward(self, state, action, next_state, rng, params: CartPoleParams | None = None):
        return jnp.asarray(1.0, dtype=jnp.float32)

    def terminal(self, state, rng, params: CartPoleParams | None = None):
        params = params or CartPoleParams()
        return is_terminated(jnp, state, params)

    # -- host-side rendering ----------------------------------------------

    def render_init(self, screen_width: int = 600, screen_height: int = 400):
        return (screen_width, screen_height)

    def render_image(self, state, render_state, params: CartPoleParams | None = None):
        from gymnasium_tpu.envs.classic_control.cartpole import _render_cartpole

        width, height = render_state
        return render_state, _render_cartpole(np.asarray(state), params or CartPoleParams(), width, height)

    def render_close(self, render_state) -> None:
        pass


from gymnasium_tpu.envs.functional_jax_env import FunctionalJaxEnv  # noqa: E402
from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv  # noqa: E402


class CartPoleJaxEnv(FunctionalJaxEnv):
    """Stateful JAX CartPole (reference phys2d/cartpole.py:255-272)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 50, "jax": True}

    def __init__(self, render_mode: str | None = None, **kwargs: Any):
        super().__init__(
            CartPoleFunctional(kwargs or None),
            metadata=self.metadata,
            render_mode=render_mode,
        )


class CartPoleJaxVectorEnv(JaxVectorEnv):
    """Vectorized JAX CartPole (reference phys2d/cartpole.py:275-311)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 50, "jax": True}

    def __init__(
        self,
        num_envs: int,
        render_mode: str | None = None,
        max_episode_steps: int = 200,
        **kwargs: Any,
    ):
        super().__init__(
            CartPoleFunctional(kwargs or None),
            num_envs=num_envs,
            max_episode_steps=max_episode_steps,
        )
