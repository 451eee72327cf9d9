"""Adapters exposing FuncEnvs through the stateful Env / VectorEnv APIs.

Parity with reference gymnasium/envs/functional_jax_env.py:21-231.
``FunctionalJaxVectorEnv`` here is the fully-jitted
:class:`~gymnasium_tpu.vector.JaxVectorEnv` (autoreset folded into the
compiled step — no per-step host sync, unlike the reference's
``if jnp.any(...)`` at functional_jax_env.py:193).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu.functional import FuncEnv
from gymnasium_tpu.utils import seeding
from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

__all__ = ["FunctionalJaxEnv", "FunctionalJaxVectorEnv"]


class FunctionalJaxEnv(gym.Env):
    """Stateful single-env shell over a :class:`FuncEnv`, carrying state + key."""

    state: Any

    def __init__(
        self,
        func_env: FuncEnv,
        params: Any = None,
        metadata: dict[str, Any] | None = None,
        render_mode: str | None = None,
        spec: Any = None,
    ):
        if metadata is None:
            metadata = {"render_modes": [], "render_fps": 50, "jax": True}
        self.func_env = func_env
        self.params = params if params is not None else func_env.get_default_params()
        self.metadata = metadata
        self.render_mode = render_mode
        self.spec = spec

        self.observation_space = func_env.observation_space
        self.action_space = func_env.action_space

        self._compile_hooks()

        self.state = None
        self.rng = jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**63))

        if self.render_mode == "rgb_array":
            self.render_state = self.func_env.render_init()
        else:
            self.render_state = None

    def reset(self, *, seed: int | None = None, options: dict[str, Any] | None = None):
        super().reset(seed=seed)
        if seed is not None:
            self.rng = jax.random.PRNGKey(seed)
        rng, k_init, k_obs = jax.random.split(self.rng, 3)
        self.rng = rng
        self.state = self._initial(k_init, self.params)
        obs = self._observation(self.state, k_obs, self.params)
        info = self.func_env.state_info(self.state, self.params)
        return self._obs_to_host(obs), info

    def step(self, action):
        assert self.state is not None, "Call reset before using step method."
        rng, k_trans, k_obs, k_rew, k_term = jax.random.split(self.rng, 5)
        self.rng = rng
        next_state = self._transition(self.state, action, k_trans, self.params)
        observation = self._observation(next_state, k_obs, self.params)
        reward = self._reward(self.state, action, next_state, k_rew, self.params)
        terminated = self._terminal(next_state, k_term, self.params)
        info = self.func_env.transition_info(self.state, action, next_state, self.params)
        self.state = next_state
        return self._obs_to_host(observation), float(reward), bool(terminated), False, info

    def _obs_to_host(self, obs):
        """Match the single-env host contract for scalar spaces: a Discrete
        observation is a python-int-like ``np.int64`` (as the toy-text hosts
        return), not a 0-d device array (the reference sidesteps this by
        giving its tabular envs ``Box (1,)`` spaces + ``disable_env_checker``,
        envs/__init__.py:208-211; we keep ``Discrete`` and convert here)."""
        if isinstance(self.observation_space, gym.spaces.Discrete):
            return np.int64(obs)
        return obs

    def render(self):
        if self.render_mode == "rgb_array":
            self.render_state, image = self.func_env.render_image(
                self.state, self.render_state, self.params
            )
            return image
        raise NotImplementedError

    def close(self):
        if self.render_state is not None:
            self.func_env.render_close(self.render_state)
            self.render_state = None

    # -- pickling (reference phys2d envs are EzPickle, cartpole.py:255) ----

    def _compile_hooks(self):
        self._transition = jax.jit(self.func_env.transition, static_argnums=())
        self._initial = jax.jit(self.func_env.initial)
        self._observation = jax.jit(self.func_env.observation)
        self._reward = jax.jit(self.func_env.reward)
        self._terminal = jax.jit(self.func_env.terminal)

    def __getstate__(self):
        d = dict(self.__dict__)
        # jitted executables and host render resources are rebuilt on load
        for key in ("_transition", "_initial", "_observation", "_reward", "_terminal"):
            d.pop(key, None)
        d["render_state"] = None
        d["rng"] = np.asarray(self.rng)
        if self.state is not None:
            d["state"] = jax.tree_util.tree_map(np.asarray, self.state)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self.rng = jnp.asarray(d["rng"])
        self._compile_hooks()
        if self.render_mode == "rgb_array":
            self.render_state = self.func_env.render_init()


class FunctionalJaxVectorEnv(JaxVectorEnv):
    """Vectorized FuncEnv adapter — the fully-compiled device path."""


# --- registration factories ----------------------------------------------


def _jax_env_factory(func_env_cls):
    def factory(render_mode: str | None = None, **kwargs: Any):
        env = func_env_cls(kwargs or None)
        return FunctionalJaxEnv(
            env,
            metadata={"render_modes": ["rgb_array"], "render_fps": 50, "jax": True},
            render_mode=render_mode,
        )

    return factory


def _jax_vector_env_factory(func_env_cls):
    def factory(num_envs: int, max_episode_steps: int | None = None, **kwargs: Any):
        env = func_env_cls(kwargs or None)
        return JaxVectorEnv(env, num_envs=num_envs, max_episode_steps=max_episode_steps)

    return factory


def make_cartpole_jax_env(render_mode: str | None = None, **kwargs: Any):
    """Entry point for ``phys2d/CartPole``."""
    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional

    return _jax_env_factory(CartPoleFunctional)(render_mode=render_mode, **kwargs)


def make_cartpole_jax_vector_env(num_envs: int, max_episode_steps: int | None = None, **kwargs: Any):
    """Vector entry point for ``phys2d/CartPole``."""
    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional

    return _jax_vector_env_factory(CartPoleFunctional)(
        num_envs=num_envs, max_episode_steps=max_episode_steps, **kwargs
    )


def make_pendulum_jax_env(render_mode: str | None = None, **kwargs: Any):
    """Entry point for ``phys2d/Pendulum``."""
    from gymnasium_tpu.envs.phys2d.pendulum import PendulumFunctional

    return _jax_env_factory(PendulumFunctional)(render_mode=render_mode, **kwargs)


def make_pendulum_jax_vector_env(num_envs: int, max_episode_steps: int | None = None, **kwargs: Any):
    """Vector entry point for ``phys2d/Pendulum``."""
    from gymnasium_tpu.envs.phys2d.pendulum import PendulumFunctional

    return _jax_vector_env_factory(PendulumFunctional)(
        num_envs=num_envs, max_episode_steps=max_episode_steps, **kwargs
    )


def make_blackjack_jax_env(render_mode: str | None = None, **kwargs: Any):
    """Entry point for ``tabular/Blackjack``."""
    from gymnasium_tpu.envs.tabular.blackjack import BlackjackFunctional

    return _jax_env_factory(BlackjackFunctional)(render_mode=render_mode, **kwargs)


def make_cliffwalking_jax_env(render_mode: str | None = None, **kwargs: Any):
    """Entry point for ``tabular/CliffWalking``."""
    from gymnasium_tpu.envs.tabular.cliffwalking import CliffWalkingFunctional

    return _jax_env_factory(CliffWalkingFunctional)(render_mode=render_mode, **kwargs)
