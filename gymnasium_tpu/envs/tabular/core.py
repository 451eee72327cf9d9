"""Generic device-resident tabular MDP as a FuncEnv.

One implementation serves every dense-model toy-text env: stepping a batch
is three gathers plus a categorical draw, fully fused under jit/vmap —
exactly the "dense transition tensors" design from SURVEY.md §7 stage 5.

State is a small dict pytree ``{"s", "r", "t"}`` carrying the index plus the
reward/termination produced by the transition *into* it, so the reward and
terminal hooks are pure gathers with no recomputation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.toy_text.tabular_core import TabularModel
from gymnasium_tpu.functional import FuncEnv

__all__ = ["TabularFuncEnv"]


class TabularFuncEnv(FuncEnv):
    """Stateless tabular MDP over dense ``[S, A, K]`` transition tensors."""

    rng_hooks = frozenset({"initial", "transition"})

    def __init__(self, model: TabularModel, options: dict[str, Any] | None = None):
        super().__init__(options)
        self.model = model
        self._probs = jnp.asarray(model.probs, jnp.float32)
        self._logits = jnp.log(jnp.asarray(model.probs, jnp.float32) + 1e-30)
        self._next_state = jnp.asarray(model.next_state, jnp.int32)
        self._reward = jnp.asarray(model.reward, jnp.float32)
        self._terminated = jnp.asarray(model.terminated)
        self._initial_logits = jnp.log(jnp.asarray(model.initial_probs, jnp.float32) + 1e-30)
        self._deterministic = bool(np.all(np.max(model.probs, axis=-1) >= 1.0))

        self.observation_space = spaces.Discrete(model.num_states)
        self.action_space = spaces.Discrete(model.num_actions)

    def initial(self, rng, params: Any = None):
        s = jax.random.categorical(rng, self._initial_logits)
        return {
            "s": s.astype(jnp.int32),
            "r": jnp.zeros((), jnp.float32),
            "t": jnp.zeros((), bool),
        }

    def transition(self, state, action, rng, params: Any = None):
        s = state["s"]
        a = jnp.asarray(action, jnp.int32)
        if self._deterministic:
            k = jnp.zeros((), jnp.int32)
        else:
            k = jax.random.categorical(rng, self._logits[s, a])
        return {
            "s": self._next_state[s, a, k],
            "r": self._reward[s, a, k],
            "t": self._terminated[s, a, k],
        }

    def observation(self, state, rng, params: Any = None):
        return state["s"]

    def reward(self, state, action, next_state, rng, params: Any = None):
        return next_state["r"]

    def terminal(self, state, rng, params: Any = None):
        return state["t"]
