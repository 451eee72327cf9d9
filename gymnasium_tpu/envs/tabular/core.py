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
        self._initial_logits = jnp.log(jnp.asarray(model.initial_probs, jnp.float32) + 1e-30)
        self._deterministic = bool(np.all(np.max(model.probs, axis=-1) >= 1.0))

        # Tables flattened over (s, a) so the per-env lookup is a one-hot
        # contraction on the MXU: dynamic gathers lower to serial
        # dynamic-slices on TPU (see docs/BENCHMARKS.md). int targets ride
        # through f32 exactly (state counts << 2^24).
        s_count, a_count, k_count = model.next_state.shape
        self._sa = s_count * a_count
        self._k = k_count
        self._logits_flat = jnp.log(
            jnp.asarray(model.probs, jnp.float32).reshape(self._sa, k_count) + 1e-30
        )
        self._ns_flat = jnp.asarray(model.next_state, jnp.float32).reshape(
            self._sa, k_count
        )
        self._rew_flat = jnp.asarray(model.reward, jnp.float32).reshape(
            self._sa, k_count
        )
        self._term_flat = jnp.asarray(model.terminated, jnp.float32).reshape(
            self._sa, k_count
        )

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
        sel = jax.nn.one_hot(
            s * self.model.num_actions + a, self._sa, dtype=jnp.float32
        )
        rows_ns = sel @ self._ns_flat  # (K,) candidate next states
        rows_r = sel @ self._rew_flat
        rows_t = sel @ self._term_flat
        if self._deterministic:
            kh = jnp.zeros((self._k,), jnp.float32).at[0].set(1.0)
        else:
            k = jax.random.categorical(rng, sel @ self._logits_flat)
            kh = jax.nn.one_hot(k, self._k, dtype=jnp.float32)
        return {
            "s": jnp.sum(rows_ns * kh).astype(jnp.int32),
            "r": jnp.sum(rows_r * kh),
            "t": jnp.sum(rows_t * kh) > 0.5,
        }

    def observation(self, state, rng, params: Any = None):
        return state["s"]

    def reward(self, state, action, next_state, rng, params: Any = None):
        return next_state["r"]

    def terminal(self, state, rng, params: Any = None):
        return state["t"]
