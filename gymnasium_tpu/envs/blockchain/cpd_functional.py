"""Blockchain CPD game as a pure JAX functional env.

Pure-arithmetic dynamics (SURVEY.md §2.9: "trivially portable to a JAX
FuncEnv"); all miners' utilities/efficiencies are computed as whole-array
ops, so thousands of games step in lockstep on device.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.functional import FuncEnv

__all__ = ["BlockchainCPDFunctional", "CPDParams"]


class CPDParams(NamedTuple):
    """CPD game constants (pytree of scalars + the alpha vector)."""

    base_reward: Any = 10.0
    beta: Any = 1.5
    lambda_: Any = 2.0
    kappa: Any = 0.3
    eta_min: Any = 0.1
    eta_recovery: Any = 0.05
    alpha: Any = None  # [num_miners] hash-power shares


def _simplex_normalize(action):
    action = jnp.maximum(action, 0.0)
    total = jnp.sum(action, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(action).at[..., 0].set(1.0)
    return jnp.where(total < 1e-8, fallback, action / jnp.where(total < 1e-8, 1.0, total))


def _mean_opponent(values):
    n = values.shape[-1]
    return (jnp.sum(values, axis=-1, keepdims=True) - values) / (n - 1)


class BlockchainCPDFunctional(FuncEnv):
    """Stateless CPD game: one controlled miner vs scripted opponents.

    State dict: ``eta`` [M], ``prev_opp_eta`` scalar, ``cum`` [M],
    ``last_reward`` scalar, ``last_agent_action`` [3], ``round`` scalar.
    """

    rng_hooks = frozenset({"transition"})

    def __init__(self, options: dict[str, Any] | None = None):
        options = dict(options or {})
        self.num_miners = int(options.pop("num_miners", 2))
        self.max_rounds = int(options.pop("max_rounds", 100))
        self.agent_id = int(options.pop("agent_id", 0))
        self.opponent_policy = options.pop("opponent_policy", "honest")
        assert self.opponent_policy in ("honest", "random", "tit_for_tat")
        self._base_kwargs = options
        super().__init__(None)

        self.action_space = spaces.Box(low=0.0, high=1.0, shape=(3,), dtype=np.float64)
        self.observation_space = spaces.Box(
            low=np.array([-np.inf, 0.0, 0.0, 0.0, -np.inf, -np.inf]),
            high=np.array([np.inf, 1.0, 1.0, 1.0, np.inf, np.inf]),
            shape=(6,),
            dtype=np.float64,
        )

    def get_default_params(self, **kwargs: Any) -> CPDParams:
        merged = {**self._base_kwargs, **kwargs}
        alpha = merged.pop("alpha", None)
        if alpha is None:
            alpha = jnp.ones(self.num_miners) / self.num_miners
        else:
            alpha = jnp.asarray(alpha, jnp.float32)
            alpha = alpha / alpha.sum()
        return CPDParams(alpha=alpha, **merged)

    def initial(self, rng, params: CPDParams | None = None):
        m = self.num_miners
        return {
            "eta": jnp.ones(m),
            "prev_opp_eta": jnp.ones(()),
            "cum": jnp.zeros(m),
            "last_reward": jnp.zeros(()),
            "last_agent_action": jnp.asarray([1.0, 0.0, 0.0]),
            "round": jnp.zeros((), jnp.int32),
        }

    def _opponent_actions(self, state, rng):
        m = self.num_miners
        honest = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (m, 1))
        if self.opponent_policy == "honest":
            return honest
        if self.opponent_policy == "random":
            return jax.random.dirichlet(rng, jnp.ones(3), shape=(m,))
        # tit_for_tat mirrors the agent's previous action
        return jnp.tile(state["last_agent_action"], (m, 1))

    def transition(self, state, action, rng, params: CPDParams | None = None):
        params = params or self.get_default_params()
        agent_action = _simplex_normalize(jnp.asarray(action, jnp.float32))
        opponents = self._opponent_actions(state, rng)
        all_actions = opponents.at[self.agent_id].set(agent_action)

        c = all_actions[:, 0]
        p = all_actions[:, 1]
        d = all_actions[:, 2]
        eta = state["eta"]
        mean_eta = _mean_opponent(eta)
        rewards = (
            params.base_reward * params.alpha * c
            + params.base_reward * p * mean_eta**params.beta
            - params.lambda_ * d**2
        )

        total_destruction = jnp.sum(d) - d
        new_eta = jnp.clip(
            eta - params.kappa * total_destruction + params.eta_recovery,
            params.eta_min,
            1.0,
        )

        opp_mask = jnp.arange(self.num_miners) != self.agent_id
        prev_opp_eta = jnp.sum(jnp.where(opp_mask, eta, 0.0)) / (self.num_miners - 1)

        return {
            "eta": new_eta,
            "prev_opp_eta": prev_opp_eta,
            "cum": state["cum"] + rewards,
            "last_reward": rewards[self.agent_id],
            "last_agent_action": agent_action,
            "round": state["round"] + 1,
        }

    def observation(self, state, rng, params: CPDParams | None = None):
        params = params or self.get_default_params()
        opp_mask = jnp.arange(self.num_miners) != self.agent_id
        mean_opp_eta = jnp.sum(jnp.where(opp_mask, state["eta"], 0.0)) / (self.num_miners - 1)
        return jnp.stack(
            (
                state["cum"][self.agent_id],
                mean_opp_eta,
                params.alpha[self.agent_id],
                state["round"].astype(jnp.float32) / max(self.max_rounds, 1),
                state["last_reward"],
                mean_opp_eta - state["prev_opp_eta"],
            ),
            axis=-1,
        )

    def reward(self, state, action, next_state, rng, params: CPDParams | None = None):
        return next_state["last_reward"]

    def terminal(self, state, rng, params: CPDParams | None = None):
        return state["round"] >= self.max_rounds
