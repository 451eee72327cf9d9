"""Blackjack as a device-resident FuncEnv.

The infinite deck makes the sufficient state tiny: raw sums + ace flags
instead of the reference tabular env's 21-slot card arrays
(reference tabular/blackjack.py:28). The dealer's stick play-out runs as a
bounded ``lax.while_loop`` inside the transition — branchless, vmappable.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.functional import FuncEnv

__all__ = ["BlackjackFunctional"]

_DECK = jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10, 10, 10], jnp.int32)


def _draw(rng):
    return _DECK[jax.random.randint(rng, (), 0, 13)]


def _best(raw_sum, has_ace):
    usable = has_ace & (raw_sum + 10 <= 21)
    return jnp.where(usable, raw_sum + 10, raw_sum), usable


def _score(raw_sum, has_ace):
    best, _ = _best(raw_sum, has_ace)
    return jnp.where(best > 21, 0, best)


class BlackjackFunctional(FuncEnv):
    """Stateless blackjack.

    State dict: ``p_sum``/``p_ace`` (player raw sum, holds-an-ace),
    ``d_sum``/``d_ace`` (dealer), ``d_show`` (dealer's face-up card),
    ``p_nat``/``d_nat`` (two-card 21 at deal), ``done``, ``r``.
    """

    def __init__(self, options: dict[str, Any] | None = None):
        options = dict(options or {})
        self.natural = bool(options.pop("natural", False))
        self.sab = bool(options.pop("sab", False))
        super().__init__(options)
        # Device representation: a fixed-shape int vector (the reference's
        # tabular env likewise uses Box(int) instead of the host Tuple —
        # SURVEY.md §2.5).
        self.observation_space = spaces.Box(
            low=np.array([2, 1, 0]), high=np.array([31, 10, 1]), dtype=np.int32
        )
        self.action_space = spaces.Discrete(2)

    def initial(self, rng, params: Any = None):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d1, d2 = _draw(k1), _draw(k2)
        p1, p2 = _draw(k3), _draw(k4)
        p_sum = p1 + p2
        p_ace = (p1 == 1) | (p2 == 1)
        d_sum = d1 + d2
        d_ace = (d1 == 1) | (d2 == 1)
        p_best, _ = _best(p_sum, p_ace)
        d_best, _ = _best(d_sum, d_ace)
        return {
            "p_sum": p_sum,
            "p_ace": p_ace,
            "d_sum": d_sum,
            "d_ace": d_ace,
            "d_show": d1,
            "p_nat": p_best == 21,
            "d_nat": d_best == 21,
            "done": jnp.zeros((), bool),
            "r": jnp.zeros((), jnp.float32),
        }

    def transition(self, state, action, rng, params: Any = None):
        k_hit, k_dealer = jax.random.split(rng)

        # --- hit branch ---------------------------------------------------
        card = _draw(k_hit)
        hit_sum = state["p_sum"] + card
        hit_ace = state["p_ace"] | (card == 1)
        hit_best, _ = _best(hit_sum, hit_ace)
        hit_bust = hit_best > 21
        hit_state = {
            **state,
            "p_sum": hit_sum,
            "p_ace": hit_ace,
            "done": hit_bust,
            "r": jnp.where(hit_bust, -1.0, 0.0).astype(jnp.float32),
        }

        # --- stick branch: dealer draws to 17 (bounded loop) --------------
        def cond(carry):
            d_sum, d_ace, key = carry
            best, _ = _best(d_sum, d_ace)
            return best < 17

        def body(carry):
            d_sum, d_ace, key = carry
            key, k = jax.random.split(key)
            card = _draw(k)
            return d_sum + card, d_ace | (card == 1), key

        d_sum, d_ace, _ = jax.lax.while_loop(
            cond, body, (state["d_sum"], state["d_ace"], k_dealer)
        )
        p_score = _score(state["p_sum"], state["p_ace"])
        d_score = _score(d_sum, d_ace)
        payout = jnp.sign(p_score - d_score).astype(jnp.float32)
        if self.sab:
            payout = jnp.where(state["p_nat"] & ~state["d_nat"], 1.0, payout)
        elif self.natural:
            payout = jnp.where(state["p_nat"] & (payout == 1.0), 1.5, payout)
        stick_state = {
            **state,
            "d_sum": d_sum,
            "d_ace": d_ace,
            "done": jnp.ones((), bool),
            "r": payout,
        }

        hit = jnp.asarray(action, jnp.int32) == 1
        return jax.tree_util.tree_map(
            lambda h, s: jnp.where(hit, h, s), hit_state, stick_state
        )

    def observation(self, state, rng, params: Any = None):
        best, usable = _best(state["p_sum"], state["p_ace"])
        return jnp.stack(
            (best, state["d_show"], usable.astype(jnp.int32)), axis=-1
        ).astype(jnp.int32)

    def reward(self, state, action, next_state, rng, params: Any = None):
        return next_state["r"]

    def terminal(self, state, rng, params: Any = None):
        return state["done"]

    # -- host-side rgb rendering (reference tabular/blackjack.py draws card
    # sprites via pygame; this raster schematic shows the same state) -------

    def render_init(self, width: int = 240, height: int = 160, **kwargs: Any):
        return {"width": width, "height": height}

    def render_image(self, state, render_state, params: Any = None):
        import numpy as np

        from gymnasium_tpu.utils.raster import Canvas

        W, H = render_state["width"], render_state["height"]
        canvas = Canvas(W, H, (20, 90, 50))  # table felt
        best, usable = _best(state["p_sum"], state["p_ace"])
        player = int(np.asarray(best))
        dealer = int(np.asarray(state["d_show"]))
        ace = bool(np.asarray(usable))
        done = bool(np.asarray(state["done"]))

        def bar(x, value, vmax, color):
            h = max(int((H - 40) * min(value, vmax) / vmax), 2)
            canvas.polygon(
                [(x, H - 20 - h), (x + 50, H - 20 - h), (x + 50, H - 20), (x, H - 20)],
                color,
            )

        bar(30, player, 31, (230, 230, 240))  # player hand value
        bar(110, dealer, 11, (240, 200, 90))  # dealer showing card
        if ace:
            canvas.circle((190, 40), 14, (220, 80, 80))  # usable-ace marker
        if done:
            canvas.hline(H - 10, (250, 250, 250), 4)
        return render_state, canvas.rgb_array()

    def render_close(self, render_state) -> None:
        return None


from gymnasium_tpu.envs.functional_jax_env import FunctionalJaxEnv  # noqa: E402


class BlackJackJaxEnv(FunctionalJaxEnv):
    """Stateful JAX Blackjack (reference tabular/blackjack.py:507-529)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 50, "jax": True}

    def __init__(self, render_mode: str | None = None, **kwargs: Any):
        super().__init__(
            BlackjackFunctional(kwargs or None),
            metadata=self.metadata,
            render_mode=render_mode,
        )
