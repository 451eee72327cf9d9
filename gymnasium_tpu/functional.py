"""Functional (pure) environment API — the compute core of this framework.

Where the reference keeps this experimental (reference
gymnasium/experimental/functional.py:21-131), here it is the center: every
environment family is a :class:`FuncEnv` whose hooks are pure functions of
``(state, action, key, params)``, so the whole MDP composes with ``jax.jit``,
``jax.vmap``, ``jax.lax.scan`` and mesh sharding.

Key TPU-native addition over the reference: :func:`make_autoreset_step` folds
next-step autoreset *and* time-limit truncation into a single pure step
function, eliminating the per-step host sync the reference suffers at
functional_jax_env.py:193 (data-dependent ``if jnp.any(...)``). The returned
step is a plain ``(carry, action) -> (carry, timestep)`` function suitable for
``jax.lax.scan`` rollouts and ``shard_map``/pjit meshes.
"""

from __future__ import annotations

from typing import Any, Callable, Generic, NamedTuple, TypeVar

StateType = TypeVar("StateType")
ObsType = TypeVar("ObsType")
ActType = TypeVar("ActType")
RewardType = TypeVar("RewardType")
TerminalType = TypeVar("TerminalType")
RenderStateType = TypeVar("RenderStateType")
Params = TypeVar("Params")

__all__ = [
    "FuncEnv",
    "EnvCarry",
    "TimeStep",
    "make_autoreset_step",
    "make_initial_carry",
    "vectorize_func_env",
]


class FuncEnv(Generic[StateType, ObsType, ActType, RewardType, TerminalType, RenderStateType, Params]):
    """A stateless environment: an MDP split into pure functions.

    Hooks (all pure, all jittable):

    - ``initial(rng, params) -> state``
    - ``transition(state, action, rng, params) -> next_state``
    - ``observation(state, rng, params) -> obs``
    - ``reward(state, action, next_state, rng, params) -> reward``
    - ``terminal(state, rng, params) -> bool``

    ``params`` is a pytree of static-shape dynamics parameters (defaults from
    :meth:`get_default_params`), which keeps a single compiled step reusable
    across hyperparameter sweeps without retracing.
    """

    observation_space: Any
    action_space: Any

    #: Hooks that actually consume their PRNG key. Subclasses with
    #: deterministic dynamics shrink this (e.g. ``{"initial"}``) so the
    #: compiled batched step skips per-env key splits for the rest — on a
    #: trivial env the threefry work is a real fraction of the step cost.
    rng_hooks: frozenset[str] = frozenset(
        {"initial", "transition", "observation", "reward", "terminal"}
    )

    def __init__(self, options: dict[str, Any] | None = None):
        self.__dict__.update(options or {})

    # -- core hooks --------------------------------------------------------

    def initial(self, rng: Any, params: Params | None = None) -> StateType:
        """Generate an initial state from a PRNG key."""
        raise NotImplementedError

    def transition(self, state: StateType, action: ActType, rng: Any, params: Params | None = None) -> StateType:
        """Advance the dynamics one step."""
        raise NotImplementedError

    def observation(self, state: StateType, rng: Any, params: Params | None = None) -> ObsType:
        """Observation of ``state``."""
        raise NotImplementedError

    def reward(
        self,
        state: StateType,
        action: ActType,
        next_state: StateType,
        rng: Any,
        params: Params | None = None,
    ) -> RewardType:
        """Reward of the ``state -> next_state`` transition."""
        raise NotImplementedError

    def terminal(self, state: StateType, rng: Any, params: Params | None = None) -> TerminalType:
        """Whether ``state`` is terminal."""
        raise NotImplementedError

    # -- info hooks --------------------------------------------------------

    def state_info(self, state: StateType, params: Params | None = None) -> dict[str, Any]:
        """Info dict for an initial state."""
        return {}

    def transition_info(
        self,
        state: StateType,
        action: ActType,
        next_state: StateType,
        params: Params | None = None,
    ) -> dict[str, Any]:
        """Info dict for a transition."""
        return {}

    # -- params ------------------------------------------------------------

    def get_default_params(self, **kwargs: Any) -> Params | None:
        """Default dynamics parameters (a static-shape pytree)."""
        return None

    # -- transformation ----------------------------------------------------

    def transform(self, func: Callable[[Callable], Callable]) -> None:
        """Rebind every hook through ``func`` (e.g. ``jax.jit``, ``jax.vmap``).

        Matches the reference's in-place transform semantics
        (experimental/functional.py:102-110); prefer the non-mutating
        :func:`make_autoreset_step` for new code.
        """
        self.initial = func(self.initial)  # type: ignore[method-assign]
        self.transition = func(self.transition)  # type: ignore[method-assign]
        self.observation = func(self.observation)  # type: ignore[method-assign]
        self.reward = func(self.reward)  # type: ignore[method-assign]
        self.terminal = func(self.terminal)  # type: ignore[method-assign]

    # -- rendering ---------------------------------------------------------

    def render_image(self, state: StateType, render_state: RenderStateType, params: Params | None = None):
        """Render ``state`` into ``(render_state, image)``."""
        raise NotImplementedError

    def render_init(self, **kwargs: Any) -> RenderStateType:
        """Initialise the host-side render state."""
        raise NotImplementedError

    def render_close(self, render_state: RenderStateType) -> None:
        """Close the host-side render state."""
        raise NotImplementedError


def vectorize_func_env(
    func_env: FuncEnv, num_envs: int, sharding: Any = None
) -> FuncEnv:
    """Return a FuncEnv whose hooks run on a leading batch axis of ``num_envs``.

    Each batched hook takes a *single* PRNG key and splits it across the batch
    internally, so :func:`make_autoreset_step` and :func:`make_initial_carry`
    compose unchanged. Params are broadcast (not vmapped); pass stacked params
    and change ``in_axes`` downstream if you need per-env dynamics.

    ``sharding`` (a ``NamedSharding`` over the env-batch axis, or None) is
    forwarded to any ``*_batched`` factory that accepts it, so natively
    batched kernels can wrap themselves in ``shard_map`` over the mesh.
    """
    import inspect

    import jax
    import jax.numpy as jnp

    def call_factory(factory):
        try:
            accepts_sharding = "sharding" in inspect.signature(factory).parameters
        except (TypeError, ValueError):
            accepts_sharding = False
        if accepts_sharding:
            return factory(num_envs, sharding=sharding)
        return factory(num_envs)

    batched = FuncEnv.__new__(type(func_env))
    batched.__dict__.update(func_env.__dict__)

    needs_rng = func_env.rng_hooks

    def split(rng):
        return jax.random.split(rng, num_envs)

    def rng_axis(hook: str):
        # Deterministic hooks broadcast the parent key instead of paying a
        # per-env split; their key argument is unused by construction.
        return 0 if hook in needs_rng else None

    def keys(hook: str, rng):
        return split(rng) if hook in needs_rng else rng

    # An env may provide a natively-batched `initial_batched(rng, n, params)`
    # (single fused RNG draw for the whole batch) — much cheaper than N
    # vmapped splits when resets are folded into every compiled step.
    initial_batched = getattr(func_env, "initial_batched", None)
    # ... and natively-batched FACTORIES `transition_batched(n) ->
    # fn(state, action, rng, params) | None` and `observation_batched(n) ->
    # fn(state, rng, params) | None` (e.g. fused Pallas kernels processing
    # the whole batch as one program). Returning None means "no batched path
    # for this n/backend" and falls back to the vmapped per-env hook.
    transition_batched = getattr(func_env, "transition_batched", None)
    observation_batched = getattr(func_env, "observation_batched", None)

    v_initial = jax.vmap(func_env.initial, in_axes=(rng_axis("initial"), None))
    v_transition = jax.vmap(func_env.transition, in_axes=(0, 0, rng_axis("transition"), None))
    v_observation = jax.vmap(func_env.observation, in_axes=(0, rng_axis("observation"), None))
    v_reward = jax.vmap(func_env.reward, in_axes=(0, 0, 0, rng_axis("reward"), None))
    v_terminal = jax.vmap(func_env.terminal, in_axes=(0, rng_axis("terminal"), None))

    if initial_batched is not None:
        batched.initial = lambda rng, params=None: initial_batched(rng, num_envs, params)
    elif "initial" in needs_rng:
        batched.initial = lambda rng, params=None: v_initial(keys("initial", rng), params)
    else:
        # Deterministic initial state: compute once, broadcast to the batch.
        def broadcast_initial(rng, params=None):
            state = func_env.initial(rng, params)
            return jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (num_envs,) + jnp.shape(x)), state
            )

        batched.initial = broadcast_initial
    def transition(state, action, rng, params=None):
        if transition_batched is not None:
            batched_fn = call_factory(transition_batched)
            if batched_fn is not None:
                return batched_fn(state, action, rng, params)
        return v_transition(state, action, keys("transition", rng), params)

    batched.transition = transition

    def observation(state, rng, params=None):
        if observation_batched is not None:
            batched_fn = call_factory(observation_batched)
            if batched_fn is not None:
                return batched_fn(state, rng, params)
        return v_observation(state, keys("observation", rng), params)

    batched.observation = observation
    batched.reward = lambda state, action, next_state, rng, params=None: v_reward(
        state, action, next_state, keys("reward", rng), params
    )
    batched.terminal = lambda state, rng, params=None: v_terminal(
        state, keys("terminal", rng), params
    )
    batched.num_envs = num_envs
    return batched


class EnvCarry(NamedTuple):
    """Device-resident carried state of an auto-resetting environment batch.

    This pytree *is* the checkpoint: saving/restoring it (e.g. with orbax)
    resumes the exact rollout (SURVEY.md §5.4).
    """

    state: Any
    rng: Any
    steps: Any
    prev_done: Any


class TimeStep(NamedTuple):
    """Output of one auto-resetting step (all leaves batched when vmapped)."""

    obs: Any
    reward: Any
    terminated: Any
    truncated: Any
    info: dict[str, Any]


def make_autoreset_step(
    func_env: FuncEnv,
    params: Any = None,
    time_limit: int | None = None,
    autoreset: bool = True,
) -> Callable[[EnvCarry, Any], tuple[EnvCarry, TimeStep]]:
    """Build a pure, jittable step with next-step autoreset folded in.

    The returned ``step(carry, action)`` never branches on data: resets are
    computed for the whole batch every step and selected with ``jnp.where``
    (the price of lockstep on a SIMD machine — SURVEY.md §7 hard part 4).
    Episode boundaries follow the reference's NEXT_STEP autoreset semantics
    (reference vector/vector_env.py:56-61): the step *after* a done returns
    the reset observation with reward 0 and both flags False, ignoring the
    submitted action.

    Works both per-env (then wrap with ``jax.vmap``) and on already-batched
    hooks. ``time_limit=None`` disables truncation.
    """
    import jax
    import jax.numpy as jnp

    def step(carry: EnvCarry, action: Any) -> tuple[EnvCarry, TimeStep]:
        rng, k_reset, k_trans, k_obs, k_reward, k_term = jax.random.split(carry.rng, 6)

        next_state = func_env.transition(carry.state, action, k_trans, params)
        if autoreset:
            reset_state = func_env.initial(k_reset, params)
            prev_done = carry.prev_done
            state = jax.tree_util.tree_map(
                lambda r, n: jnp.where(
                    prev_done.reshape(prev_done.shape + (1,) * (n.ndim - prev_done.ndim)), r, n
                ),
                reset_state,
                next_state,
            )
            # the reset step performs no transition: new episode starts at 0
            steps = jnp.where(prev_done, 0, carry.steps + 1)
        else:
            state = next_state
            steps = carry.steps + 1
            prev_done = jnp.zeros_like(carry.prev_done)

        obs = func_env.observation(state, k_obs, params)
        raw_reward = func_env.reward(carry.state, action, state, k_reward, params)
        raw_terminated = func_env.terminal(state, k_term, params)

        if autoreset:
            reward = jnp.where(prev_done, jnp.zeros_like(raw_reward), raw_reward)
            terminated = jnp.where(prev_done, False, raw_terminated)
        else:
            reward = raw_reward
            terminated = raw_terminated

        if time_limit is not None:
            truncated = jnp.logical_and(jnp.logical_not(terminated), steps >= time_limit)
            if autoreset:
                truncated = jnp.where(prev_done, False, truncated)
        else:
            truncated = jnp.zeros_like(terminated)

        done = jnp.logical_or(terminated, truncated)
        new_carry = EnvCarry(state=state, rng=rng, steps=steps, prev_done=done)
        return new_carry, TimeStep(obs, reward, terminated, truncated, {})

    return step


def make_initial_carry(func_env: FuncEnv, rng: Any, params: Any = None) -> tuple[EnvCarry, Any]:
    """Initial ``(carry, obs)``. Works per-env or with vmapped hooks."""
    import jax
    import jax.numpy as jnp

    rng, k_init, k_obs = jax.random.split(rng, 3)
    state = func_env.initial(k_init, params)
    obs = func_env.observation(state, k_obs, params)
    term_proto = func_env.terminal(state, k_obs, params)
    steps = jnp.zeros(jnp.shape(term_proto), dtype=jnp.int32)
    prev_done = jnp.zeros(jnp.shape(term_proto), dtype=bool)
    carry = EnvCarry(state=state, rng=rng, steps=steps, prev_done=prev_done)
    return carry, obs
