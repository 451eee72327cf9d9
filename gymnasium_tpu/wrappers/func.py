"""Device-composable functional wrappers.

The host wrapper catalog (``gymnasium_tpu.wrappers``) mirrors the reference's
stateful Python classes (reference gymnasium/wrappers/stateful_observation.py:458
NormalizeObservation, stateful_reward.py:19 NormalizeReward,
stateful_observation.py:298 FrameStackObservation, wrappers/utils.py:30-60
RunningMeanStd) — one Python call per step, state in attributes. None of that
survives ``jax.jit``. This module is the TPU-native counterpart: every wrapper
is a pure, state-carrying transform

    ``update(wrapper_state, timestep, reset_mask, env_carry)
        -> (wrapper_state, timestep)``

whose state is an ordinary pytree threaded through the compiled step alongside
:class:`~gymnasium_tpu.functional.EnvCarry`. :func:`wrap_autoreset_step` folds
a whole wrapper stack into the single jitted ``(carry, action) -> (carry,
timestep)`` function produced by
:func:`~gymnasium_tpu.functional.make_autoreset_step`, so observation/reward
normalization, frame stacking, and episode statistics all run *inside* one XLA
program — in a ``lax.scan`` rollout, under ``shard_map`` on a mesh, or inside a
PPO train step — with zero host round-trips.

Semantics match the batched host twins (``gymnasium_tpu.wrappers.vector``)
step-for-step under NEXT_STEP autoreset; ``tests/wrappers/test_func_wrappers.py``
drives both on identical trajectories.

Reset semantics: with NEXT_STEP autoreset the step *after* a done is the reset
step (reward 0, flags False, obs = reset obs). Each wrapper receives that
step's ``reset_mask`` (the pre-step ``prev_done``) and applies the same
per-lane reinitialization its host twin performs in ``reset()``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from gymnasium_tpu.functional import EnvCarry, TimeStep

__all__ = [
    "FuncWrapper",
    "WrappedEnvCarry",
    "wrap_autoreset_step",
    "wrap_initial",
    "RmsState",
    "rms_init",
    "rms_update",
    "NormalizeObservation",
    "NormalizeReward",
    "FrameStackObservation",
    "TimeAwareObservation",
    "DelayObservation",
    "StickyAction",
    "TransformObservation",
    "TransformAction",
    "TransformReward",
    "ClipAction",
    "ClipReward",
    "RescaleAction",
    "RescaleObservation",
    "EpisodeStatistics",
    "episode_stats_to_infos",
]


class FuncWrapper:
    """A pure environment transform with explicit pytree state.

    Hooks (all pure; defaults are identity / stateless):

    - ``init(rng, obs, carry, params) -> (wrapper_state, obs)`` — build the
      state from the batch's initial observation and transform that
      observation (the ``reset()`` path of the host twin).
    - ``transform_action(wrapper_state, action) -> (wrapper_state, action)``
      — pre-step action transform (outermost wrapper first).
    - ``update(wrapper_state, timestep, reset_mask, env_carry)
      -> (wrapper_state, timestep)`` — post-step transform of the
      :class:`TimeStep` (innermost wrapper first). ``reset_mask`` is True on
      lanes for which this step was an autoreset step; ``env_carry`` is the
      post-step :class:`EnvCarry` (exposes ``steps`` and ``prev_done``).
    """

    def init(self, rng: Any, obs: Any, carry: EnvCarry, params: Any = None):
        return None, obs

    def transform_action(self, wstate: Any, action: Any):
        return wstate, action

    def update(self, wstate: Any, ts: TimeStep, reset_mask: Any, carry: EnvCarry):
        return wstate, ts

    def observation_space(self, space: Any) -> Any:
        """The (single-env) observation space after this wrapper."""
        return space

    def action_space(self, space: Any) -> Any:
        """The (single-env) action space this wrapper accepts."""
        return space

    def state_per_env(self, wstate: Any, num_envs: int) -> Any:
        """Boolean pytree marking which state leaves carry the env-batch
        axis (used by ``JaxVectorEnv`` to shard per-env leaves over the mesh
        and replicate shared ones).

        The default infers from the leading dimension; wrappers whose shared
        state could coincidentally have a leading dim of ``num_envs`` (e.g.
        RMS statistics over the obs axis) must override this.
        """
        return jax.tree_util.tree_map(
            lambda leaf: jnp.ndim(leaf) > 0 and jnp.shape(leaf)[0] == num_envs,
            wstate,
        )


class WrappedEnvCarry(NamedTuple):
    """:class:`EnvCarry` plus one state pytree per wrapper (innermost first).

    Like :class:`EnvCarry`, this pytree is the checkpoint: normalization
    statistics and frame buffers resume exactly.
    """

    env: EnvCarry
    wrappers: tuple[Any, ...]


def wrap_initial(
    wrappers: Sequence[FuncWrapper],
    rng: Any,
    carry: EnvCarry,
    obs: Any,
    params: Any = None,
) -> tuple[WrappedEnvCarry, Any]:
    """Initialize every wrapper state from the batch's reset observation."""
    states = []
    for w in wrappers:
        rng, key = jax.random.split(rng)
        wstate, obs = w.init(key, obs, carry, params)
        states.append(wstate)
    return WrappedEnvCarry(env=carry, wrappers=tuple(states)), obs


def wrap_autoreset_step(
    step_fn: Callable[[EnvCarry, Any], tuple[EnvCarry, TimeStep]],
    wrappers: Sequence[FuncWrapper],
) -> Callable[[WrappedEnvCarry, Any], tuple[WrappedEnvCarry, TimeStep]]:
    """Fold a wrapper stack into an autoreset step function.

    ``wrappers`` is ordered innermost-first (the reference's wrapper onion
    built bottom-up): actions flow outermost -> innermost, observations and
    rewards innermost -> outermost — exactly the host composition
    ``w_outer(w_inner(env))``.
    """
    wrappers = tuple(wrappers)

    def step(carry: WrappedEnvCarry, action: Any) -> tuple[WrappedEnvCarry, TimeStep]:
        reset_mask = carry.env.prev_done
        states = list(carry.wrappers)
        for i in range(len(wrappers) - 1, -1, -1):
            states[i], action = wrappers[i].transform_action(states[i], action)
        env_carry, ts = step_fn(carry.env, action)
        for i, w in enumerate(wrappers):
            states[i], ts = w.update(states[i], ts, reset_mask, env_carry)
        return WrappedEnvCarry(env=env_carry, wrappers=tuple(states)), ts

    return step


# ---------------------------------------------------------------------------
# Running mean/std as a pure pytree (functional twin of wrappers/utils.py:30)
# ---------------------------------------------------------------------------


class RmsState(NamedTuple):
    """Chan parallel-variance accumulator state (mean, var, count, update?).

    ``update_flag`` is a traced scalar bool so the statistics can be frozen
    (the host twins' ``update_running_mean`` property) without retracing.
    """

    mean: Any
    var: Any
    count: Any
    update_flag: Any


def rms_init(shape: tuple[int, ...] = (), epsilon: float = 1e-4, dtype=jnp.float32) -> RmsState:
    """Fresh statistics; matches host ``RunningMeanStd(epsilon, shape)``."""
    return RmsState(
        mean=jnp.zeros(shape, dtype),
        var=jnp.ones(shape, dtype),
        count=jnp.asarray(epsilon, dtype),
        update_flag=jnp.asarray(True),
    )


def rms_update(rms: RmsState, batch: Any) -> RmsState:
    """Fold a batch (leading axis) into the statistics — Chan et al. merge,
    the same arithmetic as host ``update_mean_var_count_from_moments``
    (reference wrappers/utils.py:47-60). No-op when ``update_flag`` is False.
    """
    batch_mean = jnp.mean(batch, axis=0)
    batch_var = jnp.var(batch, axis=0)
    batch_count = batch.shape[0]

    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m2 = (
        rms.var * rms.count
        + batch_var * batch_count
        + jnp.square(delta) * rms.count * batch_count / tot
    )
    updated = RmsState(new_mean, m2 / tot, tot, rms.update_flag)
    keep = rms.update_flag
    return RmsState(
        mean=jnp.where(keep, updated.mean, rms.mean),
        var=jnp.where(keep, updated.var, rms.var),
        count=jnp.where(keep, updated.count, rms.count),
        update_flag=rms.update_flag,
    )


def _freeze(rms: RmsState, frozen: bool = True) -> RmsState:
    return rms._replace(update_flag=jnp.asarray(not frozen))


# ---------------------------------------------------------------------------
# Stateful wrappers
# ---------------------------------------------------------------------------


class NormalizeObservation(FuncWrapper):
    """Shared running mean/std normalization of the batched observation.

    Functional twin of ``wrappers.vector.NormalizeObservation`` (reference
    wrappers/vector/stateful_observation.py:27): one statistics set for the
    whole batch, updated with the batch every step (including reset steps —
    reset observations are data too, matching the host twin's ``reset``).
    Freeze with ``wstate = NormalizeObservation.freeze(wstate)``.
    """

    def __init__(self, epsilon: float = 1e-8, dtype=jnp.float32):
        self.epsilon = epsilon
        self.dtype = dtype

    @staticmethod
    def freeze(wstate: RmsState, frozen: bool = True) -> RmsState:
        """Stop (or resume) updating the running statistics."""
        return _freeze(wstate, frozen)

    def _normalize(self, rms: RmsState, obs):
        return ((obs - rms.mean) / jnp.sqrt(rms.var + self.epsilon)).astype(self.dtype)

    def init(self, rng, obs, carry, params=None):
        rms = rms_init(jnp.shape(obs)[1:], dtype=self.dtype)
        rms = rms_update(rms, obs)
        return rms, self._normalize(rms, obs)

    def update(self, wstate, ts, reset_mask, carry):
        rms = rms_update(wstate, ts.obs)
        return rms, ts._replace(obs=self._normalize(rms, ts.obs))

    def observation_space(self, space):
        import numpy as np

        from gymnasium_tpu.spaces import Box

        return Box(-np.inf, np.inf, shape=space.shape, dtype=np.dtype(self.dtype).name)

    def state_per_env(self, wstate, num_envs):
        # the RMS statistics are shared by the whole batch — replicate even
        # when the obs feature dim coincidentally equals num_envs
        return jax.tree_util.tree_map(lambda _: False, wstate)


class NormalizeRewardState(NamedTuple):
    rms: RmsState
    accumulated: Any  # (N,) discounted-return accumulator


class NormalizeReward(FuncWrapper):
    """Scale rewards by the running std of the discounted return.

    Functional twin of ``wrappers.vector.NormalizeReward`` (reference
    wrappers/vector/stateful_reward.py:20):
    ``acc = acc * gamma * (1 - terminated) + reward``, statistics updated with
    the accumulator batch, reward divided by ``sqrt(var + eps)``. As in the
    host twin, truncation does NOT zero the accumulator (reference behavior);
    the autoreset step's reward is 0 so reset lanes contribute
    ``acc * gamma`` — also matching the host twin run on an autoreset env.
    """

    def __init__(self, gamma: float = 0.99, epsilon: float = 1e-8):
        self.gamma = gamma
        self.epsilon = epsilon

    @staticmethod
    def freeze(wstate: NormalizeRewardState, frozen: bool = True) -> NormalizeRewardState:
        """Stop (or resume) updating the running return statistics."""
        return wstate._replace(rms=_freeze(wstate.rms, frozen))

    def init(self, rng, obs, carry, params=None):
        n = jnp.shape(carry.prev_done)[0]
        return NormalizeRewardState(rms_init(()), jnp.zeros((n,), jnp.float32)), obs

    def update(self, wstate, ts, reset_mask, carry):
        acc = (
            wstate.accumulated * self.gamma * (1.0 - ts.terminated.astype(jnp.float32))
            + ts.reward
        )
        rms = rms_update(wstate.rms, acc)
        reward = ts.reward / jnp.sqrt(rms.var + self.epsilon)
        return NormalizeRewardState(rms, acc), ts._replace(reward=reward)

    def state_per_env(self, wstate, num_envs):
        # shared return statistics, per-env discounted-return accumulator
        return NormalizeRewardState(
            rms=jax.tree_util.tree_map(lambda _: False, wstate.rms),
            accumulated=True,
        )


class FrameStackObservation(FuncWrapper):
    """Stack the last ``stack_size`` observations along a new axis-1.

    Functional twin of host ``FrameStackObservation`` (reference
    stateful_observation.py:298): output obs shape ``(N, stack, *obs_shape)``,
    oldest frame first. ``padding_type``: ``"reset"`` pads a fresh episode
    with copies of its reset observation, ``"zero"`` with zeros.

    State is the rolling buffer — a fixed-shape ``(N, stack, *obs)`` array
    updated with one ``jnp.roll``-free slice-concat per step (cheap: the
    buffer lives in registers/VMEM inside the fused step).
    """

    def __init__(self, stack_size: int, padding_type: str = "reset"):
        if stack_size < 1:
            raise ValueError(f"stack_size must be >= 1, got {stack_size}")
        if padding_type not in ("reset", "zero"):
            raise ValueError(f"padding_type must be 'reset' or 'zero', got {padding_type!r}")
        self.stack_size = stack_size
        self.padding_type = padding_type

    def _fresh(self, obs):
        # (N, stack, *obs): padding in slots [0, k-1), the new obs last.
        pad = obs if self.padding_type == "reset" else jnp.zeros_like(obs)
        frames = [pad[:, None]] * (self.stack_size - 1) + [obs[:, None]]
        return jnp.concatenate(frames, axis=1)

    def init(self, rng, obs, carry, params=None):
        buf = self._fresh(obs)
        return buf, buf

    def update(self, wstate, ts, reset_mask, carry):
        obs = ts.obs
        rolled = jnp.concatenate([wstate[:, 1:], obs[:, None]], axis=1)
        fresh = self._fresh(obs)
        mask = reset_mask.reshape(reset_mask.shape + (1,) * (rolled.ndim - 1))
        buf = jnp.where(mask, fresh, rolled)
        return buf, ts._replace(obs=buf)

    def observation_space(self, space):
        from gymnasium_tpu.vector.utils import batch_space

        return batch_space(space, self.stack_size)


class TimeAwareObservation(FuncWrapper):
    """Append the in-episode step counter to a flat Box observation.

    Functional twin of host ``TimeAwareObservation`` (reference
    stateful_observation.py:105) with ``flatten=True``: time is 0 at reset and
    increments per step; ``normalize_time=True`` divides by
    ``max_episode_steps``. Stateless — the counter already lives in
    ``EnvCarry.steps``.
    """

    def __init__(self, normalize_time: bool = False, max_episode_steps: int | None = None):
        if normalize_time and max_episode_steps is None:
            raise ValueError("normalize_time=True requires max_episode_steps")
        self.normalize_time = normalize_time
        self.max_episode_steps = max_episode_steps

    def _time_feature(self, steps, dtype):
        t = steps.astype(dtype)
        if self.normalize_time:
            t = t / self.max_episode_steps
        return t[:, None]

    def init(self, rng, obs, carry, params=None):
        return None, jnp.concatenate([obs, self._time_feature(carry.steps, obs.dtype)], axis=-1)

    def update(self, wstate, ts, reset_mask, carry):
        obs = jnp.concatenate(
            [ts.obs, self._time_feature(carry.steps, ts.obs.dtype)], axis=-1
        )
        return wstate, ts._replace(obs=obs)

    def observation_space(self, space):
        import numpy as np

        from gymnasium_tpu.spaces import Box

        high = self.max_episode_steps if self.max_episode_steps is not None else np.inf
        time_high = 1.0 if self.normalize_time else high
        return Box(
            np.concatenate([np.broadcast_to(space.low, space.shape), [0.0]]),
            np.concatenate([np.broadcast_to(space.high, space.shape), [time_high]]),
            dtype=space.dtype.name,
        )


class DelayObservationState(NamedTuple):
    buffer: Any  # (N, delay, *obs) most-recent-last
    count: Any  # (N,) observations seen this episode


class DelayObservation(FuncWrapper):
    """Emit observations ``delay`` steps late, zeros until then.

    Functional twin of host ``DelayObservation`` (reference
    stateful_observation.py:34): each env sees the observation from ``delay``
    steps earlier in ITS episode; the buffer resets with the episode.
    """

    def __init__(self, delay: int):
        if delay < 1:
            raise ValueError(f"delay must be >= 1, got {delay}")
        self.delay = delay

    def _emit(self, buffer, count):
        # the slot holding the observation from `delay` steps ago; zeros
        # until `delay + 1` observations of the episode have been seen
        # (the host twin emits zeros through its first `delay` steps)
        oldest = buffer[:, 0]
        ready = (count > self.delay).reshape((-1,) + (1,) * (oldest.ndim - 1))
        return jnp.where(ready, oldest, jnp.zeros_like(oldest))

    def _fresh(self, obs):
        # (N, delay+1, *obs): the episode's first observation goes last
        return jnp.concatenate(
            [jnp.zeros_like(obs)[:, None]] * self.delay + [obs[:, None]], axis=1
        )

    def init(self, rng, obs, carry, params=None):
        buffer = self._fresh(obs)
        count = jnp.ones(jnp.shape(obs)[0], jnp.int32)
        return DelayObservationState(buffer, count), self._emit(buffer, count)

    def update(self, wstate, ts, reset_mask, carry):
        obs = ts.obs
        pushed = jnp.concatenate([wstate.buffer[:, 1:], obs[:, None]], axis=1)
        mask = reset_mask.reshape(reset_mask.shape + (1,) * (pushed.ndim - 1))
        buffer = jnp.where(mask, self._fresh(obs), pushed)
        count = jnp.where(reset_mask, 1, wstate.count + 1)
        return DelayObservationState(buffer, count), ts._replace(
            obs=self._emit(buffer, count)
        )


class StickyActionState(NamedTuple):
    rng: Any
    last_action: Any  # (N, ...) previously executed action
    is_first: Any  # (N,) True right after an episode start


class StickyAction(FuncWrapper):
    """Repeat the previously-executed action with probability ``p``.

    Functional twin of host ``StickyAction`` (reference stateful_action.py:16,
    ``repeat_action_duration=1``): the submitted action is replaced by the
    last executed one with probability ``p``, never on an episode's first
    step. Carries its own PRNG key in the wrapper state.
    """

    def __init__(self, repeat_action_probability: float, action_space: Any = None):
        if not 0 <= repeat_action_probability < 1:
            raise ValueError(
                f"repeat_action_probability should be in [0, 1), got {repeat_action_probability}"
            )
        self.p = repeat_action_probability
        self._action_space = action_space

    def action_space(self, space):
        # capture the single-env action space during wrapper-stack assembly
        # so `init` can allocate the last-action buffer (scan carries need a
        # fixed pytree structure — a lazy None leaf would retrace)
        self._action_space = space
        return space

    def init(self, rng, obs, carry, params=None):
        assert self._action_space is not None, (
            "StickyAction needs the action space: pass action_space= to the "
            "constructor or assemble it through JaxVectorEnv/make_train_step"
        )
        n = jnp.shape(carry.prev_done)[0]
        import numpy as np

        dtype = np.dtype(self._action_space.dtype)
        dtype = jnp.int32 if dtype == np.int64 else dtype  # device default width
        proto = jnp.zeros((n,) + self._action_space.shape, dtype)
        return StickyActionState(rng, proto, jnp.ones(n, bool)), obs

    def transform_action(self, wstate, action):
        rng, k = jax.random.split(wstate.rng)
        repeat = (
            jax.random.uniform(k, jnp.shape(action)[:1]) < self.p
        ) & ~wstate.is_first
        mask = repeat.reshape(repeat.shape + (1,) * (jnp.ndim(action) - 1))
        chosen = jnp.where(mask, wstate.last_action, action)
        return StickyActionState(rng, chosen, wstate.is_first), chosen

    def update(self, wstate, ts, reset_mask, carry):
        # the step AFTER a reset step is an episode's first real step
        return wstate._replace(is_first=reset_mask), ts


# ---------------------------------------------------------------------------
# Stateless transforms
# ---------------------------------------------------------------------------


class TransformObservation(FuncWrapper):
    """Apply a jittable ``fn(obs) -> obs`` (host TransformObservation twin,
    reference transform_observation.py:43)."""

    def __init__(self, fn: Callable[[Any], Any]):
        self.fn = fn

    def init(self, rng, obs, carry, params=None):
        return None, self.fn(obs)

    def update(self, wstate, ts, reset_mask, carry):
        return wstate, ts._replace(obs=self.fn(ts.obs))


class TransformAction(FuncWrapper):
    """Apply a jittable ``fn(action) -> action`` pre-step (host
    TransformAction twin, reference transform_action.py:24)."""

    def __init__(self, fn: Callable[[Any], Any]):
        self.fn = fn

    def transform_action(self, wstate, action):
        return wstate, self.fn(action)


class TransformReward(FuncWrapper):
    """Apply a jittable ``fn(reward) -> reward`` (host TransformReward twin,
    reference transform_reward.py:21)."""

    def __init__(self, fn: Callable[[Any], Any]):
        self.fn = fn

    def update(self, wstate, ts, reset_mask, carry):
        return wstate, ts._replace(reward=self.fn(ts.reward))


class ClipAction(TransformAction):
    """Clip actions into ``[low, high]`` (host ClipAction twin, reference
    transform_action.py:78)."""

    def __init__(self, low, high):
        low, high = jnp.asarray(low), jnp.asarray(high)
        super().__init__(lambda a: jnp.clip(a, low, high))


class ClipReward(TransformReward):
    """Clip rewards into ``[min, max]`` (host ClipReward twin, reference
    transform_reward.py:67)."""

    def __init__(self, min_reward: float | None = None, max_reward: float | None = None):
        super().__init__(lambda r: jnp.clip(r, min_reward, max_reward))


class RescaleAction(TransformAction):
    """Affinely map actions from ``[min_action, max_action]`` onto the env's
    ``[low, high]`` (host RescaleAction twin, reference transform_action.py:126)."""

    def __init__(self, low, high, min_action=-1.0, max_action=1.0):
        low, high = jnp.asarray(low, jnp.float32), jnp.asarray(high, jnp.float32)
        min_a, max_a = jnp.asarray(min_action, jnp.float32), jnp.asarray(max_action, jnp.float32)
        scale = (high - low) / (max_a - min_a)
        super().__init__(lambda a: jnp.clip(low + scale * (a - min_a), low, high))


class RescaleObservation(TransformObservation):
    """Affinely map observations from ``[low, high]`` onto
    ``[min_obs, max_obs]`` (host RescaleObservation twin, reference
    transform_observation.py:463)."""

    def __init__(self, low, high, min_obs=-1.0, max_obs=1.0):
        low, high = jnp.asarray(low, jnp.float32), jnp.asarray(high, jnp.float32)
        min_o, max_o = jnp.asarray(min_obs, jnp.float32), jnp.asarray(max_obs, jnp.float32)
        scale = (max_o - min_o) / (high - low)
        super().__init__(lambda o: min_o + scale * (o - low))


# ---------------------------------------------------------------------------
# On-device episode statistics (the device info protocol)
# ---------------------------------------------------------------------------


class EpisodeStatsState(NamedTuple):
    episode_return: Any  # (N,) f32 — running return of the live episode
    episode_length: Any  # (N,) i32 — running length of the live episode


class EpisodeStatistics(FuncWrapper):
    """Accumulate per-env episode return/length on device; emit them in
    ``TimeStep.info`` on episode end.

    Functional twin of ``wrappers.vector.RecordEpisodeStatistics`` (reference
    wrappers/vector/common.py:22), minus wall-clock ``t`` (host-only data).
    The fixed-shape device info convention (SURVEY §7 hard part 5):

    - ``info["episode_return"]``: (N,) f32, the finished episode's return on
      done lanes, 0 elsewhere;
    - ``info["episode_length"]``: (N,) i32, likewise;
    - ``info["_episode"]``: (N,) bool done mask.

    Convert to the reference's ``_add_info`` dict format with
    :func:`episode_stats_to_infos`.
    """

    def init(self, rng, obs, carry, params=None):
        n = jnp.shape(carry.prev_done)[0]
        return (
            EpisodeStatsState(jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.int32)),
            obs,
        )

    def update(self, wstate, ts, reset_mask, carry):
        # Host twin: zero stats on reset-step lanes, accumulate elsewhere
        # (vector/common.py step: returns[prev_dones]=0; returns[~]+=reward).
        live = ~reset_mask
        ep_ret = jnp.where(live, wstate.episode_return + ts.reward, 0.0)
        ep_len = jnp.where(live, wstate.episode_length + 1, 0)
        done = jnp.logical_or(ts.terminated, ts.truncated)
        info = dict(ts.info)
        info["episode_return"] = jnp.where(done, ep_ret, 0.0)
        info["episode_length"] = jnp.where(done, ep_len, 0)
        info["_episode"] = done
        return EpisodeStatsState(ep_ret, ep_len), ts._replace(info=info)


def episode_stats_to_infos(info: dict[str, Any]) -> dict[str, Any]:
    """Convert the fixed-shape device episode-stats info into the reference's
    vector info dict format (reference vector/vector_env.py:275-336 +
    wrappers/vector/common.py:82): ``{"episode": {"r", "l"}, "_episode": mask}``
    only when at least one episode finished, else ``{}``.

    Accepts one step's info (leaves shaped ``(N,)``) from a jitted step or a
    single time-slice of a rollout's stacked info.
    """
    import numpy as np

    mask = np.asarray(info["_episode"])
    passthrough = {
        k: v
        for k, v in info.items()
        if k not in ("episode_return", "episode_length", "_episode")
    }
    if not mask.any():
        return passthrough
    passthrough["episode"] = {
        "r": np.where(mask, np.asarray(info["episode_return"]), 0.0),
        "l": np.where(mask, np.asarray(info["episode_length"]), 0),
    }
    passthrough["_episode"] = mask
    return passthrough
