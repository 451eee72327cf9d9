"""Device-resident vector env: the TPU-native replacement for Sync/Async.

Wraps any :class:`~gymnasium_tpu.functional.FuncEnv` into a batched,
auto-resetting, jit-compiled environment whose entire state lives on device.
One compiled XLA executable advances all N sub-envs in lockstep; there is no
per-env Python dispatch, no process pool, and no host round-trip inside the
step (contrast reference async_vector_env.py:54-725, whose step pickles
actions over pipes to worker processes).

Scaling story (SURVEY.md §5.8): pass ``sharding=`` a
``jax.sharding.NamedSharding`` over the env-batch axis and the same compiled
step runs SPMD across a device mesh, with XLA inserting any collectives.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from gymnasium_tpu.functional import (
    EnvCarry,
    FuncEnv,
    TimeStep,
    make_autoreset_step,
    make_initial_carry,
    vectorize_func_env,
)
from gymnasium_tpu.vector.utils import batch_space
from gymnasium_tpu.vector.vector_env import AutoresetMode, VectorEnv

__all__ = ["JaxVectorEnv"]


class JaxVectorEnv(VectorEnv):
    """Batched auto-resetting env compiled to a single device program."""

    metadata: dict[str, Any] = {"autoreset_mode": AutoresetMode.NEXT_STEP, "jax": True}

    def __init__(
        self,
        func_env: FuncEnv,
        num_envs: int,
        params: Any = None,
        max_episode_steps: int | None = None,
        autoreset_mode: AutoresetMode = AutoresetMode.NEXT_STEP,
        seed: int | None = None,
        sharding: jax.sharding.Sharding | None = None,
        jit: bool = True,
        wrappers: Any = None,
    ):
        self.func_env = func_env
        self.num_envs = num_envs
        self.params = params if params is not None else func_env.get_default_params()
        self.time_limit = max_episode_steps
        self.autoreset_mode = autoreset_mode
        self.metadata = dict(type(self).metadata)
        self.metadata["autoreset_mode"] = autoreset_mode
        self.sharding = sharding
        #: Device-composable wrapper stack (innermost first) — see
        #: :mod:`gymnasium_tpu.wrappers.func`. Their states thread through the
        #: compiled step as part of the carry; no host code runs per step.
        self.wrappers = tuple(wrappers) if wrappers else ()

        assert autoreset_mode in (AutoresetMode.NEXT_STEP, AutoresetMode.DISABLED), (
            f"JaxVectorEnv supports NEXT_STEP and DISABLED autoreset, got {autoreset_mode}"
        )

        obs_space = func_env.observation_space
        act_space = func_env.action_space
        for w in self.wrappers:
            obs_space = w.observation_space(obs_space)
            act_space = w.action_space(act_space)
        self.single_observation_space = obs_space
        self.single_action_space = act_space
        self.observation_space = batch_space(self.single_observation_space, num_envs)
        self.action_space = batch_space(self.single_action_space, num_envs)

        self._batched = vectorize_func_env(func_env, num_envs, sharding=sharding)
        step_fn = self._make_step()
        init_fn = self._make_init()
        if jit:
            # Donating the carry lets XLA update env state in place.
            self._step_fn = jax.jit(step_fn, donate_argnums=0)
            self._init_fn = jax.jit(init_fn)
        else:
            self._step_fn = step_fn
            self._init_fn = init_fn

        self._seed = seed if seed is not None else 0
        self.carry: EnvCarry | None = None
        self._last_obs: Any = None
        self._partial_reset_fn: Callable | None = None
        self._rollout_cache: dict[Any, Callable] = {}

    def _make_step(self):
        """The pure ``(carry, action) -> (carry, TimeStep)`` step, with the
        functional wrapper stack (if any) folded in."""
        step_fn = make_autoreset_step(
            self._batched,
            self.params,
            time_limit=self.time_limit,
            autoreset=self.autoreset_mode == AutoresetMode.NEXT_STEP,
        )
        if self.wrappers:
            from gymnasium_tpu.wrappers.func import wrap_autoreset_step

            step_fn = wrap_autoreset_step(step_fn, self.wrappers)
        return step_fn

    def _make_init(self):
        def init_fn(rng):
            if not self.wrappers:
                return make_initial_carry(self._batched, rng, self.params)
            from gymnasium_tpu.wrappers.func import wrap_initial

            rng, k_wrap = jax.random.split(rng)
            carry, obs = make_initial_carry(self._batched, rng, self.params)
            return wrap_initial(self.wrappers, k_wrap, carry, obs, self.params)

        return init_fn

    # -- sharding ----------------------------------------------------------

    def _place(self, tree):
        """Shard per-env leaves over the mesh, replicate the rest.

        Per-env-ness is decided structurally, not by shape coincidence: the
        ``EnvCarry`` fields are known (state/steps/prev_done carry the batch
        axis, the PRNG key is shared), and each functional wrapper declares
        its own state layout via ``FuncWrapper.state_per_env`` — so a shared
        leaf whose leading dim happens to equal ``num_envs`` (e.g. an RMS
        mean over an obs_dim of exactly N) still replicates correctly.
        """
        if self.sharding is None:
            return tree
        mask = self._per_env_mask(tree)

        def put(leaf, per_env):
            if not per_env:
                return jax.device_put(
                    leaf,
                    jax.sharding.NamedSharding(
                        self.sharding.mesh, jax.sharding.PartitionSpec()
                    ),
                )
            spec = jax.sharding.PartitionSpec(
                *(self.sharding.spec + (None,) * (leaf.ndim - len(self.sharding.spec)))
            )
            return jax.device_put(
                leaf, jax.sharding.NamedSharding(self.sharding.mesh, spec)
            )

        return jax.tree_util.tree_map(put, tree, mask)

    def _per_env_mask(self, carry):
        """Boolean pytree: True where a leaf carries the env-batch axis."""

        def env_carry_mask(env_carry: EnvCarry) -> EnvCarry:
            return EnvCarry(
                state=jax.tree_util.tree_map(
                    lambda leaf: jnp.ndim(leaf) > 0
                    and jnp.shape(leaf)[0] == self.num_envs,
                    env_carry.state,
                ),
                rng=False,
                steps=True,
                prev_done=True,
            )

        if isinstance(carry, EnvCarry):
            return env_carry_mask(carry)
        from gymnasium_tpu.wrappers.func import WrappedEnvCarry

        if isinstance(carry, WrappedEnvCarry):
            return WrappedEnvCarry(
                env=env_carry_mask(carry.env),
                wrappers=tuple(
                    w.state_per_env(wstate, self.num_envs)
                    for w, wstate in zip(self.wrappers, carry.wrappers)
                ),
            )
        # unknown carry shape: fall back to the leading-dim heuristic
        return jax.tree_util.tree_map(
            lambda leaf: jnp.ndim(leaf) > 0 and jnp.shape(leaf)[0] == self.num_envs,
            carry,
        )

    # -- VectorEnv API ------------------------------------------------------

    def reset(self, *, seed: int | None = None, options: dict[str, Any] | None = None):
        if options is not None and "reset_mask" in options:
            return self._partial_reset(dict(options).pop("reset_mask"), seed)
        if seed is not None:
            self._seed = seed
        rng = jax.random.PRNGKey(self._seed)
        carry, obs = self._init_fn(rng)
        self.carry = self._place(carry)
        self._last_obs = obs
        return obs, {}

    def _partial_reset(self, reset_mask, seed: int | None):
        """Masked in-jit reset: only ``reset_mask`` lanes re-initialize,
        the rest keep their state and report their last observation —
        matching ``SyncVectorEnv`` masked-reset semantics (reference
        sync_vector_env.py:192-220)."""
        assert self.carry is not None, "Call reset before a masked reset."
        reset_mask = np.asarray(reset_mask)
        assert reset_mask.shape == (self.num_envs,), (
            f"`options['reset_mask': mask]` must have shape `({self.num_envs},)`, "
            f"got {reset_mask.shape}"
        )
        assert reset_mask.dtype == np.bool_, (
            f"`options['reset_mask': mask]` must have `dtype=np.bool_`, "
            f"got {reset_mask.dtype}"
        )
        assert np.any(reset_mask), (
            "`options['reset_mask': mask]` must contain at least one True entry"
        )

        if self._partial_reset_fn is None:
            init_fn = self._make_init()
            per_env = self._per_env_mask(self.carry)

            def broadcast(mask, leaf):
                return jnp.reshape(mask, (-1,) + (1,) * (jnp.ndim(leaf) - 1))

            def partial_reset(carry, last_obs, mask, rng):
                fresh_carry, fresh_obs = init_fn(rng)

                def merge(is_per_env, new, old):
                    # per-env leaves select by lane; shared leaves keep the
                    # live value (wrapper statistics survive a partial reset)
                    # except the PRNG key, which advances to the fresh one
                    if not is_per_env:
                        return old
                    return jnp.where(broadcast(mask, new), new, old)

                merged = jax.tree_util.tree_map(merge, per_env, fresh_carry, carry)
                if self.wrappers:
                    merged = merged._replace(env=merged.env._replace(rng=fresh_carry.env.rng))
                else:
                    merged = merged._replace(rng=fresh_carry.rng)
                obs = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(broadcast(mask, new), new, old),
                    fresh_obs,
                    last_obs,
                )
                return merged, obs

            self._partial_reset_fn = jax.jit(partial_reset)

        if seed is not None:
            rng = jax.random.PRNGKey(seed)
        else:
            # fresh deterministic entropy from the carried key
            base = self.carry.env if self.wrappers else self.carry
            rng = jax.random.fold_in(base.rng, 7)
        carry, obs = self._partial_reset_fn(
            self.carry, self._last_obs, jnp.asarray(reset_mask), rng
        )
        self.carry = self._place(carry)
        self._last_obs = obs
        return obs, {}

    def step(self, actions):
        assert self.carry is not None, "Call reset before using step method."
        self.carry, timestep = self._step_fn(self.carry, actions)
        self._last_obs = timestep.obs
        return (
            timestep.obs,
            timestep.reward,
            timestep.terminated,
            timestep.truncated,
            timestep.info,
        )

    # -- fused rollout (benchmark / training path) -------------------------

    def rollout(
        self,
        num_steps: int,
        action_fn: Callable[[Any, Any], Any] | None = None,
        carry: EnvCarry | None = None,
        unroll: int = 4,
    ):
        """Run ``num_steps`` env steps as one ``lax.scan`` program.

        ``action_fn(rng, obs) -> actions`` defaults to uniform random actions
        from the action space. Returns ``(carry, TimeStep)`` with time-major
        stacked leaves. This is the throughput path: one dispatch for the
        whole trajectory, everything stays on device.
        """
        if carry is None:
            if self.carry is None:
                self.reset()
            carry = self.carry
        assert carry is not None

        cache_key = (num_steps, action_fn, unroll)
        run = self._rollout_cache.get(cache_key)
        if run is None:
            if action_fn is None:
                space = self.single_action_space

                def sample_actions(rng, obs):
                    return space.sample_jax(rng, (self.num_envs,))

            else:
                sample_actions = action_fn

            step_fn = self._make_step()

            def scan_body(carry, _):
                env_carry, rng = carry
                rng, k_act = jax.random.split(rng)
                actions = sample_actions(k_act, None)
                env_carry, ts = step_fn(env_carry, actions)
                return (env_carry, rng), ts

            @jax.jit
            def run(carry):
                base = carry.env if self.wrappers else carry
                rng = jax.random.fold_in(base.rng, 1)
                (env_carry, _), traj = jax.lax.scan(
                    scan_body, (carry, rng), None, length=num_steps, unroll=unroll
                )
                return env_carry, traj

            self._rollout_cache[cache_key] = run

        env_carry, traj = run(carry)
        self.carry = env_carry
        return env_carry, traj

    def render(self):
        return None
