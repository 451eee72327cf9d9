"""Pure-JAX PPO over any fixed-shape FuncEnv — the framework's flagship
training path.

The whole loop — env rollout (lax.scan over the auto-resetting batched step),
GAE, minibatched clipped-surrogate updates — is one jitted function. Policy
matmuls run in bfloat16 on the MXU with float32 accumulation; the env batch
shards over a ``dp`` mesh axis and the MLP hidden dimension over an optional
``tp`` axis (see :func:`make_sharded_train_step`).

This subsystem has no counterpart in the reference (Gymnasium is env-only);
it exists to demonstrate the intended large-scale usage of the framework:
device-resident envs feeding a sharded learner with zero host round-trips.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gymnasium_tpu import spaces
from gymnasium_tpu.functional import (
    EnvCarry,
    FuncEnv,
    make_autoreset_step,
    make_initial_carry,
    vectorize_func_env,
)

__all__ = ["PPOConfig", "PPOState", "init_ppo", "make_train_step", "train"]


class PPOConfig(NamedTuple):
    """Hyperparameters of the PPO loop."""

    num_envs: int = 1024
    rollout_steps: int = 64
    hidden_sizes: tuple[int, ...] = (128, 128)
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    entropy_coef: float = 0.01
    value_coef: float = 0.5
    num_minibatches: int = 4
    update_epochs: int = 2
    max_grad_norm: float = 0.5
    max_episode_steps: int | None = 500
    compute_dtype: Any = jnp.bfloat16


class PPOState(NamedTuple):
    """Carried training state (a checkpointable pytree).

    ``env_carry`` is an :class:`EnvCarry`, or a
    :class:`~gymnasium_tpu.wrappers.func.WrappedEnvCarry` when the trainer
    was built with functional wrappers (their normalization statistics /
    frame buffers checkpoint with everything else). ``obs`` is the current
    (post-wrapper) batched observation feeding the next rollout step.
    """

    params: Any
    opt_state: Any
    env_carry: Any
    obs: Any
    rng: Any
    update_count: Any


def _obs_size(space: spaces.Space) -> int:
    assert isinstance(space, spaces.Box), f"PPO supports Box observations, got {space}"
    return int(np.prod(space.shape))


def _mlp_init(rng, sizes: tuple[int, ...]):
    """Orthogonal-initialised MLP parameter pytree."""
    params = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for k, (fan_in, fan_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        w = jax.nn.initializers.orthogonal(np.sqrt(2))(k, (fan_in, fan_out), jnp.float32)
        b = jnp.zeros((fan_out,), jnp.float32)
        params.append({"w": w, "b": b})
    return params


def _mlp_apply(params, x, compute_dtype, final_scale: float = 1.0):
    """MLP forward with ``compute_dtype`` (bf16) hidden activations.

    Hidden matmuls emit ``compute_dtype`` directly — the update phase is
    HBM-bandwidth-bound on activation traffic (each f32 hidden activation
    of a 65536-sample minibatch is 33 MB written forward and re-read in
    the backward pass; measured 8x grad steps at 9.8 ms vs ~1 ms of MXU
    ideal), so halving it is the single biggest lever. The FINAL layer
    still accumulates and returns f32: logits feed log-softmax and values
    feed squared losses, where bf16 resolution would bite.
    """
    h = x.astype(compute_dtype)
    for i, layer in enumerate(params):
        last = i == len(params) - 1
        h = jnp.dot(
            h,
            layer["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32 if last else compute_dtype,
        ) + (layer["b"] if last else layer["b"].astype(compute_dtype))
        if not last:
            h = jnp.tanh(h)
    return h * final_scale


def _wrapped_spaces(func_env: FuncEnv, wrappers):
    obs_space, act_space = func_env.observation_space, func_env.action_space
    for w in wrappers:
        obs_space = w.observation_space(obs_space)
        act_space = w.action_space(act_space)
    return obs_space, act_space


def init_ppo(
    func_env: FuncEnv,
    config: PPOConfig,
    rng,
    wrappers=(),
) -> tuple[PPOState, Any, optax.GradientTransformation]:
    """Initialise params, optimizer, and device-resident env batch.

    ``wrappers`` is a stack of functional wrappers
    (:mod:`gymnasium_tpu.wrappers.func`, innermost first) folded into the
    compiled train step — e.g. ``[NormalizeObservation(), NormalizeReward()]``
    gives fully on-device obs/return normalization.
    """
    obs_space, act_space = _wrapped_spaces(func_env, wrappers)
    obs_dim = _obs_size(obs_space)
    if isinstance(act_space, spaces.Discrete):
        act_out = int(act_space.n)
        continuous = False
    elif isinstance(act_space, spaces.Box):
        act_out = int(np.prod(act_space.shape))
        continuous = True
    else:
        raise TypeError(f"PPO supports Discrete or Box actions, got {act_space}")

    rng, k_pi, k_v, k_env = jax.random.split(rng, 4)
    sizes = (obs_dim, *config.hidden_sizes)
    params = {
        "pi": _mlp_init(k_pi, sizes + (act_out,)),
        "v": _mlp_init(k_v, sizes + (1,)),
    }
    if continuous:
        params["log_std"] = jnp.zeros((act_out,), jnp.float32)

    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.lr),
    )
    opt_state = tx.init(params)

    batched = vectorize_func_env(func_env, config.num_envs)
    env_params = func_env.get_default_params()
    k_env, k_wrap = jax.random.split(k_env)
    env_carry, obs = make_initial_carry(batched, k_env, env_params)
    if wrappers:
        from gymnasium_tpu.wrappers.func import wrap_initial

        env_carry, obs = wrap_initial(wrappers, k_wrap, env_carry, obs, env_params)

    state = PPOState(
        params=params,
        opt_state=opt_state,
        env_carry=env_carry,
        obs=obs.reshape(config.num_envs, obs_dim),
        rng=rng,
        update_count=jnp.zeros((), jnp.int32),
    )
    return state, env_params, tx


def _policy_dist(params, obs, config: PPOConfig, continuous: bool):
    logits = _mlp_apply(params["pi"], obs, config.compute_dtype)
    if continuous:
        return logits, params["log_std"]
    return logits, None


def _sample_action(rng, logits, log_std, continuous: bool):
    if continuous:
        noise = jax.random.normal(rng, logits.shape)
        action = logits + jnp.exp(log_std) * noise
        logp = -0.5 * jnp.sum(
            jnp.square((action - logits) / jnp.exp(log_std)) + 2 * log_std + jnp.log(2 * jnp.pi),
            axis=-1,
        )
        return action, logp
    action = jax.random.categorical(rng, logits, axis=-1)
    logp = jnp.take_along_axis(
        jax.nn.log_softmax(logits), action[..., None], axis=-1
    ).squeeze(-1)
    return action, logp


def _log_prob(logits, log_std, action, continuous: bool):
    if continuous:
        return -0.5 * jnp.sum(
            jnp.square((action - logits) / jnp.exp(log_std)) + 2 * log_std + jnp.log(2 * jnp.pi),
            axis=-1,
        )
    return jnp.take_along_axis(
        jax.nn.log_softmax(logits), action[..., None].astype(jnp.int32), axis=-1
    ).squeeze(-1)


def _entropy(logits, log_std, continuous: bool):
    if continuous:
        return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
    probs = jax.nn.softmax(logits)
    return -jnp.sum(probs * jax.nn.log_softmax(logits), axis=-1).mean()


class _Transition(NamedTuple):
    obs: Any
    action: Any
    logp: Any
    value: Any
    reward: Any
    done: Any


def make_train_step(
    func_env: FuncEnv,
    config: PPOConfig,
    env_params: Any = None,
    tx: optax.GradientTransformation | None = None,
    wrappers=(),
) -> Callable[[PPOState], tuple[PPOState, dict[str, Any]]]:
    """Build the pure ``train_step(state) -> (state, metrics)`` function.

    One call = one rollout of ``rollout_steps × num_envs`` env steps plus
    ``update_epochs`` epochs of ``num_minibatches`` PPO updates, all inside a
    single jittable program. ``wrappers`` (functional, innermost first, same
    stack passed to :func:`init_ppo`) fold into the compiled step, so
    observation/reward normalization runs on-device with zero host syncs —
    the device-side equivalent of the reference's NormalizeObservation /
    NormalizeReward wrappers (reference stateful_observation.py:458,
    stateful_reward.py:19).
    """
    continuous = isinstance(func_env.action_space, spaces.Box)
    if tx is None:
        tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm), optax.adam(config.lr)
        )

    batched = vectorize_func_env(func_env, config.num_envs)
    if env_params is None:
        env_params = func_env.get_default_params()
    env_step = make_autoreset_step(
        batched, env_params, time_limit=config.max_episode_steps, autoreset=True
    )
    if wrappers:
        from gymnasium_tpu.wrappers.func import wrap_autoreset_step

        env_step = wrap_autoreset_step(env_step, wrappers)
    obs_space, _ = _wrapped_spaces(func_env, wrappers)
    obs_dim = _obs_size(obs_space)

    def rollout_body(loop_carry, _):
        env_carry, obs, rng, params = loop_carry
        rng, k_act = jax.random.split(rng)
        logits, log_std = _policy_dist(params, obs, config, continuous)
        action, logp = _sample_action(k_act, logits, log_std, continuous)
        env_carry, ts = env_step(env_carry, action)
        next_obs = ts.obs.reshape(config.num_envs, obs_dim)
        done = jnp.logical_or(ts.terminated, ts.truncated)
        # value is NOT computed here: the v-net does not change during the
        # rollout, so all T+1 value passes run as ONE batched forward after
        # the scan — identical numbers, one (T+1)·N-row matmul chain instead
        # of T+1 small sequential ones inside the scan
        transition = _Transition(obs, action, logp, jnp.zeros(()), ts.reward, done)
        return (env_carry, next_obs, rng, params), transition

    def train_step(state: PPOState) -> tuple[PPOState, dict[str, Any]]:
        rng = state.rng
        rng, k_roll, k_perm = jax.random.split(rng, 3)

        (env_carry, last_obs, _, _), traj = jax.lax.scan(
            rollout_body,
            (state.env_carry, state.obs, k_roll, state.params),
            None,
            length=config.rollout_steps,
        )

        # One value forward over the whole trajectory (see rollout_body).
        all_obs = jnp.concatenate([traj.obs, last_obs[None]], axis=0)
        all_values = _mlp_apply(
            state.params["v"], all_obs, config.compute_dtype
        ).squeeze(-1)
        traj = traj._replace(value=all_values[:-1])

        # GAE over the time-major trajectory.
        last_value = all_values[-1]

        def gae_body(gae_and_next_value, transition):
            gae, next_value = gae_and_next_value
            delta = (
                transition.reward
                + config.gamma * next_value * (1 - transition.done)
                - transition.value
            )
            gae = delta + config.gamma * config.gae_lambda * (1 - transition.done) * gae
            return (gae, transition.value), gae

        _, advantages = jax.lax.scan(
            gae_body,
            (jnp.zeros_like(last_value), last_value),
            traj,
            reverse=True,
        )
        returns = advantages + traj.value

        # Minibatching stays mesh-partitionable (the env axis is dp-sharded):
        # a flat global permutation of (T*N,) would force XLA to all-gather
        # the whole rollout onto every device (SCALING_PROXY.json caught
        # this as per-device update FLOPs that did not shrink with the
        # mesh). Instead each epoch permutes the TIME axis — replicated, so
        # the gather is device-local — and carves minibatches as contiguous
        # slices of it. Every minibatch then holds ALL envs at mb_steps
        # random timesteps: full cross-env diversity with zero cross-device
        # traffic in the update other than the gradient all-reduce.
        adv_n = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        batch = (traj.obs, traj.action, traj.logp, traj.value, adv_n, returns)
        mb_steps = config.rollout_steps // config.num_minibatches
        assert mb_steps > 0, (
            "rollout_steps must be >= num_minibatches (minibatches are time slices)"
        )

        def loss_fn(params, mb):
            obs, action, old_logp, old_value, adv, ret = mb
            logits, log_std = _policy_dist(params, obs, config, continuous)
            logp = _log_prob(logits, log_std, action, continuous)
            ratio = jnp.exp(logp - old_logp)
            pg1 = ratio * adv
            pg2 = jnp.clip(ratio, 1 - config.clip_eps, 1 + config.clip_eps) * adv
            pg_loss = -jnp.minimum(pg1, pg2).mean()
            value = _mlp_apply(params["v"], obs, config.compute_dtype).squeeze(-1)
            v_loss = 0.5 * jnp.square(value - ret).mean()
            ent = _entropy(logits, log_std, continuous)
            total = pg_loss + config.value_coef * v_loss - config.entropy_coef * ent
            return total, (pg_loss, v_loss, ent)

        def epoch_body(carry, _):
            params, opt_state, rng = carry
            rng, k_t = jax.random.split(rng)
            perm_t = jax.random.permutation(k_t, config.rollout_steps)
            shuffled = jax.tree_util.tree_map(lambda x: x[perm_t], batch)

            def minibatch_body(carry, mb_idx):
                params, opt_state = carry
                # minibatches stay (mb_steps, N, ...): the loss reduces over
                # all leading dims, and NOT flattening keeps the env axis
                # sharded (a (T*N,) reshape would interleave device shards)
                mb = jax.tree_util.tree_map(
                    lambda x: jax.lax.dynamic_slice_in_dim(x, mb_idx * mb_steps, mb_steps),
                    shuffled,
                )
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch_body, (params, opt_state), jnp.arange(config.num_minibatches)
            )
            return (params, opt_state, rng), losses

        (params, opt_state, _), losses = jax.lax.scan(
            epoch_body,
            (state.params, state.opt_state, k_perm),
            None,
            length=config.update_epochs,
        )

        metrics = {
            "loss": losses.mean(),
            "reward_per_step": traj.reward.mean(),
            "episodes_finished": traj.done.sum(),
            "mean_value": traj.value.mean(),
        }
        new_state = PPOState(
            params=params,
            opt_state=opt_state,
            env_carry=env_carry,
            obs=last_obs,
            rng=rng,
            update_count=state.update_count + 1,
        )
        return new_state, metrics

    return train_step


def train(
    func_env: FuncEnv,
    config: PPOConfig | None = None,
    num_updates: int = 50,
    seed: int = 0,
    verbose: bool = False,
    wrappers=(),
):
    """Convenience end-to-end PPO training loop on a single device."""
    config = config or PPOConfig()
    rng = jax.random.PRNGKey(seed)
    state, env_params, tx = init_ppo(func_env, config, rng, wrappers=wrappers)
    step = jax.jit(make_train_step(func_env, config, env_params, tx, wrappers=wrappers))
    for i in range(num_updates):
        state, metrics = step(state)
        if verbose and (i % 10 == 0 or i == num_updates - 1):
            print(
                f"update {i}: loss={float(metrics['loss']):.4f} "
                f"reward/step={float(metrics['reward_per_step']):.4f} "
                f"episodes={int(metrics['episodes_finished'])}"
            )
    return state
