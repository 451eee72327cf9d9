"""Shared machinery for the planar locomotion robots (cheetah/hopper/walker/
swimmer) and their functional device variants."""

from __future__ import annotations

from typing import Any

import numpy as np

from gymnasium_tpu import spaces
from gymnasium_tpu.envs.mujoco.mujoco_env import MujocoEnv, _compiled_step, load_model
from gymnasium_tpu.functional import FuncEnv
from gymnasium_tpu.physics.articulated import init_qpos, make_dynamics

__all__ = ["PlanarLocomotionEnv", "MujocoFuncEnv"]


class PlanarLocomotionEnv(MujocoEnv):
    """x-velocity-rewarded planar robots: qpos[0] is the root x slide."""

    # subclass configuration
    forward_reward_weight: float = 1.0
    ctrl_cost_weight: float = 0.0
    healthy_reward: float = 0.0
    terminate_when_unhealthy: bool = True
    velocity_clip: float = np.inf
    exclude_x: bool = True
    # planar robots with a root z slide report info["z_distance_from_origin"]
    # (reference hopper_v5.py:294, walker2d_v5.py) — qpos index of the z dof
    z_index: int | None = None
    # xy-plane robots (swimmer) additionally report y position/velocity and
    # distance_from_origin (reference swimmer_v5.py:250-262)
    report_xy: bool = False

    def control_cost(self, action) -> float:
        """Quadratic actuation cost."""
        return self.ctrl_cost_weight * float(np.sum(np.square(action)))

    def is_healthy(self) -> bool:
        """Override for termination conditions."""
        return True

    def _get_obs(self) -> np.ndarray:
        qpos = self.qpos[1:] if self.exclude_x else self.qpos
        qvel = np.clip(self.qvel, -self.velocity_clip, self.velocity_clip)
        return np.concatenate([qpos, qvel]).astype(np.float64)

    def step(self, action):
        x_before = self.qpos[0]
        y_before = self.qpos[1] if self.report_xy else 0.0
        self.do_simulation(action)
        x_after = self.qpos[0]
        x_velocity = (x_after - x_before) / self.dt

        ctrl_cost = float(self.control_cost(action))
        forward_reward = float(self.forward_reward_weight * x_velocity)
        healthy = self.is_healthy()
        healthy_reward = float(
            self.healthy_reward * (healthy or not self.terminate_when_unhealthy)
        )

        # float64 reward composed exactly as the reference sums its info
        # components (test_mujoco_v5.py test_reward_sum pins the fp grouping)
        reward = forward_reward + healthy_reward + -ctrl_cost
        terminated = self.terminate_when_unhealthy and not healthy
        info = {
            "x_position": x_after,
            "x_velocity": x_velocity,
            "reward_forward": forward_reward,
            "reward_ctrl": -ctrl_cost,
            "reward_survive": healthy_reward,
        }
        if self.z_index is not None:
            info["z_distance_from_origin"] = float(
                self.qpos[self.z_index] - self.init_qpos[self.z_index]
            )
        if self.report_xy:
            info["y_position"] = float(self.qpos[1])
            info["y_velocity"] = float((self.qpos[1] - y_before) / self.dt)
            info["distance_from_origin"] = float(
                np.linalg.norm(self.qpos[0:2] - self.init_qpos[0:2])
            )
        if self.render_mode == "human":
            self.render()
        return self._get_obs(), reward, terminated, False, info

    def _reset_info(self):
        # reference v5 reset infos (e.g. hopper_v5.py:338-342): the position
        # keys of the step info at the freshly reset state
        info = {"x_position": self.qpos[0]}
        if self.z_index is not None:
            info["z_distance_from_origin"] = (
                self.qpos[self.z_index] - self.init_qpos[self.z_index]
            )
        if self.report_xy:
            info["y_position"] = self.qpos[1]
            info["distance_from_origin"] = np.linalg.norm(self.qpos[0:2] - self.init_qpos[0:2])
        return info


class MujocoFuncEnv(FuncEnv):
    """Generic functional (device) wrapper for a compiled robot model.

    State: ``{"qpos", "qvel", "prev_x"}``. Subclasses configure the model
    name, frame_skip, spaces, and override reward/terminal hooks using pure
    jnp code.
    """

    model_name: str = ""
    frame_skip: int = 5
    reset_noise_scale: float = 0.1
    rng_hooks = frozenset({"initial"})

    def __init__(self, options: dict[str, Any] | None = None):
        options = dict(options or {})
        self.reset_noise_scale = options.pop("reset_noise_scale", self.reset_noise_scale)
        super().__init__(options)
        self.model, self.meta = load_model(self.model_name)
        self._dyn = make_dynamics(self.model)
        nv = self.model.nv
        self._init_qpos = init_qpos(self.model)
        self.action_space = spaces.Box(
            low=np.asarray(self.model.act_ctrlrange[:, 0], dtype=np.float32),
            high=np.asarray(self.model.act_ctrlrange[:, 1], dtype=np.float32),
        )

    @property
    def dt(self) -> float:
        return self.model.timestep * self.frame_skip

    def initial(self, rng, params: Any = None):
        import jax
        import jax.numpy as jnp

        nv, nq = self.model.nv, self.model.nq
        k1, k2 = jax.random.split(rng)
        noise = self.reset_noise_scale
        qpos = jnp.asarray(self._init_qpos) + jax.random.uniform(
            k1, (nq,), minval=-noise, maxval=noise
        )
        if self.model.root_free:
            # noise lands on raw quat components; renormalize (MuJoCo does
            # the same via mj_normalizeQuat)
            quat = qpos[3:7] / jnp.sqrt(jnp.sum(qpos[3:7] ** 2) + 1e-24)
            qpos = jnp.concatenate([qpos[:3], quat, qpos[7:]])
        qvel = noise * jax.random.normal(k2, (nv,))
        return {"qpos": qpos, "qvel": qvel, "prev_x": qpos[0]}

    def transition(self, state, action, rng, params: Any = None):
        import jax

        q, qd = state["qpos"], state["qvel"]
        prev_x = q[0]

        def body(carry, _):
            q, qd = carry
            q, qd = self._dyn["step"](q, qd, action)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=self.frame_skip)
        return {"qpos": q, "qvel": qd, "prev_x": prev_x}

    #: fused-kernel engagement: "auto" (TPU backend), "off" (always vmap),
    #: "interpret" (Pallas interpreter — any backend; CPU mesh tests)
    fused_kernel_mode: str = "auto"

    def transition_batched(self, num_envs: int, sharding: Any = None):
        """Natively-batched transition: the fused Pallas substep kernel
        (ops/pallas_articulated.py) steps each device's shard as ONE program
        per 1024-env block — ~2x the vmapped XLA engine and ~30x faster to
        compile. Gating depends only on the backend and the per-shard block
        size; on a multi-device ``sharding`` the per-block ``pallas_call``
        is wrapped in ``shard_map`` over the env axis (a substep has no
        cross-env data, so each device steps its own blocks — SURVEY §5.8's
        single-program-multi-device model). Other backends / non-multiple
        batch sizes fall back to the vmapped XLA engine."""
        import jax

        from gymnasium_tpu.ops.pallas_articulated import BLOCK_ENVS

        mode = self.fused_kernel_mode
        if mode == "off":
            return None
        interpret = mode == "interpret"
        if not interpret and jax.default_backend() != "tpu":
            return None

        # number of shards along the env-batch axis (leading dim)
        env_axes: tuple = ()
        n_shards = 1
        if sharding is not None and getattr(sharding, "spec", None):
            first = sharding.spec[0]
            if first is not None:
                env_axes = first if isinstance(first, tuple) else (first,)
                n_shards = int(np.prod([sharding.mesh.shape[a] for a in env_axes]))
        if num_envs % (BLOCK_ENVS * n_shards) != 0:
            return None

        cache_key = (interpret,)
        if getattr(self, "_fused_cache", None) is None or self._fused_cache[0] != cache_key:
            from gymnasium_tpu.ops.pallas_articulated import make_fused_step

            self._fused_cache = (
                cache_key,
                make_fused_step(self.model, frame_skip=self.frame_skip, interpret=interpret),
            )
        fused = self._fused_cache[1]

        if n_shards > 1:
            try:
                from jax import shard_map
            except ImportError:  # older JAX
                from jax.experimental.shard_map import shard_map

            P = jax.sharding.PartitionSpec
            spec = P(env_axes if len(env_axes) > 1 else env_axes[0])
            kwargs = dict(
                mesh=sharding.mesh, in_specs=(spec, spec, spec), out_specs=(spec, spec)
            )
            # pallas_call does not participate in output-varying-mesh-axes
            # (vma/rep) inference — disable the check (kwarg name varies by
            # JAX version)
            for check_kw in ({"check_vma": False}, {"check_rep": False}, {}):
                try:
                    fused = shard_map(fused, **kwargs, **check_kw)
                    break
                except TypeError:
                    continue

        def step_batch(state, action, rng, params=None):
            q, qd = state["qpos"], state["qvel"]
            q_new, qd_new = fused(q, qd, action)
            return {"qpos": q_new, "qvel": qd_new, "prev_x": q[:, 0]}

        return step_batch

    def observation(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        return jnp.concatenate([state["qpos"][1:], state["qvel"]])

    def terminal(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        return jnp.zeros((), bool)
