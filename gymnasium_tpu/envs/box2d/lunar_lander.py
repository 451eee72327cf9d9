"""LunarLander: host env and JAX functional env over the shared rigid-body
dynamics (gymnasium_tpu/envs/dynamics/lunar_lander.py).

API parity with reference box2d/lunar_lander.py:1-884 (discrete + continuous
actions, wind, gravity kwarg). The native Box2D solver is replaced by the
pure-array contact model; correctness is held distributionally (SURVEY.md §7
stage 8), not bit-exact.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu import spaces
from gymnasium_tpu.envs.dynamics import lunar_lander as dyn
from gymnasium_tpu.functional import FuncEnv
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["LunarLander", "LunarLanderFunctional", "LunarLanderContinuousFunctional"]


def _wind_terms(np_random, wind_idx, torque_idx, params, enabled: bool):
    """The reference's deterministic-chaos wind model (lunar_lander.py:470)."""
    if not enabled:
        return np.zeros(2), wind_idx, torque_idx
    wind_mag = (
        math.tanh(math.sin(0.02 * wind_idx) + math.sin(math.pi * 0.01 * wind_idx))
        * params.wind_power
    )
    torque_mag = (
        math.tanh(math.sin(0.02 * torque_idx) + math.sin(math.pi * 0.01 * torque_idx))
        * params.turbulence_power
    )
    return np.array([wind_mag, torque_mag]), wind_idx + 1, torque_idx + 1


class LunarLander(gym.Env[np.ndarray, Any], EzPickle):
    """Rocket trajectory optimization onto the landing pad."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": dyn.FPS}

    def __init__(
        self,
        render_mode: str | None = None,
        continuous: bool = False,
        gravity: float = -10.0,
        enable_wind: bool = False,
        wind_power: float = 15.0,
        turbulence_power: float = 1.5,
    ):
        EzPickle.__init__(
            self,
            render_mode,
            continuous,
            gravity,
            enable_wind,
            wind_power,
            turbulence_power,
        )
        assert -12.0 < gravity and gravity < 0.0, f"gravity (current value: {gravity}) must be between -12 and 0"
        if 0.0 > wind_power or wind_power > 20.0:
            gym.logger.warn(f"wind_power value is recommended to be between 0.0 and 20.0, (current value: {wind_power})")
        if 0.0 > turbulence_power or turbulence_power > 2.0:
            gym.logger.warn(f"turbulence_power value is recommended to be between 0.0 and 2.0, (current value: {turbulence_power})")

        self.continuous = continuous
        self.gravity = gravity
        self.enable_wind = enable_wind
        self.params = dyn.LunarParams(
            gravity=gravity, wind_power=wind_power, turbulence_power=turbulence_power
        )
        self.render_mode = render_mode
        self._display = None

        low = np.array([-2.5, -2.5, -10.0, -10.0, -2 * math.pi, -10.0, -0.0, -0.0], dtype=np.float32)
        high = np.array([2.5, 2.5, 10.0, 10.0, 2 * math.pi, 10.0, 1.0, 1.0], dtype=np.float32)
        self.observation_space = spaces.Box(low, high, dtype=np.float32)
        if self.continuous:
            self.action_space = spaces.Box(-1, +1, (2,), dtype=np.float32)
        else:
            self.action_space = spaces.Discrete(4)

        self.state: dict | None = None
        self.wind_idx = 0
        self.torque_idx = 0

    def reset(self, *, seed: int | None = None, options: dict[str, Any] | None = None):
        super().reset(seed=seed)
        terrain_u = self.np_random.uniform(0, 1, size=(dyn.CHUNKS + 1,))
        force_u = self.np_random.uniform(-1, 1, size=(2,))
        self.state = dyn.initial_state(np, terrain_u[None], force_u[None], self.params)
        self.wind_idx = int(self.np_random.integers(-9999, 9999))
        self.torque_idx = int(self.np_random.integers(-9999, 9999))

        obs = dyn.observe(
            np, self.state["body"], self.state["leg1"], self.state["leg2"]
        )[0].astype(np.float32)
        if self.render_mode == "human":
            self.render()
        return obs, {}

    def step(self, action):
        assert self.state is not None, "You forgot to call reset()"
        if self.continuous:
            action = np.clip(np.asarray(action, dtype=np.float64), -1, +1)[None]
        else:
            assert self.action_space.contains(action), f"{action!r} ({type(action)}) invalid "
            action = np.asarray([action])

        dispersion = self.np_random.uniform(-1.0, 1.0, size=(1, 2))
        wind, self.wind_idx, self.torque_idx = _wind_terms(
            self.np_random, self.wind_idx, self.torque_idx, self.params, self.enable_wind
        )
        self.state = dyn.full_step(
            np, self.state, action, dispersion, wind[None], self.params, self.continuous
        )
        obs = dyn.observe(
            np, self.state["body"], self.state["leg1"], self.state["leg2"]
        )[0].astype(np.float32)
        reward = float(self.state["r"][0])
        terminated = bool(self.state["done"][0])
        if self.render_mode == "human":
            self.render()
        return obs, reward, terminated, False, {}

    def render(self):
        if self.render_mode is None:
            gym.logger.warn(
                "You are calling render method without specifying any render mode."
            )
            return None
        frame = _render_lander(self.state, self.params)
        if self.render_mode == "human":
            if self._display is None:
                from gymnasium_tpu.utils.human_display import HumanDisplay

                self._display = HumanDisplay(
                    dyn.VIEWPORT_W, dyn.VIEWPORT_H, self.metadata["render_fps"], "LunarLander"
                )
            self._display.show(frame)
            return None
        return frame

    def close(self):
        if self._display is not None:
            self._display.close()
            self._display = None


def _render_lander(state, params, width=dyn.VIEWPORT_W, height=dyn.VIEWPORT_H):
    """Rasterize terrain + lander."""
    from gymnasium_tpu.utils.raster import Canvas

    canvas = Canvas(width, height, (0, 0, 0))
    scale = dyn.SCALE
    terrain = np.asarray(state["terrain"])[0]
    xs = np.linspace(0, dyn.W, dyn.CHUNKS)
    pts = [(x * scale, height - h * scale) for x, h in zip(xs, terrain)]
    ground = pts + [(width, height), (0, height)]
    canvas.polygon(ground, (255, 255, 255))

    bodies = np.asarray(state["body"])[0]
    hx, hy, angle = bodies[0, 0], bodies[0, 1], bodies[0, 2]
    c, s = math.cos(angle), math.sin(angle)
    # hull vertices are origin-relative; the state row carries the hull COM
    x, y = hx + dyn._HULL_CY * s, hy - dyn._HULL_CY * c
    poly = []
    for bx, by in dyn.LANDER_POLY:
        bx, by = bx / scale, by / scale
        rx = bx * c - by * s
        ry = bx * s + by * c
        poly.append(((x + rx) * scale, height - (y + ry) * scale))
    canvas.polygon(poly, (128, 102, 230))
    for leg in bodies[1:]:
        lx, ly, la = leg[0], leg[1], leg[2]
        lc, ls = math.cos(la), math.sin(la)
        corners = []
        for bx, by in [(-dyn._LEG_HALF_W, -dyn._LEG_HALF_H), (dyn._LEG_HALF_W, -dyn._LEG_HALF_H),
                       (dyn._LEG_HALF_W, dyn._LEG_HALF_H), (-dyn._LEG_HALF_W, dyn._LEG_HALF_H)]:
            rx = bx * lc - by * ls
            ry = bx * ls + by * lc
            corners.append(((lx + rx) * scale, height - (ly + ry) * scale))
        canvas.polygon(corners, (77, 77, 128))
    return canvas.rgb_array()


class LunarLanderFunctional(FuncEnv):
    """Stateless LunarLander over the shared dynamics (discrete actions)."""

    continuous = False
    rng_hooks = frozenset({"initial", "transition"})

    def __init__(self, options: dict[str, Any] | None = None):
        options = dict(options or {})
        gravity = options.pop("gravity", -10.0)
        self.enable_wind = bool(options.pop("enable_wind", False))
        wind_power = options.pop("wind_power", 15.0)
        turbulence_power = options.pop("turbulence_power", 1.5)
        if "continuous" in options:
            self.continuous = bool(options.pop("continuous"))
        super().__init__(options)
        self._default_params = dyn.LunarParams(
            gravity=gravity, wind_power=wind_power, turbulence_power=turbulence_power
        )

        low = np.array([-2.5, -2.5, -10.0, -10.0, -2 * math.pi, -10.0, -0.0, -0.0], dtype=np.float32)
        high = np.array([2.5, 2.5, 10.0, 10.0, 2 * math.pi, 10.0, 1.0, 1.0], dtype=np.float32)
        self.observation_space = spaces.Box(low, high, dtype=np.float32)
        if self.continuous:
            self.action_space = spaces.Box(-1, +1, (2,), dtype=np.float32)
        else:
            self.action_space = spaces.Discrete(4)

    def get_default_params(self, **kwargs: Any) -> dyn.LunarParams:
        return self._default_params._replace(**kwargs)

    def initial(self, rng, params: dyn.LunarParams | None = None):
        import jax
        import jax.numpy as jnp

        params = params or self._default_params
        k_terrain, k_force = jax.random.split(rng)
        terrain_u = jax.random.uniform(k_terrain, (1, dyn.CHUNKS + 1))
        force_u = jax.random.uniform(k_force, (1, 2), minval=-1.0, maxval=1.0)
        state = dyn.initial_state(jnp, terrain_u, force_u, params)
        # strip the length-1 batch axis: hooks are per-env and get vmapped
        return jax.tree_util.tree_map(lambda v: v[0], state)

    def transition(self, state, action, rng, params: dyn.LunarParams | None = None):
        import jax
        import jax.numpy as jnp

        params = params or self._default_params
        k_disp, k_wind = jax.random.split(rng)
        dispersion = jax.random.uniform(k_disp, (2,), minval=-1.0, maxval=1.0)
        if self.enable_wind:
            # stochastic wind stand-in for the reference's chaotic index walk
            wind = jax.random.uniform(k_wind, (2,), minval=-1.0, maxval=1.0) * jnp.asarray(
                [params.wind_power, params.turbulence_power]
            )
        else:
            wind = jnp.zeros(2)
        if self.continuous:
            action = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
        return dyn.full_step(jnp, state, action, dispersion, wind, params, self.continuous)

    #: fused-kernel engagement: "auto" (TPU backend), "off" (always vmap),
    #: "interpret" (Pallas interpreter — any backend; CPU mesh tests)
    fused_kernel_mode: str = "auto"

    def _get_fused(self, num_envs: int, sharding: Any = None):
        """The fused Pallas planar stepper for this batch shape, or None
        when it cannot engage (non-TPU backend, non-multiple batch)."""
        import jax

        from gymnasium_tpu.ops.pallas_planar import BLOCK_ENVS

        mode = self.fused_kernel_mode
        if mode == "off":
            return None
        interpret = mode == "interpret"
        if not interpret and jax.default_backend() != "tpu":
            return None

        env_axes: tuple = ()
        n_shards = 1
        if sharding is not None and getattr(sharding, "spec", None):
            first = sharding.spec[0]
            if first is not None:
                env_axes = first if isinstance(first, tuple) else (first,)
                n_shards = int(np.prod([sharding.mesh.shape[a] for a in env_axes]))
        if num_envs % (BLOCK_ENVS * n_shards) != 0:
            return None

        cache_key = (interpret, float(self._default_params.gravity))
        if getattr(self, "_fused_cache", None) is None or self._fused_cache[0] != cache_key:
            from gymnasium_tpu.ops.pallas_planar import make_fused_planar_step

            world = dyn._lander_world(float(self._default_params.gravity))
            self._fused_cache = (
                cache_key,
                make_fused_planar_step(
                    world,
                    dyn.CHUNKS,
                    dyn.W / (dyn.CHUNKS - 1),
                    dyn._MOTOR_SPEED,
                    dyn._MOTOR_TORQUE,
                    substeps=dyn._SUBSTEPS,
                    interpret=interpret,
                ),
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
                mesh=sharding.mesh,
                in_specs=(spec,) * 5,
                out_specs=(spec,) * 4,
            )
            for check_kw in ({"check_vma": False}, {"check_rep": False}, {}):
                try:
                    fused = shard_map(fused, **kwargs, **check_kw)
                    break
                except TypeError:
                    continue
        return fused

    def initial_batched(self, rng, num_envs: int, params: dyn.LunarParams | None = None):
        """Natively-batched reset: fused draws + the Pallas kernel for the
        reference's settle tick. Folded into EVERY autoreset step by
        make_autoreset_step, so it must not fall back to the ~10k-op
        vmapped solver on the hot path (doing so capped the fused lander
        at 0.4M env-steps/s — the reset branch dominated the program)."""
        import jax
        import jax.numpy as jnp

        p = params or self._default_params
        fused = self._get_fused(num_envs, getattr(self, "_last_sharding", None))
        if fused is None:
            keys = jax.random.split(rng, num_envs)
            return jax.vmap(self.initial, in_axes=(0, None))(keys, params)
        k_terrain, k_force = jax.random.split(rng)
        terrain_u = jax.random.uniform(k_terrain, (num_envs, dyn.CHUNKS + 1))
        force_u = jax.random.uniform(k_force, (num_envs, 2), minval=-1.0, maxval=1.0)
        state = dyn.initial_state_pre(jnp, terrain_u, force_u, p)
        external = jnp.zeros((num_envs, 3, 3))
        bodies, jimp, cimp, flags = fused(
            state["body"], external, state["terrain"], state["jimp"], state["cimp"]
        )
        return dyn.finish_step(jnp, state, bodies, (jimp, cimp), flags, 0.0, 0.0, p)

    def transition_batched(self, num_envs: int, sharding: Any = None):
        """Natively-batched transition: the fused Pallas planar kernel
        (ops/pallas_planar.py) runs both solver substeps — warm-started
        sequential impulses + NGS position pass — as ONE program per
        1024-env block; engines/wind/reward stay in plain XLA (≈50 ops).
        The vmapped XLA solver ran the same math as ~10k tiny per-op
        dispatches (206K env-steps/s, BENCH_r04 vs_baseline 0.0041). Same
        gating scheme as MujocoFuncEnv.transition_batched."""
        import jax

        fused = self._get_fused(num_envs, sharding)
        if fused is None:
            return None
        self._last_sharding = sharding

        def step_batch(state, action, rng, params=None):
            import jax.numpy as jnp

            p = params or self._default_params
            k_disp, k_wind = jax.random.split(rng)
            dispersion = jax.random.uniform(
                k_disp, (num_envs, 2), minval=-1.0, maxval=1.0
            )
            if self.enable_wind:
                wind = jax.random.uniform(
                    k_wind, (num_envs, 2), minval=-1.0, maxval=1.0
                ) * jnp.asarray([p.wind_power, p.turbulence_power])
            else:
                wind = jnp.zeros((num_envs, 2))
            if self.continuous:
                action = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
            external, m_power, s_power = dyn.engine_external(
                jnp, state, action, dispersion, wind, p, self.continuous
            )
            bodies, jimp, cimp, flags = fused(
                state["body"], external, state["terrain"], state["jimp"], state["cimp"]
            )
            return dyn.finish_step(
                jnp, state, bodies, (jimp, cimp), flags, m_power, s_power, p
            )

        return step_batch

    def observation(self, state, rng, params: dyn.LunarParams | None = None):
        import jax.numpy as jnp

        return dyn.observe(jnp, state["body"], state["leg1"], state["leg2"]).astype(jnp.float32)

    def reward(self, state, action, next_state, rng, params: dyn.LunarParams | None = None):
        return next_state["r"]

    def terminal(self, state, rng, params: dyn.LunarParams | None = None):
        return state["done"]


class LunarLanderContinuousFunctional(LunarLanderFunctional):
    """Continuous-action LunarLander."""

    continuous = True


class LunarLanderContinuous:
    """Construction guard (reference box2d/lunar_lander.py:872-879): the
    continuous variant is made via ``gym.make("LunarLander-v3", continuous=True)``."""

    def __init__(self):
        raise gym.error.Error(
            "Error initializing LunarLanderContinuous Environment.\n"
            "Currently, we do not support initializing this mode of environment by calling the class directly.\n"
            "To use this environment, instead create it by specifying the continuous keyword in gym.make, i.e.\n"
            'gym.make("LunarLander-v3", continuous=True)'
        )


def heuristic(env, s):
    """PD landing controller over the 8-dim lander state — the published
    Gym/Gymnasium demonstration control law (role of reference
    lunar_lander.py:793), gains tuned for this engine's dynamics.

    Steers the target attitude toward the pad from horizontal offset and
    speed, holds a descent profile proportional to the offset, and after leg
    contact only brakes the vertical speed.
    """
    import numpy as np

    angle_target = float(np.clip(0.5 * s[0] + 1.0 * s[2], -0.4, 0.4))
    hover_target = 0.55 * abs(float(s[0]))

    angle_cmd = (angle_target - float(s[4])) * 0.5 - float(s[5]) * 1.0
    hover_cmd = (hover_target - float(s[1])) * 0.5 - float(s[3]) * 0.5
    if s[6] or s[7]:  # a leg touched down: just kill vertical speed
        angle_cmd = 0.0
        hover_cmd = -float(s[3]) * 0.5

    if env.unwrapped.continuous:
        return np.clip(
            np.array([hover_cmd * 20 - 1, -angle_cmd * 20]), -1.0, 1.0
        ).astype(np.float32)
    if hover_cmd > abs(angle_cmd) and hover_cmd > 0.05:
        return 2  # main engine
    if angle_cmd < -0.05:
        return 3  # right engine
    if angle_cmd > 0.05:
        return 1  # left engine
    return 0


def demo_heuristic_lander(env, seed=None, render=False):
    """Roll one episode under :func:`heuristic`; returns the total reward
    (role of reference lunar_lander.py:755)."""
    total_reward = 0.0
    s, _ = env.reset(seed=seed)
    while True:
        s, r, terminated, truncated, _ = env.step(heuristic(env, s))
        total_reward += float(r)
        if render:
            env.render()
        if terminated or truncated:
            break
    if render:
        env.close()
    return total_reward


__all__ += ["heuristic", "demo_heuristic_lander"]
