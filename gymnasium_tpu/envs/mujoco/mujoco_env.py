"""MujocoEnv base: host shell over the autodiff articulated engine.

API parity with reference mujoco/mujoco_env.py:115-225 (``do_simulation``,
``set_state``/``get_state`` snapshots, frame_skip/dt metadata, ctrlrange
action spaces) with the MuJoCo C engine replaced by
gymnasium_tpu/physics/articulated.py. Correctness targets are
distributional (SURVEY.md §7 stage 9).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any

import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu import spaces
from gymnasium_tpu.physics.articulated import (
    ArticulatedModel,
    BodySpec,
    JointSpec,
    init_qpos as _init_qpos,
    make_dynamics,
)

__all__ = ["MujocoEnv", "load_model", "expected_frame_skip", "DEFAULT_SIZE"]

# default render-surface side (reference mujoco_env.py:18)
DEFAULT_SIZE = 480

_MODEL_DIR = os.path.join(os.path.dirname(__file__), "models")


def _resolve_xml(name: str) -> str:
    """Resolve an ``.xml`` model reference the way the reference's
    ``expand_model_path`` does (mujoco_env.py:33-43): absolute and ``~``
    paths as given, else cwd-relative, else the asset search path
    (``MJCF_ASSET_DIR`` env var, then the package model dir)."""
    path = os.path.expanduser(name)
    if os.path.isabs(path) and os.path.exists(path):
        return path
    if os.path.exists(path):
        return os.path.abspath(path)
    for base in (os.environ.get("MJCF_ASSET_DIR"), _MODEL_DIR):
        if base:
            candidate = os.path.join(base, name)
            if os.path.exists(candidate):
                return os.path.abspath(candidate)
    raise OSError(f"MJCF model file {name!r} does not exist")


@functools.lru_cache(maxsize=32)
def _compile_xml_model(path: str) -> tuple[ArticulatedModel, dict]:
    from gymnasium_tpu.envs.mujoco.mjcf import compile_mjcf

    return compile_mjcf(path)


def load_model(name: str) -> tuple[ArticulatedModel, dict]:
    """Load a compiled robot spec (see tools/extract_mujoco_models.py), or —
    for ``*.xml`` references — compile the MJCF on the fly through
    gymnasium_tpu.envs.mujoco.mjcf, which is what lets third-party
    ``MujocoEnv`` subclasses bring their own models (reference
    tests/envs/mujoco/test_mujoco_custom_env.py)."""
    if name.endswith(".xml"):
        # resolve BEFORE caching: relative references are cwd-dependent
        return _compile_xml_model(_resolve_xml(name))
    return _load_npz_model(name)


@functools.lru_cache(maxsize=32)
def _load_npz_model(name: str) -> tuple[ArticulatedModel, dict]:
    path = os.path.join(_MODEL_DIR, f"{name}.npz")
    data = np.load(path)
    meta = json.loads(bytes(data["meta_json"]).decode())
    model = ArticulatedModel(
        bodies=BodySpec(
            parent=data["bodies_parent"],
            pos=data["bodies_pos"],
            quat=data["bodies_quat"],
            mass=data["bodies_mass"],
            com=data["bodies_com"],
            inertia=data["bodies_inertia"],
            dof_start=data["bodies_dof_start"],
            dof_count=data["bodies_dof_count"],
        ),
        joints=JointSpec(
            body=data["joints_body"],
            jtype=data["joints_jtype"],
            axis=data["joints_axis"],
            anchor=data["joints_anchor"],
            damping=data["joints_damping"],
            limited=data["joints_limited"],
            lower=data["joints_lower"],
            upper=data["joints_upper"],
            stiffness=data["joints_stiffness"],
            armature=data["joints_armature"],
            ref=data["joints_ref"],
        ),
        contact_body=data["contact_body"],
        contact_pos=data["contact_pos"],
        contact_radius=data["contact_radius"],
        contact_stiffness=(
            data["contact_stiffness"] if "contact_stiffness" in data else 100000.0
        ),
        act_dof=data["act_dof"],
        act_gear=data["act_gear"],
        act_ctrlrange=data["act_ctrlrange"],
        gravity=float(data["gravity"]),
        timestep=float(data["timestep"]),
        fluid_density=float(data["fluid_density"]) if "fluid_density" in data else 0.0,
        fluid_viscosity=float(data["fluid_viscosity"]) if "fluid_viscosity" in data else 0.0,
        ground_z=float(data["ground_z"]) if "ground_z" in data else 0.0,
        root_free=bool(meta.get("free_root", False)),
        site_body=(
            data["site_body"] if "site_body" in data else np.zeros((0,), np.int32)
        ),
        site_pos=data["site_pos"] if "site_pos" in data else np.zeros((0, 3)),
    )
    return model, meta


@functools.lru_cache(maxsize=32)
def _compiled_step(name: str, frame_skip: int):
    """Jitted ``(q, qd, ctrl) -> (q, qd)`` shared across env instances."""
    import jax

    model, _ = load_model(name)
    dyn = make_dynamics(model)

    def run(q, qd, ctrl):
        def body(carry, _):
            q, qd = carry
            q, qd = dyn["step"](q, qd, ctrl)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=frame_skip)
        return q, qd

    # the auxiliary helpers run per host step (cfrc_ext, COM, rendering fk):
    # eager op-by-op dispatch made a Humanoid step ~1.8s — jit them once per
    # model, shared across env instances through this cache
    jdyn = dict(dyn)
    for key in ("fk", "contact_points", "contact_wrenches", "com_world", "limit_torques"):
        jdyn[key] = jax.jit(dyn[key])
    if len(model.site_body):
        import jax.numpy as jnp

        from gymnasium_tpu.physics.articulated import fk as _fk

        def site_xpos(q):
            R, p = _fk(model, q)
            sb = jnp.asarray(model.site_body)
            sp = jnp.asarray(model.site_pos)
            return p[sb] + jnp.einsum("nij,nj->ni", R[sb], sp)

        jdyn["site_xpos"] = jax.jit(site_xpos)
    return jax.jit(run), jdyn


def expected_frame_skip(name: str, target_dt: float) -> int:
    """frame_skip giving the requested env dt for a model's timestep."""
    model, _ = load_model(name)
    return max(int(round(target_dt / model.timestep)), 1)


class _MjDataShim:
    """Live qpos/qvel view matching MuJoCo's ``MjData`` attribute names."""

    def __init__(self, env: "MujocoEnv"):
        self._env = env

    @property
    def qpos(self) -> np.ndarray:
        return self._env.qpos

    @property
    def qvel(self) -> np.ndarray:
        return self._env.qvel

    @property
    def xipos(self) -> np.ndarray:
        """(nbody, 3) world COM positions, world row 0 zeroed (MuJoCo
        layout; consumed by the reference's ``mass_center`` helper,
        humanoid_v5.py:17-21)."""
        return np.vstack([np.zeros(3), self._env._body_com_positions()])

    @property
    def site_xpos(self) -> np.ndarray:
        """(nsite, 3) world site positions in document order (reference
        reads the IDP tip height via ``data.site_xpos[0][2]``,
        test_mujoco_v5.py:486-498)."""
        return self._env._site_positions()

    def body(self, name: str):
        """Named-body view with the world frame origin as ``xpos``
        (reference test_mujoco_v5.py:361 reads
        ``env.data.body("torso").xpos[0]``)."""
        import types

        idx = self._env.body_index(name)
        _, p = self._env._dyn["fk"](self._env.qpos)
        return types.SimpleNamespace(xpos=np.asarray(p[idx]))


class MujocoEnv(gym.Env[np.ndarray, np.ndarray]):
    """Base class for robots driven by the articulated engine."""

    model_name: str = ""
    frame_skip: int = 5
    # class-level declaration so `make(render_mode=...)` validates before
    # instantiation (reference ant_v5.py:219-226); __init__ rebuilds it with
    # the model-specific render_fps
    metadata = {"render_modes": ["human", "rgb_array", "depth_array", "rgbd_tuple"]}

    def __init__(
        self,
        model_name: str,
        frame_skip: int,
        observation_space: spaces.Space | None = None,
        render_mode: str | None = None,
        reset_noise_scale: float = 0.0,
        width: int = 480,
        height: int = 480,
        camera_id: int | None = None,
        camera_name: str | None = None,
        default_camera_config: dict[str, Any] | None = None,
        max_geom: int = 1000,
        visual_options: dict[int, bool] | None = None,
        **kwargs: Any,
    ):
        if model_name.endswith(".xml"):
            # pin relative/asset-dir references to their absolute path so
            # the per-model jit caches key on one canonical name
            model_name = _resolve_xml(model_name)
        self.model_name = model_name
        self.frame_skip = frame_skip
        self.model, self.meta = load_model(model_name)
        self._reset_noise_scale = reset_noise_scale
        self.render_mode = render_mode
        self._display = None
        # render surface configuration (reference mujoco_env.py:46-113);
        # camera_id/camera_name select among the model's fixed cameras in
        # MuJoCo — this engine has one free tracking camera, so they are
        # validated and recorded but both resolve to it
        assert camera_id is None or camera_name is None, (
            "camera_id and camera_name cannot both be supplied"
        )
        self.width = int(width)
        self.height = int(height)
        self.camera_id = camera_id
        self.camera_name = camera_name
        self._camera_config = dict(default_camera_config or {})
        self.max_geom = max_geom  # accepted for API parity; software
        self.visual_options = dict(visual_options or {})  # raster has no caps

        self._step_fn, self._dyn = _compiled_step(model_name, frame_skip)

        nv, nq = self.model.nv, self.model.nq
        # qpos0 = joint reference values (e.g. hopper rootz ref=1.25); for a
        # free root this includes the unit quaternion at [3:7]
        self.init_qpos = _init_qpos(self.model)
        self.init_qvel = np.zeros(nv)
        self.qpos = np.zeros(nq)
        self.qvel = np.zeros(nv)

        bounds = np.asarray(self.model.act_ctrlrange, dtype=np.float32)
        if bounds.size and np.isfinite(bounds).all():
            self.action_space = spaces.Box(low=bounds[:, 0], high=bounds[:, 1], dtype=np.float32)
        else:
            self.action_space = spaces.Box(-1.0, 1.0, (self.model.nu,), dtype=np.float32)
        if observation_space is not None:
            self.observation_space = observation_space

        self.metadata = {
            "render_modes": ["human", "rgb_array", "depth_array", "rgbd_tuple"],
            "render_fps": int(np.round(1.0 / self.dt)),
        }

        # renderer manager with per-mode viewers (overlays, live camera) —
        # reference mujoco_env.py:97 exposes the same attribute
        from gymnasium_tpu.envs.mujoco.rendering import MujocoRenderer

        self.mujoco_renderer = MujocoRenderer(self)

    @property
    def dt(self) -> float:
        """Env step duration: model timestep × frame_skip."""
        return self.model.timestep * self.frame_skip

    @property
    def data(self) -> "_MjDataShim":
        """MuJoCo-style ``data`` view (``data.qpos``/``data.qvel``) over the
        engine state, for reference-API compatibility (the reference's tests
        read ``env.data.qpos`` — tests/envs/mujoco/test_mujoco_v5.py:89)."""
        return _MjDataShim(self)

    # -- state -------------------------------------------------------------

    def set_state(self, qpos: np.ndarray, qvel: np.ndarray):
        """Overwrite the full physics state (reference mujoco_env.py:128)."""
        assert qpos.shape == (self.model.nq,) and qvel.shape == (self.model.nv,)
        qpos = np.asarray(qpos, dtype=np.float64).copy()
        if self.model.root_free:
            # normalize the root quaternion (MuJoCo's mj_normalizeQuat)
            qpos[3:7] /= np.linalg.norm(qpos[3:7]) + 1e-24
        self.qpos = qpos
        self.qvel = np.asarray(qvel, dtype=np.float64).copy()

    def get_state(self) -> tuple[np.ndarray, np.ndarray]:
        """Full physics snapshot."""
        return self.qpos.copy(), self.qvel.copy()

    def do_simulation(self, ctrl: np.ndarray, n_frames: int | None = None):
        """Advance the physics ``frame_skip`` substeps under ``ctrl``."""
        import jax

        # action-shape contract (reference mujoco_env.py:194-197)
        if np.asarray(ctrl).shape != (self.model.nu,):
            raise ValueError(
                f"Action dimension mismatch. Expected {(self.model.nu,)}, "
                f"found {np.asarray(ctrl).shape}"
            )
        q, qd = self._step_fn(self.qpos, self.qvel, np.asarray(ctrl, dtype=np.float64))
        # host mirrors stay float64 like MuJoCo's MjData (third-party envs
        # concatenate them directly into float64 observation spaces)
        self.qpos = np.asarray(q, dtype=np.float64)
        self.qvel = np.asarray(qd, dtype=np.float64)

    @property
    def cfrc_ext(self) -> np.ndarray:
        """Per-body external contact wrench ``[torque, force]`` (nbody, 6) —
        the engine's equivalent of MuJoCo's ``data.cfrc_ext`` (without the
        world row)."""
        return np.asarray(self._dyn["contact_wrenches"](self.qpos, self.qvel))

    def _site_positions(self) -> np.ndarray:
        """(nsite, 3) world site positions (MuJoCo ``data.site_xpos``)."""
        if "site_xpos" not in self._dyn:
            return np.zeros((0, 3))
        return np.asarray(self._dyn["site_xpos"](self.qpos))

    # -- kinematics helpers ------------------------------------------------

    def body_index(self, name: str) -> int:
        """Index of a named body."""
        return self.meta["body_names"].index(name)

    def body_xpos(self, name: str) -> np.ndarray:
        """World position of a named body's frame origin."""
        _, p = self._dyn["fk"](self.qpos)
        return np.asarray(p)[self.body_index(name)]

    def get_body_com(self, name: str) -> np.ndarray:
        """Cartesian position of a body FRAME (the reference's historical
        misnomer — mujoco_env.py:164 returns ``data.body(name).xpos``, not
        the COM). The free root's frame is ``qpos[:3]`` exactly."""
        index = self.body_index(name)
        if self.model.root_free and index == 0:
            return self.qpos[:3].copy()
        return self.body_xpos(name)

    def _body_com_positions(self) -> np.ndarray:
        """(nbody_without_world, 3) world center-of-mass of every body."""
        R, p = self._dyn["fk"](self.qpos)
        R, p = np.asarray(R, np.float64), np.asarray(p, np.float64)
        com = np.asarray(self.model.bodies.com, np.float64)
        return p + np.einsum("bij,bj->bi", R, com)

    def mass_center_xy(self) -> np.ndarray:
        """Whole-robot center of mass, xy — computed with the exact
        expression of the reference's ``mass_center`` helper
        (humanoid_v5.py:17-21) over the MuJoCo-layout shims, so external
        code using that helper sees bit-identical values."""
        masses = self.model.body_mass
        xipos = self.data.xipos
        return (np.einsum("b,bj->j", masses, xipos) / masses.sum())[0:2].copy()

    def state_vector(self) -> np.ndarray:
        """Concatenated (qpos, qvel)."""
        return np.concatenate([self.qpos, self.qvel])

    # -- reset -------------------------------------------------------------

    def reset(self, *, seed: int | None = None, options: dict[str, Any] | None = None):
        super().reset(seed=seed)
        obs = self.reset_model()
        info = self._get_reset_info()
        if self.render_mode == "human":
            self.render()
        return obs, info

    def reset_model(self) -> np.ndarray:
        """Set the post-reset physics state and return the observation —
        the reference's third-party-subclass hook (mujoco_env.py:145-150);
        the in-tree robots customize :meth:`_sample_initial_state` instead."""
        self.qpos, self.qvel = self._sample_initial_state()
        return self._get_obs()

    def _get_reset_info(self) -> dict[str, Any]:
        """Reset info hook under the reference's name (mujoco_env.py:152)."""
        return self._reset_info()

    def _sample_initial_state(self) -> tuple[np.ndarray, np.ndarray]:
        # uniform qpos AND qvel noise — the reference's most common scheme
        # (hopper_v5.py:329, walker2d_v5.py:329, swimmer_v5.py:278); robots
        # with gaussian qvel noise (half-cheetah, ant, IDP) override this
        noise = self._reset_noise_scale
        # uniform noise over ALL nq entries including raw quat components,
        # then normalized — exactly MuJoCo's behavior under v5 reset noise
        qpos = self.init_qpos + self.np_random.uniform(
            low=-noise, high=noise, size=self.model.nq
        )
        if self.model.root_free:
            qpos[3:7] /= np.linalg.norm(qpos[3:7]) + 1e-24
        qvel = self.init_qvel + self.np_random.uniform(
            low=-noise, high=noise, size=self.model.nv
        )
        return qpos, qvel

    def _reset_info(self) -> dict[str, Any]:
        return {}

    def _get_obs(self) -> np.ndarray:
        raise NotImplementedError

    # -- rendering ---------------------------------------------------------

    def render(self):
        if self.render_mode is None:
            gym.logger.warn(
                "You are calling render method without specifying any render mode."
            )
            return None
        return self.mujoco_renderer.render(self.render_mode)

    def _render_frame(self, depth: bool = False) -> np.ndarray:
        """3D software-rasterized frame of the current state (render3d.py —
        the OffScreenViewer-role renderer, reference mujoco_rendering.py:334);
        falls back to the schematic 2D side view for models compiled without
        render geoms. ``depth=True`` returns the (H, W) float32 z-buffer in
        camera-frame meters (reference ``render_mode="depth_array"``,
        ant_v5.py:223)."""
        if self.meta.get("render_geoms"):
            from gymnasium_tpu.envs.mujoco.render3d import render_robot

            return render_robot(
                self,
                self.width,
                self.height,
                camera_config=self._camera_config,
                depth=depth,
            )
        if depth:
            # schematic fallback has no 3D scene: flat far-plane buffer
            return np.full((self.height, self.width), 10.0, np.float32)
        return self._render_side_view(self.width, self.height)

    def _render_side_view(self, width: int = 480, height: int = 480) -> np.ndarray:
        """Schematic x-z side view of the contact spheres and body frames."""
        from gymnasium_tpu.utils.raster import Canvas

        canvas = Canvas(width, height, (240, 240, 245))
        R, p = self._dyn["fk"](self.qpos)
        p = np.asarray(p)
        scale = 100.0
        cx = width / 2 - p[0, 0] * scale
        ground_y = height * 0.8
        canvas.hline(ground_y, (60, 120, 60), 3)

        # links: line from each body to its parent
        for b in range(1, len(self.model.bodies.parent)):
            parent = int(self.model.bodies.parent[b])
            if parent < 0:
                continue
            canvas.line(
                (cx + p[parent, 0] * scale, ground_y - p[parent, 2] * scale),
                (cx + p[b, 0] * scale, ground_y - p[b, 2] * scale),
                (90, 90, 140),
                4,
            )
        # contact spheres
        pts = np.asarray(self._dyn["contact_points"](self.qpos))
        for k in range(len(pts)):
            canvas.circle(
                (cx + pts[k, 0] * scale, ground_y - pts[k, 2] * scale),
                max(self.model.contact_radius[k] * scale, 2),
                (200, 120, 90),
            )
        return canvas.rgb_array()

    def close(self):
        if getattr(self, "mujoco_renderer", None) is not None:
            self.mujoco_renderer.close()
        if self._display is not None:
            self._display.close()
            self._display = None
