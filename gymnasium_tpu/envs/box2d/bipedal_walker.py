"""BipedalWalker: 4-joint articulated walker on the jittable planar engine.

API parity with reference box2d/bipedal_walker.py:1-877 (normal + hardcore
terrain, 24-dim observation with 10 lidar readings, torque-controlled hips
and knees). The Box2D C++ solver is replaced by
gymnasium_tpu/physics/planar.py (sequential impulses, fixed iteration
counts); correctness is distributional.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu import spaces
from gymnasium_tpu.functional import FuncEnv
from gymnasium_tpu.physics.planar import (
    BodySpec,
    ContactSpec,
    JointSpec,
    PlanarWorld,
    world_step,
)
from gymnasium_tpu.utils.ezpickle import EzPickle

__all__ = ["BipedalWalker", "BipedalWalkerFunctional"]

FPS = 50
SCALE = 30.0

MOTORS_TORQUE = 80.0
SPEED_HIP = 4.0
SPEED_KNEE = 6.0
LIDAR_RANGE = 160 / SCALE

INITIAL_RANDOM = 5.0

HULL_POLY = [(-30, +9), (+6, +9), (+34, +1), (+34, -8), (-30, -8)]
LEG_DOWN = -8 / SCALE
LEG_W, LEG_H = 8 / SCALE, 34 / SCALE

VIEWPORT_W = 600
VIEWPORT_H = 400

TERRAIN_STEP = 14 / SCALE
TERRAIN_LENGTH = 200
TERRAIN_HEIGHT = VIEWPORT_H / SCALE / 4
TERRAIN_GRASS = 10
TERRAIN_STARTPAD = 20
FRICTION = 2.5

N_LIDAR = 10
_LIDAR_SAMPLES = 24  # ray-march resolution against the heightfield


def _poly_props(poly_px, density):
    """mass, centroid, inertia-about-centroid of a polygon body."""
    pts = np.asarray(poly_px, dtype=np.float64) / SCALE
    x, y = pts[:, 0], pts[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y1 - x1 * y
    area = 0.5 * np.sum(cross)
    cx = np.sum((x + x1) * cross) / (6 * area)
    cy = np.sum((y + y1) * cross) / (6 * area)
    i_origin = np.sum(cross * (x * x + x * x1 + x1 * x1 + y * y + y * y1 + y1 * y1)) / 12.0
    area = abs(area)
    mass = density * area
    inertia = density * abs(i_origin) - mass * (cx * cx + cy * cy)
    return mass, (cx, cy), inertia


_HULL_MASS, _HULL_COM, _HULL_I = _poly_props(HULL_POLY, 5.0)


def _box_props(w, h, density):
    mass = density * w * h
    inertia = mass * (w * w + h * h) / 12.0
    return mass, inertia


_THIGH_MASS, _THIGH_I = _box_props(LEG_W, LEG_H, 1.0)
_SHANK_MASS, _SHANK_I = _box_props(0.8 * LEG_W, LEG_H, 1.0)

# Hip anchor relative to the hull's center of mass.
_HIP_ANCHOR_HULL = (0.0 - _HULL_COM[0], LEG_DOWN - _HULL_COM[1])


def build_world(dt_substeps: int = 4, iters: int = 12) -> PlanarWorld:
    """The 5-body walker world: hull, thigh1, shank1, thigh2, shank2."""
    inv_mass = np.array(
        [1 / _HULL_MASS, 1 / _THIGH_MASS, 1 / _SHANK_MASS, 1 / _THIGH_MASS, 1 / _SHANK_MASS]
    )
    inv_inertia = np.array(
        [1 / _HULL_I, 1 / _THIGH_I, 1 / _SHANK_I, 1 / _THIGH_I, 1 / _SHANK_I]
    )
    bodies = BodySpec(inv_mass=inv_mass, inv_inertia=inv_inertia)

    joints = JointSpec(
        body_a=np.array([0, 1, 0, 3]),
        body_b=np.array([1, 2, 3, 4]),
        anchor_a=np.array(
            [
                [_HIP_ANCHOR_HULL[0], _HIP_ANCHOR_HULL[1]],
                [0.0, -LEG_H / 2],
                [_HIP_ANCHOR_HULL[0], _HIP_ANCHOR_HULL[1]],
                [0.0, -LEG_H / 2],
            ]
        ),
        anchor_b=np.array(
            [[0.0, LEG_H / 2], [0.0, LEG_H / 2], [0.0, LEG_H / 2], [0.0, LEG_H / 2]]
        ),
        lower=np.array([-0.8, -1.6, -0.8, -1.6]),
        upper=np.array([1.1, -0.1, 1.1, -0.1]),
        ref_angle=np.zeros(4),
    )

    # Probes: shank feet (leg ground contact), shank knee-end corners (in
    # Box2D the whole leg box collides — without these a backward-tucking
    # shank swings THROUGH the ground and the walker collapses into a fold
    # the real engine geometrically forbids), hull corners (crash), then
    # thigh corners: a split-sitting walker rests its folded back THIGH on
    # the ground (reference LEG_FD is a full collidable box) — without
    # thigh support the hull rolls over backward past the stable sit the
    # real engine reaches. Appended last so the flag indices above stay put.
    contacts = ContactSpec(
        body=np.array([2, 2, 4, 4, 2, 2, 4, 4, 0, 0, 0, 1, 1, 1, 1, 3, 3, 3, 3]),
        point=np.array(
            [
                [-0.4 * LEG_W, -LEG_H / 2],
                [+0.4 * LEG_W, -LEG_H / 2],
                [-0.4 * LEG_W, -LEG_H / 2],
                [+0.4 * LEG_W, -LEG_H / 2],
                [-0.4 * LEG_W, +LEG_H / 2],
                [+0.4 * LEG_W, +LEG_H / 2],
                [-0.4 * LEG_W, +LEG_H / 2],
                [+0.4 * LEG_W, +LEG_H / 2],
                [-30 / SCALE - _HULL_COM[0], -8 / SCALE - _HULL_COM[1]],
                [+34 / SCALE - _HULL_COM[0], -8 / SCALE - _HULL_COM[1]],
                [+6 / SCALE - _HULL_COM[0], +9 / SCALE - _HULL_COM[1]],
                [-LEG_W / 2, -LEG_H / 2],
                [+LEG_W / 2, -LEG_H / 2],
                [-LEG_W / 2, +LEG_H / 2],
                [+LEG_W / 2, +LEG_H / 2],
                [-LEG_W / 2, -LEG_H / 2],
                [+LEG_W / 2, -LEG_H / 2],
                [-LEG_W / 2, +LEG_H / 2],
                [+LEG_W / 2, +LEG_H / 2],
            ]
        ),
        # Box2D mixes contact friction as sqrt(fixture_a * fixture_b): the
        # terrain carries FRICTION=2.5 but the leg fixtures use the default
        # 0.2 and the hull 0.1 (reference bipedal_walker.py:55-80) — feet
        # grip at 0.707, not 2.5. Full-strength feet pinned the walker into
        # a static sit; the reference's surviving mode is a forward skid.
        # Knee-end probes (4-7) are frictionless: they exist only as a
        # geometric guard against the shank folding through the terrain —
        # in Box2D that corner contact is a transient manifold point, and
        # giving the persistent probe tangential grip rectified random
        # paddling into a -3 mm/step backward skid (measured vs the real
        # engine's +0.8 mm forward drift; the x<0 crash line then killed
        # every surviving episode around step ~700).
        friction=np.array(
            [math.sqrt(0.2 * FRICTION)] * 4
            + [0.0] * 4
            + [math.sqrt(0.1 * FRICTION)] * 3
            + [math.sqrt(0.2 * FRICTION)] * 8
        ),
    )
    return PlanarWorld(
        bodies,
        joints,
        contacts,
        gravity=-10.0,
        dt=1.0 / FPS / dt_substeps,
        velocity_iterations=iters,
    )


# 12 velocity / 8 position iterations: the reference steps Box2D with
# 180/60 (world.Step(1/FPS, 6*30, 2*30)); at 6/4 a loaded knee crept
# ~0.05 rad/frame through its hard limit (the split-sit collapse), at 12/8
# the limit holds and the zero-action fall time lands at 90-100 frames vs
# the reference's 114.
#
# joint_correction_clamp=0.2: Box2D-style bounded position sub-pulls
# (physics/planar.py) — measured neutral-positive on random-policy survival
# (453 -> 456 mean steps, n=64, horizon 1600; reference: 619).
#
# Round-5 survival-parity investigation (the remaining ~26% episode-length
# deficit; reference tests/envs: random-policy distribution gates pass,
# KS p=0.21, mean gap 1.46 SE):
# - Death-cause census (n=64): all terminations are hull-contact in both
#   engines; ours cluster at mean t=70 vs the reference's 104, and 25% of
#   episodes reach the 1600-step horizon vs the reference's 34%.
# - Matched-state zero-action traces (both engines force-set to the
#   creation pose): both reach the same deep crouch; divergence appears
#   only under ACTIVE motor commands.
# - Per-joint motor-response probes from the natural post-reset state
#   (constant single-joint commands, obs traces vs the live engine): the
#   real engine straightens a LOADED knee from -0.88 to -0.02 rad in 4
#   frames (full commanded SPEED_KNEE); ours moves ~40% of that. The
#   load path motor -> thigh -> hip point constraint -> hull converges
#   slower in 4x12 cold-started Gauss-Seidel iterations than in Box2D's
#   180 warm-started ones. Candidate fixes measured and rejected at
#   n=64/h=1600: intra-tick joint warm start (389), cross-tick joint warm
#   start (282-458, round 4), substeps=1 with vi=30/pi=15 (no change),
#   knee-probe friction (no change).
_WORLD = build_world()._replace(position_iterations=8, joint_correction_clamp=0.2)
_SUBSTEPS = 4

_LEG_CONTACT_IDX = [(0, 1), (2, 3)]  # foot probe indices per leg
_HULL_CONTACT_IDX = [8, 9, 10]


def generate_terrain(xp, uniform_steps, hardcore: bool = False, obstacle_draws=None):
    """Heightfield of TERRAIN_LENGTH steps.

    Normal mode mirrors the reference's smoothed random walk
    (bipedal_walker.py GRASS state). ``uniform_steps``: (..., TERRAIN_LENGTH)
    uniform(-1,1) draws. Hardcore overlays stumps/stairs/pits from
    ``obstacle_draws`` (uniform(0,1), shape (..., TERRAIN_LENGTH)).
    """
    L = TERRAIN_LENGTH
    y = TERRAIN_HEIGHT
    velocity = 0.0
    heights = []
    # The random walk is inherently sequential; done in numpy at reset time
    # (host) or via lax.scan-compatible arithmetic below.
    if xp is np:
        u = np.asarray(uniform_steps)
        out = np.zeros(u.shape[:-1] + (L,))
        y_arr = np.full(u.shape[:-1], TERRAIN_HEIGHT)
        v_arr = np.zeros(u.shape[:-1])
        for i in range(L):
            v_arr = 0.8 * v_arr + 0.01 * np.sign(TERRAIN_HEIGHT - y_arr)
            v_arr = v_arr + np.where(i > TERRAIN_STARTPAD, u[..., i] / SCALE, 0.0)
            y_arr = y_arr + v_arr
            out[..., i] = y_arr
    else:
        import jax

        def scan_body(carry, u_i_and_idx):
            y_c, v_c = carry
            u_i, idx = u_i_and_idx
            v_c = 0.8 * v_c + 0.01 * xp.sign(TERRAIN_HEIGHT - y_c)
            v_c = v_c + xp.where(idx > TERRAIN_STARTPAD, u_i / SCALE, 0.0)
            y_c = y_c + v_c
            return (y_c, v_c), y_c

        idxs = xp.arange(L)
        (_, _), out = jax.lax.scan(
            scan_body,
            (xp.asarray(TERRAIN_HEIGHT), xp.asarray(0.0)),
            (uniform_steps, idxs),
        )

    if hardcore and obstacle_draws is not None:
        out = _overlay_obstacles(xp, out, obstacle_draws)
    return out


def _overlay_obstacles(xp, heights, draws):
    """Stumps / stairs / pits as heightfield deltas, placed every ~15 steps
    past the start pad (heightfield approximation of the reference's
    polygon obstacles)."""
    L = TERRAIN_LENGTH
    idx = xp.arange(L)
    out = heights
    for start in range(TERRAIN_STARTPAD + 10, L - 10, 15):
        d_type = draws[..., start] if draws.ndim == heights.ndim else draws[start]
        d_size = draws[..., start + 1] if draws.ndim == heights.ndim else draws[start + 1]
        # type: <0.33 stump, <0.66 stair, else pit
        stump_h = (1.0 + 2.0 * d_size) * TERRAIN_STEP
        in_window = (idx >= start) & (idx < start + 2)
        stair_window = (idx >= start) & (idx < start + 6)
        stair_step = xp.clip((idx - start) // 2, 0, 2)
        delta = xp.where(
            d_type < 0.33,
            xp.where(in_window, stump_h, 0.0),
            xp.where(
                d_type < 0.66,
                xp.where(stair_window, stair_step * TERRAIN_STEP, 0.0),
                xp.where(in_window, -(2.0 + 2.0 * d_size) * TERRAIN_STEP, 0.0),
            ),
        )
        out = out + delta
    return out


def ground_height_fn(xp, terrain):
    """Heightfield lookup ``f(x) -> y`` over the walker terrain."""

    def f(x):
        xc = xp.clip(x / TERRAIN_STEP, 0.0, TERRAIN_LENGTH - 1 - 1e-6)
        i0 = xp.floor(xc).astype("int32")
        frac = xc - i0
        if terrain.ndim == 1:
            h0 = terrain[i0]
            h1 = terrain[xp.minimum(i0 + 1, TERRAIN_LENGTH - 1)]
        else:
            h0 = xp.take_along_axis(terrain, i0[..., None], axis=-1)[..., 0]
            h1 = xp.take_along_axis(
                terrain, xp.minimum(i0 + 1, TERRAIN_LENGTH - 1)[..., None], axis=-1
            )[..., 0]
        return h0 + (h1 - h0) * frac

    return f


def initial_bodies(xp, batch_shape=()):
    """The reference's CREATION pose, replayed through our solver.

    Box2D creates the walker standing with straight legs at ±0.05 rad and
    the hip joints 0.53 m violated (box2d/bipedal_walker.py:449-506): the
    position solver snaps the legs up to the hull, the assembly free-falls
    ~0.5 m, and the impact buckles the knees into the low crouch every
    episode starts from. Replaying the same creation state through this
    engine reproduces the crash-time distribution (zero-action death at
    ~90-100 frames vs the reference's 114; random-policy crash cluster
    44-110 in both). Earlier rounds pre-assembled a hand-tuned crouch
    instead — that skipped the assembly transient and parked every episode
    in a backward-drifting sit the real engine never visits."""
    init_x = TERRAIN_STEP * TERRAIN_STARTPAD / 2
    init_y = TERRAIN_HEIGHT + 2 * LEG_H
    hull = [init_x + _HULL_COM[0], init_y + _HULL_COM[1], 0.0, 0.0, 0.0, 0.0]
    rows = [hull]
    for ang in (-0.05, 0.05):  # reference creation order: leg i=-1 then +1
        thigh_y = init_y - LEG_H / 2 - LEG_DOWN
        shank_y = init_y - LEG_H * 3 / 2 - LEG_DOWN
        rows += [
            [init_x, thigh_y, ang, 0, 0, 0],
            [init_x, shank_y, ang, 0, 0, 0],
        ]
    base = xp.asarray(rows)
    if batch_shape:
        base = xp.broadcast_to(base, batch_shape + base.shape)
    return base


def lidar_scan(xp, hull_pos, terrain):
    """10 ray fractions against the heightfield (fixed-sample ray march)."""
    gh = ground_height_fn(xp, terrain)
    readings = []
    for i in range(N_LIDAR):
        dx = math.sin(1.5 * i / 10.0) * LIDAR_RANGE
        dy = -math.cos(1.5 * i / 10.0) * LIDAR_RANGE
        ts = np.linspace(0.0, 1.0, _LIDAR_SAMPLES)
        hit_frac = xp.ones_like(hull_pos[..., 0])
        # march from far to near so nearer hits overwrite
        for t in ts[::-1]:
            px = hull_pos[..., 0] + dx * t
            py = hull_pos[..., 1] + dy * t
            below = py <= gh(px)
            hit_frac = xp.where(below, t, hit_frac)
        readings.append(hit_frac)
    return xp.stack(readings, axis=-1)


def observe_state(xp, state, leg1=None, leg2=None):
    """The 24-dim observation of a state dict (without advancing physics).

    Leg contact flags may be passed from the solver; otherwise approximated
    by foot height against the terrain.
    """
    bodies = state["bodies"]
    terrain = state["terrain"]
    hull = bodies[..., 0, :]
    angle = hull[..., 2]
    idx = [1, 2, 3, 4]
    j_angles = bodies[..., idx, 2] - xp.stack(
        [angle, bodies[..., 1, 2], angle, bodies[..., 3, 2]], axis=-1
    )
    j_speeds = bodies[..., idx, 5] - xp.stack(
        [hull[..., 5], bodies[..., 1, 5], hull[..., 5], bodies[..., 3, 5]], axis=-1
    )
    hull_x = hull[..., 0] - _HULL_COM[0]
    hull_y = hull[..., 1] - _HULL_COM[1]
    lidar = lidar_scan(xp, xp.stack([hull_x, hull_y], axis=-1), terrain)
    if leg1 is None or leg2 is None:
        gh = ground_height_fn(xp, terrain)
        leg1 = bodies[..., 2, 1] - LEG_H / 2 <= gh(bodies[..., 2, 0]) + 0.01
        leg2 = bodies[..., 4, 1] - LEG_H / 2 <= gh(bodies[..., 4, 0]) + 0.01
    return xp.concatenate(
        [
            xp.stack(
                [
                    angle,
                    2.0 * hull[..., 5] / FPS,
                    0.3 * hull[..., 3] * (VIEWPORT_W / SCALE) / FPS,
                    0.3 * hull[..., 4] * (VIEWPORT_H / SCALE) / FPS,
                    j_angles[..., 0],
                    j_speeds[..., 0] / SPEED_HIP,
                    j_angles[..., 1] + 1.0,
                    j_speeds[..., 1] / SPEED_KNEE,
                    _asfloat(xp, leg1),
                    j_angles[..., 2],
                    j_speeds[..., 2] / SPEED_HIP,
                    j_angles[..., 3] + 1.0,
                    j_speeds[..., 3] / SPEED_KNEE,
                    _asfloat(xp, leg2),
                ],
                axis=-1,
            ),
            lidar,
        ],
        axis=-1,
    )


def walker_step(xp, state, action, world: PlanarWorld = _WORLD):
    """One env tick: motors from the action, substeps, obs/reward/done."""
    bodies = state["bodies"]
    terrain = state["terrain"]
    a = xp.clip(action, -1.0, 1.0)

    motor_speed = xp.stack(
        [
            SPEED_HIP * xp.sign(a[..., 0]),
            SPEED_KNEE * xp.sign(a[..., 1]),
            SPEED_HIP * xp.sign(a[..., 2]),
            SPEED_KNEE * xp.sign(a[..., 3]),
        ],
        axis=-1,
    )
    motor_torque = MOTORS_TORQUE * xp.abs(a)

    gh = ground_height_fn(xp, terrain)
    flags = None
    # CONTACT impulses warm-start across ticks (Box2D b2Island behavior, see
    # physics/planar.py): sustained ground support under the feet brings the
    # random-policy survival time from 578 to 644 steps vs the real engine's
    # 677 (n=24, full horizon). JOINT impulses deliberately do NOT: the
    # walker's hips/knees get NEW motor commands every tick, so last tick's
    # accumulated joint impulses are stale — warm-starting them measured
    # 458 (joints only) and 282 (joints+contacts) mean survival, a
    # regression past the cold solver. (The lander is the opposite case:
    # statically resting on its legs, it NEEDS the joint warm start —
    # envs/dynamics/lunar_lander.py.)
    cimp = state["cimp"]
    # Cross-tick JOINT warm start is opt-in via a "jimp" state key (present
    # only when the world is configured for it — Box2D warm-starts joints
    # across steps, but at 4 substeps the stale-impulse semantics measured
    # worse; the faithful single-substep configuration carries it).
    jimp = state.get("jimp")
    carry_joints = jimp is not None
    if jimp is None:
        jimp = xp.zeros(cimp.shape[:-2] + (len(world.joints.body_a), 5))
    for _ in range(_SUBSTEPS):
        bodies, flags, (new_jimp, cimp) = world_step(
            xp, bodies, world, motor_speed, motor_torque, gh, warm_start=(jimp, cimp)
        )
        jimp = new_jimp if carry_joints else jimp

    # ground_contact flags mirror the reference's lower-leg contact
    # listener (any part of the shank box, foot or knee end)
    leg1 = flags[..., 0] | flags[..., 1] | flags[..., 4] | flags[..., 5]
    leg2 = flags[..., 2] | flags[..., 3] | flags[..., 6] | flags[..., 7]
    hull_contact = flags[..., 8] | flags[..., 9] | flags[..., 10]

    hull = bodies[..., 0, :]
    hull_x = hull[..., 0] - _HULL_COM[0]
    new_state_partial = {"bodies": bodies, "terrain": terrain}
    obs = observe_state(xp, new_state_partial, leg1, leg2)

    # Reference shaping: 130 * pos.x / SCALE (≈4.33/m; ~300 total over the
    # ~93 m track) minus an upright-posture term.
    shaping = 130.0 * hull_x / SCALE - 5.0 * xp.abs(obs[..., 0])

    reward = shaping - state["prev_shaping"]
    reward = reward - 0.00035 * MOTORS_TORQUE * xp.sum(xp.abs(a), axis=-1)

    crashed = hull_contact | (hull_x < 0)
    finished = hull_x > (TERRAIN_LENGTH - TERRAIN_GRASS) * TERRAIN_STEP
    terminated = crashed | finished
    reward = xp.where(crashed, -100.0, reward)

    out = {
        "bodies": bodies,
        "terrain": terrain,
        "prev_shaping": shaping,
        "done": terminated,
        "r": reward,
        "cimp": cimp,
    }
    if carry_joints:
        out["jimp"] = jimp
    return out, obs


def _asfloat(xp, b):
    return b.astype("float32") if hasattr(b, "astype") else float(b)


class BipedalWalker(gym.Env[np.ndarray, np.ndarray], EzPickle):
    """Teach a 2D biped to walk to the end of the terrain."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": FPS}

    def __init__(self, render_mode: str | None = None, hardcore: bool = False):
        EzPickle.__init__(self, render_mode, hardcore)
        self.hardcore = hardcore
        self.render_mode = render_mode
        self._display = None

        low = np.array(
            [-math.pi, -5.0, -5.0, -5.0, -math.pi, -5.0, -math.pi, -5.0, -0.0,
             -math.pi, -5.0, -math.pi, -5.0, -0.0] + [-1.0] * N_LIDAR
        ).astype(np.float32)
        high = np.array(
            [math.pi, 5.0, 5.0, 5.0, math.pi, 5.0, math.pi, 5.0, 5.0,
             math.pi, 5.0, math.pi, 5.0, 5.0] + [1.0] * N_LIDAR
        ).astype(np.float32)
        self.action_space = spaces.Box(
            np.array([-1, -1, -1, -1]).astype(np.float32),
            np.array([1, 1, 1, 1]).astype(np.float32),
        )
        self.observation_space = spaces.Box(low, high)

        self.state: dict | None = None

    def reset(self, *, seed: int | None = None, options: dict[str, Any] | None = None):
        super().reset(seed=seed)
        u = self.np_random.uniform(-1.0, 1.0, size=(TERRAIN_LENGTH,))
        obstacle_draws = self.np_random.uniform(0.0, 1.0, size=(TERRAIN_LENGTH,))
        terrain = generate_terrain(
            np, u, hardcore=self.hardcore, obstacle_draws=obstacle_draws if self.hardcore else None
        )
        bodies = np.asarray(initial_bodies(np))
        # initial horizontal kick (reference applies uniform(-5, 5) N force)
        kick = self.np_random.uniform(-INITIAL_RANDOM, INITIAL_RANDOM)
        bodies[0, 3] += kick / _HULL_MASS / FPS

        self.state = {
            "bodies": bodies,
            "terrain": terrain,
            "prev_shaping": np.asarray(0.0),
            "done": np.asarray(False),
            "r": np.asarray(0.0),
            "cimp": np.zeros((len(_WORLD.contacts.body), 2)),
        }
        # the reference's reset ends with `return self.step([0,0,0,0])[0]`
        # (bipedal_walker.py:520): one zero-action settle tick whose reward
        # is discarded and whose post-tick shaping seeds prev_shaping
        self.state, obs = walker_step(np, self.state, np.zeros(4))
        self.state["r"] = np.asarray(0.0)
        if self.render_mode == "human":
            self.render()
        return np.asarray(obs, dtype=np.float32), {}

    def _observe(self) -> np.ndarray:
        return np.asarray(observe_state(np, self.state), dtype=np.float32)

    def step(self, action: np.ndarray):
        assert self.state is not None, "You forgot to call reset()"
        action = np.asarray(action, dtype=np.float64)
        self.state, obs = walker_step(np, self.state, action)
        reward = float(self.state["r"])
        terminated = bool(self.state["done"])
        if self.render_mode == "human":
            self.render()
        return obs.astype(np.float32), reward, terminated, False, {}

    def render(self):
        if self.render_mode is None:
            gym.logger.warn(
                "You are calling render method without specifying any render mode."
            )
            return None
        frame = _render_walker(self.state)
        if self.render_mode == "human":
            if self._display is None:
                from gymnasium_tpu.utils.human_display import HumanDisplay

                self._display = HumanDisplay(VIEWPORT_W, VIEWPORT_H, FPS, "BipedalWalker")
            self._display.show(frame)
            return None
        return frame

    def close(self):
        if self._display is not None:
            self._display.close()
            self._display = None


def _render_walker(state, width=VIEWPORT_W, height=VIEWPORT_H):
    from gymnasium_tpu.utils.raster import Canvas

    canvas = Canvas(width, height, (215, 215, 255))
    bodies = np.asarray(state["bodies"])
    terrain = np.asarray(state["terrain"])
    # camera follows the hull
    scroll = bodies[0, 0] - VIEWPORT_W / SCALE / 5

    xs = np.arange(TERRAIN_LENGTH) * TERRAIN_STEP
    pts = [((x - scroll) * SCALE, height - y * SCALE) for x, y in zip(xs, terrain)]
    canvas.polygon(pts + [(width, height), (0, height)], (102, 153, 76))

    for i, (w, h, color) in enumerate(
        [
            (64 / SCALE, 17 / SCALE, (127, 51, 229)),
            (LEG_W, LEG_H, (178, 101, 152)),
            (0.8 * LEG_W, LEG_H, (178, 101, 152)),
            (LEG_W, LEG_H, (153, 76, 127)),
            (0.8 * LEG_W, LEG_H, (153, 76, 127)),
        ]
    ):
        x, y, a = bodies[i, 0], bodies[i, 1], bodies[i, 2]
        c, s = math.cos(a), math.sin(a)
        corners = []
        for bx, by in [(-w / 2, -h / 2), (w / 2, -h / 2), (w / 2, h / 2), (-w / 2, h / 2)]:
            rx, ry = bx * c - by * s, bx * s + by * c
            corners.append(((x + rx - scroll) * SCALE, height - (y + ry) * SCALE))
        canvas.polygon(corners, color)
    return canvas.rgb_array()


class BipedalWalkerFunctional(FuncEnv):
    """Stateless BipedalWalker (normal terrain) on the planar engine."""

    rng_hooks = frozenset({"initial"})
    hardcore = False

    def __init__(self, options: dict[str, Any] | None = None):
        options = dict(options or {})
        if "hardcore" in options:
            self.hardcore = bool(options.pop("hardcore"))
        super().__init__(options)
        low = np.array(
            [-math.pi, -5.0, -5.0, -5.0, -math.pi, -5.0, -math.pi, -5.0, -0.0,
             -math.pi, -5.0, -math.pi, -5.0, -0.0] + [-1.0] * N_LIDAR
        ).astype(np.float32)
        high = np.array(
            [math.pi, 5.0, 5.0, 5.0, math.pi, 5.0, math.pi, 5.0, 5.0,
             math.pi, 5.0, math.pi, 5.0, 5.0] + [1.0] * N_LIDAR
        ).astype(np.float32)
        self.observation_space = spaces.Box(low, high)
        self.action_space = spaces.Box(-np.ones(4, np.float32), np.ones(4, np.float32))

    def initial(self, rng, params: Any = None):
        import jax
        import jax.numpy as jnp

        k_terrain, k_obst, k_kick = jax.random.split(rng, 3)
        u = jax.random.uniform(k_terrain, (TERRAIN_LENGTH,), minval=-1.0, maxval=1.0)
        draws = jax.random.uniform(k_obst, (TERRAIN_LENGTH,))
        terrain = generate_terrain(
            jnp, u, hardcore=self.hardcore, obstacle_draws=draws if self.hardcore else None
        )
        bodies = jnp.asarray(initial_bodies(np))
        kick = jax.random.uniform(k_kick, (), minval=-INITIAL_RANDOM, maxval=INITIAL_RANDOM)
        bodies = bodies.at[0, 3].add(kick / _HULL_MASS / FPS)
        state = {
            "bodies": bodies,
            "terrain": terrain,
            "prev_shaping": jnp.zeros(()),
            "done": jnp.zeros((), bool),
            "r": jnp.zeros(()),
            "cimp": jnp.zeros((len(_WORLD.contacts.body), 2)),
        }
        # reference reset runs one zero-action settle tick (see host reset)
        state, _ = walker_step(jnp, state, jnp.zeros(4))
        state["r"] = jnp.zeros(())
        state["done"] = jnp.zeros((), bool)
        return state

    def transition(self, state, action, rng, params: Any = None):
        import jax.numpy as jnp

        new_state, _ = walker_step(jnp, state, jnp.asarray(action))
        return new_state

    def observation(self, state, rng, params: Any = None):
        import jax.numpy as jnp

        return observe_state(jnp, state).astype(jnp.float32)

    def reward(self, state, action, next_state, rng, params: Any = None):
        return next_state["r"]

    def terminal(self, state, rng, params: Any = None):
        return state["done"]


class BipedalWalkerHardcore:
    """Construction guard (reference box2d/bipedal_walker.py:774-781): the
    hardcore variant is made via ``gym.make("BipedalWalker-v3", hardcore=True)``."""

    def __init__(self):
        raise gym.error.Error(
            "Error initializing BipedalWalkerHardcore Environment.\n"
            "Currently, we do not support initializing this mode of environment by calling the class directly.\n"
            "To use this environment, instead create it by specifying the hardcore keyword in gym.make, i.e.\n"
            'gym.make("BipedalWalker-v3", hardcore=True)'
        )
