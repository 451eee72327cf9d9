"""LunarLander rigid-body dynamics, written once for host (numpy) and
device (jax.numpy) execution.

The reference simulates through the Box2D C++ engine (reference
box2d/lunar_lander.py:620 ``world.Step``); here the lander is the same
3-body system — hull + two legs on motor-driven revolute joints
(LEG_SPRING_TORQUE shock absorbers) — stepped by the split-impulse planar
engine (gymnasium_tpu/physics/planar.py), with engine impulses matching the
reference's geometry/powers. An earlier single-rigid-body + spring-contact
model over-rotated in flight (legs lumped into the inertia) and BOUNCED at
touchdown where Box2D crashes or settles inelastically — wrong tails in the
return distribution. Correctness target is distributional (SURVEY.md §7
hard part 1): episode-return distributions, crash/land rates — not bit-exact
solver states.

All functions take the array namespace ``xp`` and broadcast over leading
batch axes; random draws are passed in explicitly so the host env can use
PCG64 and the functional env threefry.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import numpy as np

from gymnasium_tpu.physics.planar import (
    BodySpec,
    ContactSpec,
    JointSpec,
    PlanarWorld,
    world_step,
)

FPS = 50
SCALE = 30.0

MAIN_ENGINE_POWER = 13.0
SIDE_ENGINE_POWER = 0.6

INITIAL_RANDOM = 1000.0

LANDER_POLY = [(-14, +17), (-17, 0), (-17, -10), (+17, -10), (+17, 0), (+14, +17)]
LEG_AWAY = 20
LEG_DOWN = 18
LEG_W, LEG_H = 2, 8

SIDE_ENGINE_HEIGHT = 14.0
SIDE_ENGINE_AWAY = 12.0

VIEWPORT_W = 600
VIEWPORT_H = 400

W = VIEWPORT_W / SCALE  # world width in meters
H = VIEWPORT_H / SCALE  # world height in meters
CHUNKS = 11

HELIPAD_Y = H / 4


def _polygon_area_inertia(poly_px):
    """Area (m^2), centroid y (m), and unit-density second moment (m^4)
    about the body origin, from the standard polygon integrals."""
    pts = np.asarray(poly_px, dtype=np.float64) / SCALE
    x = pts[:, 0]
    y = pts[:, 1]
    x1 = np.roll(x, -1)
    y1 = np.roll(y, -1)
    cross = x * y1 - x1 * y
    signed_area = 0.5 * np.sum(cross)
    cy = np.sum((y + y1) * cross) / (6 * signed_area)
    area = abs(signed_area)
    # second moment about origin (Iz for unit density)
    inertia = np.abs(np.sum(cross * (x * x + x * x1 + x1 * x1 + y * y + y * y1 + y1 * y1))) / 12.0
    return float(area), float(cy), float(inertia)


_HULL_AREA, _HULL_CY, _HULL_I = _polygon_area_inertia(LANDER_POLY)
_HULL_DENSITY = 5.0
_LEG_DENSITY = 1.0
_LEG_AREA = (2 * LEG_W / SCALE) * (2 * LEG_H / SCALE)

# Leg tips in the body frame (legs treated as rigidly attached).
_LEG_TIP = np.array(
    [
        [-LEG_AWAY / SCALE, -(LEG_DOWN + 2 * LEG_H) / SCALE],
        [+LEG_AWAY / SCALE, -(LEG_DOWN + 2 * LEG_H) / SCALE],
    ]
)
# Hull contact probes (every LANDER_POLY vertex): touching ground = crash.
# Probing only the top/bottom corners let edge-on impacts at the side
# vertices (±17, 0) go undetected — spinning landers survived past the
# reference's crash, accumulating unbounded -100*|angle| shaping drift.
_HULL_PTS = np.asarray(LANDER_POLY, dtype=np.float64) / SCALE

LANDER_MASS = _HULL_DENSITY * _HULL_AREA + 2 * _LEG_DENSITY * _LEG_AREA

# Rotation pivot in the body frame. Box2D rotates the lander body about its
# hull centroid (~0.10 m ABOVE the body origin — LANDER_POLY is top-heavy;
# the legs are separate joint-coupled bodies and do not move the hull's own
# COM). Treating the origin as the pivot overstated the side-engine torque
# arm by ~16%, measurably over-rotating the lander vs the reference. The
# legs' mass is lumped rigidly (rest pose below the hull) into the inertia.
_LEG_CY = -(LEG_DOWN + LEG_H) / SCALE  # leg box center (hanging rest pose)
COM_Y = _HULL_CY

_HULL_MASS = _HULL_DENSITY * _HULL_AREA
_LEG_MASS = _LEG_DENSITY * _LEG_AREA
_LEG_BOX_I = _LEG_MASS * ((2 * LEG_W / SCALE) ** 2 + (2 * LEG_H / SCALE) ** 2) / 12.0
LANDER_INERTIA = (
    _HULL_DENSITY * _HULL_I
    - _HULL_MASS * _HULL_CY**2  # hull inertia about its own centroid
    + 2 * (_LEG_BOX_I + _LEG_MASS * ((LEG_AWAY / SCALE) ** 2 + (_LEG_CY - COM_Y) ** 2))
)


class LunarParams(NamedTuple):
    """Dynamics parameters (pytree of plain scalars)."""

    gravity: Any = -10.0
    dt: Any = 1.0 / FPS
    mass: Any = LANDER_MASS
    inertia: Any = LANDER_INERTIA
    main_power: Any = MAIN_ENGINE_POWER
    side_power: Any = SIDE_ENGINE_POWER
    # sleep detection (Box2D-like)
    sleep_lin_vel: Any = 0.06
    sleep_ang_vel: Any = 0.06
    sleep_time: Any = 0.5
    # wind (off unless enable_wind)
    wind_power: Any = 15.0
    turbulence_power: Any = 1.5


def generate_terrain(xp, uniform12):
    """Terrain chunk heights from CHUNKS+1 uniform(0, 1) draws.

    Bit-faithful to the reference (lunar_lander.py:344-357): 12 raw heights,
    helipad chunks pinned to H/4 BEFORE smoothing, then
    ``smooth_y[i] = 0.33*(height[i-1] + height[i] + height[i+1])`` where
    ``height[-1]`` wraps to the final draw (python negative indexing in the
    reference's list comprehension).
    ``uniform12``: draws of shape (..., CHUNKS + 1).
    Returns smooth heights of shape (..., CHUNKS).
    """
    height = uniform12 * (H / 2)
    mid = CHUNKS // 2
    # Pin the helipad area flat (pre-smoothing, as the reference does).
    for i in range(mid - 2, mid + 3):
        if hasattr(height, "at"):
            height = height.at[..., i].set(HELIPAD_Y)
        else:
            height[..., i] = HELIPAD_Y
    prev = xp.concatenate([height[..., -1:], height[..., : CHUNKS - 1]], axis=-1)
    cur = height[..., :CHUNKS]
    nxt = height[..., 1 : CHUNKS + 1]
    return 0.33 * (prev + cur + nxt)


def ground_height(xp, terrain, x):
    """Piecewise-linear terrain height at world coordinate ``x``.

    ``terrain``: (..., CHUNKS) heights at x = W*i/(CHUNKS-1).
    """
    spacing = W / (CHUNKS - 1)
    xc = xp.clip(x / spacing, 0.0, CHUNKS - 1 - 1e-6)
    i0 = xp.floor(xc).astype("int32")
    frac = xc - i0
    h0 = xp.take_along_axis(terrain, i0[..., None], axis=-1)[..., 0] if terrain.ndim > 1 else terrain[i0]
    i1 = xp.minimum(i0 + 1, CHUNKS - 1)
    h1 = xp.take_along_axis(terrain, i1[..., None], axis=-1)[..., 0] if terrain.ndim > 1 else terrain[i1]
    return h0 + (h1 - h0) * frac


def _rotate(xp, px, py, c, s):
    return px * c - py * s, px * s + py * c


def engine_impulses(xp, hull, m_power, s_direction, s_power, dispersion, params):
    """Linear + angular impulses of the main/side engines this tick.

    Geometry mirrors the reference's tip/side offset construction
    (lunar_lander.py:522-580); the particle recoil is folded directly into
    the body impulse. ``hull``: (..., 6) planar body row [x,y,angle,vx,vy,w].
    """
    angle = hull[..., 2]
    tip_x = xp.sin(angle)
    tip_y = xp.cos(angle)
    side_x = -tip_y
    side_y = tip_x

    d0 = dispersion[..., 0] / SCALE
    d1 = dispersion[..., 1] / SCALE

    # main engine: thrust along -tip applied below the body.
    # Application points are defined relative to the BODY ORIGIN
    # (lander.position in the reference); torque arms are taken about the
    # center of mass, COM_Y above the origin: arm = r_origin + cy*tip.
    ox_m = tip_x * (4 / SCALE + 2 * d0) + side_x * d1
    oy_m = -tip_y * (4 / SCALE + 2 * d0) - side_y * d1
    jx_m = -ox_m * params.main_power * m_power
    jy_m = -oy_m * params.main_power * m_power
    rx_m = ox_m + COM_Y * tip_x
    ry_m = oy_m - COM_Y * tip_y
    torque_m = rx_m * jy_m - ry_m * jx_m

    # side engines
    ox_s = tip_x * d0 + side_x * (3 * d1 + s_direction * SIDE_ENGINE_AWAY / SCALE)
    oy_s = -tip_y * d0 - side_y * (3 * d1 + s_direction * SIDE_ENGINE_AWAY / SCALE)
    jx_s = -ox_s * params.side_power * s_power
    jy_s = -oy_s * params.side_power * s_power
    rx_s = ox_s - tip_x * 17 / SCALE + COM_Y * tip_x
    ry_s = oy_s + tip_y * SIDE_ENGINE_HEIGHT / SCALE - COM_Y * tip_y
    torque_s = rx_s * jy_s - ry_s * jx_s

    jx = jx_m + jx_s
    jy = jy_m + jy_s
    torque = torque_m + torque_s
    return jx, jy, torque


# --- 3-body planar world: hull + two legs on motor-driven revolute joints --
_LEG_I = _LEG_BOX_I
# Box2D contact friction is sqrt(fixture_a * fixture_b); terrain fixtures
# carry friction 0.1, the hull 0.1, the legs the Box2D default 0.2.
_HULL_FRICTION = math.sqrt(0.1 * 0.1)
_LEG_FRICTION = math.sqrt(0.2 * 0.1)
LEG_SPRING_TORQUE = 40.0
_LEG_MOTOR_SPEED = 0.3

# body order: [hull, leg(i=-1), leg(i=+1)] (reference creation order)
_LEG_HALF_W = LEG_W / SCALE
_LEG_HALF_H = LEG_H / SCALE


def _hull_probe_pts():
    """Every LANDER_POLY vertex, relative to the hull COM."""
    pts = np.asarray(LANDER_POLY, dtype=np.float64) / SCALE
    pts = pts.copy()
    pts[:, 1] -= _HULL_CY
    return pts


def build_lander_world(gravity: Any = -10.0, dt_substeps: int = 2) -> PlanarWorld:
    """Hull + 2 legs, joints/limits/motors per the reference's creation
    block (lunar_lander.py:406-443)."""
    bodies = BodySpec(
        inv_mass=np.array([1 / _HULL_MASS, 1 / _LEG_MASS, 1 / _LEG_MASS]),
        inv_inertia=np.array([1 / _HULL_I_COM, 1 / _LEG_I, 1 / _LEG_I]),
    )
    # hip anchors: hull local (0, 0) = origin = (0, -cy) from the hull COM;
    # leg local (i*LEG_AWAY, LEG_DOWN)/SCALE from the leg center
    joints = JointSpec(
        body_a=np.array([0, 0]),
        body_b=np.array([1, 2]),
        anchor_a=np.array([[0.0, -_HULL_CY], [0.0, -_HULL_CY]]),
        anchor_b=np.array(
            [
                [-LEG_AWAY / SCALE, LEG_DOWN / SCALE],
                [+LEG_AWAY / SCALE, LEG_DOWN / SCALE],
            ]
        ),
        lower=np.array([0.9 - 0.5, -0.9]),
        upper=np.array([0.9, -0.9 + 0.5]),
        ref_angle=np.zeros(2),
    )
    hull_pts = _hull_probe_pts()
    leg_corners = [
        [-_LEG_HALF_W, -_LEG_HALF_H],
        [+_LEG_HALF_W, -_LEG_HALF_H],
    ]
    contacts = ContactSpec(
        body=np.array([1, 1, 2, 2] + [0] * len(hull_pts)),
        point=np.array(leg_corners + leg_corners + hull_pts.tolist()),
        friction=np.array([_LEG_FRICTION] * 4 + [_HULL_FRICTION] * len(hull_pts)),
    )
    return PlanarWorld(
        bodies,
        joints,
        contacts,
        gravity=gravity,
        dt=1.0 / FPS / dt_substeps,
        velocity_iterations=8,
        position_iterations=4,
    )


_SUBSTEPS = 2
_HULL_I_COM = _HULL_DENSITY * _HULL_I - _HULL_MASS * _HULL_CY**2
_WORLD_CACHE: dict = {}


def _lander_world(gravity):
    """Cache worlds per static gravity value; traced gravity builds fresh
    (the spec tables are tiny numpy constants either way)."""
    try:
        key = float(gravity)
    except Exception:
        return build_lander_world(gravity)
    world = _WORLD_CACHE.get(key)
    if world is None:
        world = _WORLD_CACHE[key] = build_lander_world(key)
    return world


# motor arrays are step constants: the leg "springs" drive outward at
# ±0.3 rad/s against their limits with LEG_SPRING_TORQUE available
_MOTOR_SPEED = np.array([-_LEG_MOTOR_SPEED, +_LEG_MOTOR_SPEED])
_MOTOR_TORQUE = np.array([LEG_SPRING_TORQUE, LEG_SPRING_TORQUE])


def observe(xp, bodies, leg1, leg2):
    """The 8-dim LunarLander observation (reference lunar_lander.py:600).

    ``bodies``: (..., 3, 6) planar rows [x, y, angle, vx, vy, omega] for
    [hull, leg_left, leg_right]. The reference reports ``lander.position`` =
    the body ORIGIN; the hull row carries its COM, so translate back by the
    rotated COM offset.
    """
    hull = bodies[..., 0, :]
    angle = hull[..., 2]
    x = hull[..., 0] + _HULL_CY * xp.sin(angle)
    y = hull[..., 1] - _HULL_CY * xp.cos(angle)
    vx = hull[..., 3]
    vy = hull[..., 4]
    omega = hull[..., 5]
    return xp.stack(
        [
            (x - W / 2) / (W / 2),
            (y - (HELIPAD_Y + LEG_DOWN / SCALE)) / (H / 2),
            vx * (W / 2) / FPS,
            vy * (H / 2) / FPS,
            angle,
            20.0 * omega / FPS,
            leg1.astype(hull.dtype) if hasattr(leg1, "astype") else float(leg1),
            leg2.astype(hull.dtype) if hasattr(leg2, "astype") else float(leg2),
        ],
        axis=-1,
    )


def shaping(xp, obs):
    """Potential function of the shaped reward (lunar_lander.py:637-655)."""
    return (
        -100.0 * xp.sqrt(obs[..., 0] ** 2 + obs[..., 1] ** 2)
        - 100.0 * xp.sqrt(obs[..., 2] ** 2 + obs[..., 3] ** 2)
        - 100.0 * xp.abs(obs[..., 4])
        + 10.0 * obs[..., 6]
        + 10.0 * obs[..., 7]
    )


def initial_state_pre(xp, terrain_uniform, force_uniform2, params: LunarParams):
    """The creation-pose state dict BEFORE the reference's settle tick.

    ``terrain_uniform``: (..., CHUNKS) uniform(0,1) draws;
    ``force_uniform2``: (..., 2) uniform(-1,1) draws for the initial kick
    (reference applies uniform(-INITIAL_RANDOM, INITIAL_RANDOM) N of force
    to the HULL's center for one tick). Bodies start in the reference's
    creation pose (lunar_lander.py:373-443): hull origin at (W/2, H), legs
    at ±LEG_AWAY with ±0.05 rad and their hip joints initially violated —
    the position solver assembles them, exactly like Box2D.
    """
    terrain = generate_terrain(xp, terrain_uniform)
    batch_shape = terrain_uniform.shape[:-1]
    zeros = xp.zeros(batch_shape)
    kick = force_uniform2 * INITIAL_RANDOM
    vx = kick[..., 0] * params.dt / _HULL_MASS
    vy = kick[..., 1] * params.dt / _HULL_MASS
    hull = xp.stack(
        [zeros + W / 2, zeros + H + _HULL_CY, zeros, vx, vy, zeros], axis=-1
    )
    legs = []
    for i in (-1.0, +1.0):
        legs.append(
            xp.stack(
                [
                    zeros + W / 2 - i * LEG_AWAY / SCALE,
                    zeros + H,
                    zeros + i * 0.05,
                    zeros,
                    zeros,
                    zeros,
                ],
                axis=-1,
            )
        )
    bodies = xp.stack([hull] + legs, axis=-2)
    obs0 = observe(xp, bodies, zeros > 1, zeros > 1)
    n_contacts = 4 + len(LANDER_POLY)
    state = {
        "body": bodies,
        "terrain": terrain,
        "leg1": zeros > 1.0,
        "leg2": zeros > 1.0,
        "done": zeros > 1.0,
        "sleep_timer": zeros,
        "prev_shaping": shaping(xp, obs0),
        "r": zeros,
        # Box2D-style warm-start impulses (see physics/planar.py:world_step):
        # without them the hull:leg inertia ratio stalls the velocity solver
        # and the lander collapses through its legs on touchdown
        "jimp": xp.zeros(batch_shape + (2, 5)),
        "cimp": xp.zeros(batch_shape + (n_contacts, 2)),
    }
    return state


def initial_state(xp, terrain_uniform, force_uniform2, params: LunarParams):
    """Initial episode state: creation pose + the reference's settle tick.

    The reference's reset runs one no-op physics tick and returns its obs
    (reference lunar_lander.py:448: ``return self.step(noop)[0]``) — so the
    first observation shows one tick of free fall under the initial kick
    while the position solver assembles the legs. No engines fire, so the
    dispersion draw is irrelevant; wind is omitted for this single tick.
    """
    state = initial_state_pre(xp, terrain_uniform, force_uniform2, params)
    batch_shape = terrain_uniform.shape[:-1]
    noop = xp.zeros(batch_shape, dtype=xp.int32)
    wind0 = xp.zeros(batch_shape + (2,))
    return full_step(xp, state, noop, wind0, wind0, params, continuous=False)


def engine_external(xp, state, action, dispersion, wind, params: LunarParams, continuous: bool):
    """Engine activation + impulses -> per-body external force rows.

    Returns ``(external (..., 3, 3), m_power, s_power)``.
    """
    hull = state["body"][..., 0, :]
    m_power, s_direction, s_power = engine_activation(xp, action, continuous)
    jx, jy, torque = engine_impulses(xp, hull, m_power, s_direction, s_power, dispersion, params)

    # wind force + turbulence torque act on the hull (lunar_lander.py:470-510)
    jx = jx + wind[..., 0] * params.dt
    torque = torque + wind[..., 1] * params.dt

    # engine/wind impulses -> force on the hull across the substeps
    zeros = xp.zeros_like(jx)
    hull_force = xp.stack([jx / params.dt, jy / params.dt, torque / params.dt], axis=-1)
    leg_force = xp.stack([zeros, zeros, zeros], axis=-1)
    external = xp.stack([hull_force, leg_force, leg_force], axis=-2)
    return external, m_power, s_power


def finish_step(xp, state, bodies, warm, flags, m_power, s_power, params: LunarParams):
    """Post-solver tail shared by the XLA and fused-Pallas paths: contact
    flags -> legs/crash, sleep detection, shaped reward, next state dict."""
    leg1 = flags[..., 0] | flags[..., 1]
    leg2 = flags[..., 2] | flags[..., 3]
    hull_contact = flags[..., 4]
    for k in range(5, 4 + len(LANDER_POLY)):
        hull_contact = hull_contact | flags[..., k]

    new_hull = bodies[..., 0, :]
    # sleep detection: at rest (on legs) for sleep_time seconds => landed
    lin_speed = xp.sqrt(new_hull[..., 3] ** 2 + new_hull[..., 4] ** 2)
    at_rest = (
        (lin_speed < params.sleep_lin_vel)
        & (xp.abs(new_hull[..., 5]) < params.sleep_ang_vel)
        & (leg1 | leg2)
    )
    sleep_timer = xp.where(at_rest, state["sleep_timer"] + params.dt, 0.0)
    asleep = sleep_timer >= params.sleep_time

    obs = observe(xp, bodies, leg1, leg2)
    new_shaping = shaping(xp, obs)
    reward = new_shaping - state["prev_shaping"]
    reward = reward - m_power * 0.30 - s_power * 0.03

    crashed = hull_contact | (xp.abs(obs[..., 0]) >= 1.0)
    terminated = crashed | asleep
    reward = xp.where(crashed, -100.0, xp.where(asleep, 100.0, reward))

    return {
        "body": bodies,
        "terrain": state["terrain"],
        "leg1": leg1,
        "leg2": leg2,
        "done": terminated,
        "sleep_timer": sleep_timer,
        "prev_shaping": new_shaping,
        "r": reward,
        "jimp": warm[0],
        "cimp": warm[1],
    }


def full_step(xp, state, action, dispersion, wind, params: LunarParams, continuous: bool):
    """One complete LunarLander tick: engines, planar substeps, reward.

    ``dispersion``: (..., 2) uniform(-1,1); ``wind``: (..., 2) wind/torque
    terms (zeros when wind disabled). Returns the next state dict with the
    step's reward in ``"r"`` and termination in ``"done"``.
    """
    external, m_power, s_power = engine_external(
        xp, state, action, dispersion, wind, params, continuous
    )
    world = _lander_world(params.gravity)
    gh = lambda px: ground_height(xp, state["terrain"], px)  # noqa: E731
    bodies = state["body"]
    flags = None
    warm = (state["jimp"], state["cimp"])
    for _ in range(_SUBSTEPS):
        bodies, flags, warm = world_step(
            xp,
            bodies,
            world,
            _MOTOR_SPEED,
            _MOTOR_TORQUE,
            gh,
            external_force=external,
            warm_start=warm,
        )
    return finish_step(xp, state, bodies, warm, flags, m_power, s_power, params)


def engine_activation(xp, action, continuous: bool):
    """Map an action to (m_power, s_direction, s_power).

    Continuous: ``action = [main, lateral]`` in [-1, 1]^2; main fires above 0
    at power 0.5..1.0, lateral fires when |a| > 0.5. Discrete: 0 noop,
    1 left, 2 main, 3 right.
    """
    if continuous:
        a_main = action[..., 0]
        a_side = action[..., 1]
        main_on = a_main > 0.0
        m_power = xp.where(main_on, (xp.clip(a_main, 0.0, 1.0) + 1.0) * 0.5, 0.0)
        side_on = xp.abs(a_side) > 0.5
        s_direction = xp.where(side_on, xp.sign(a_side), 0.0)
        s_power = xp.where(side_on, xp.clip(xp.abs(a_side), 0.5, 1.0), 0.0)
    else:
        m_power = xp.where(action == 2, 1.0, 0.0)
        s_direction = xp.where(action == 1, -1.0, xp.where(action == 3, 1.0, 0.0))
        s_power = xp.where((action == 1) | (action == 3), 1.0, 0.0)
    return m_power, s_direction, s_power
