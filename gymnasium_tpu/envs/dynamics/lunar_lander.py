"""LunarLander rigid-body dynamics, written once for host (numpy) and
device (jax.numpy) execution.

The reference simulates through the Box2D C++ engine (reference
box2d/lunar_lander.py:620 ``world.Step``); here the lander is a single rigid
body (hull + rigid legs) with engine impulses matching the reference's
geometry/powers and ground contact resolved by a stiff spring-damper at leg
tips and hull corners. Correctness target is distributional (SURVEY.md §7
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
    """Area (m^2) and unit-density second moment (m^4) of a polygon about
    the body origin, from the standard polygon integrals."""
    pts = np.asarray(poly_px, dtype=np.float64) / SCALE
    x = pts[:, 0]
    y = pts[:, 1]
    x1 = np.roll(x, -1)
    y1 = np.roll(y, -1)
    cross = x * y1 - x1 * y
    area = 0.5 * np.abs(np.sum(cross))
    # second moment about origin (Iz for unit density)
    inertia = np.abs(np.sum(cross * (x * x + x * x1 + x1 * x1 + y * y + y * y1 + y1 * y1))) / 12.0
    return float(area), float(inertia)


_HULL_AREA, _HULL_I = _polygon_area_inertia(LANDER_POLY)
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
# Hull contact probes (bottom corners + top corners): touching ground = crash.
_HULL_PTS = np.array(
    [
        [-17 / SCALE, -10 / SCALE],
        [+17 / SCALE, -10 / SCALE],
        [-14 / SCALE, +17 / SCALE],
        [+14 / SCALE, +17 / SCALE],
    ]
)

LANDER_MASS = _HULL_DENSITY * _HULL_AREA + 2 * _LEG_DENSITY * _LEG_AREA
_LEG_OFFSET_I = _LEG_DENSITY * _LEG_AREA * (
    (LEG_AWAY / SCALE) ** 2 + ((LEG_DOWN + LEG_H) / SCALE) ** 2
)
LANDER_INERTIA = _HULL_DENSITY * _HULL_I + 2 * _LEG_OFFSET_I


class LunarParams(NamedTuple):
    """Dynamics parameters (pytree of plain scalars)."""

    gravity: Any = -10.0
    dt: Any = 1.0 / FPS
    mass: Any = LANDER_MASS
    inertia: Any = LANDER_INERTIA
    main_power: Any = MAIN_ENGINE_POWER
    side_power: Any = SIDE_ENGINE_POWER
    # spring-damper ground contact
    contact_k: Any = 100.0 * LANDER_MASS  # stiffness per probe
    contact_c: Any = 3.0 * LANDER_MASS  # damping per probe
    friction_mu: Any = 0.6
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


def engine_impulses(xp, state, m_power, s_direction, s_power, dispersion, params):
    """Linear + angular impulses of the main/side engines this tick.

    Geometry mirrors the reference's tip/side offset construction
    (lunar_lander.py:522-580); the particle recoil is folded directly into
    the body impulse.
    """
    angle = state[..., 4]
    tip_x = xp.sin(angle)
    tip_y = xp.cos(angle)
    side_x = -tip_y
    side_y = tip_x

    d0 = dispersion[..., 0] / SCALE
    d1 = dispersion[..., 1] / SCALE

    # main engine: thrust along -tip applied below the body
    ox_m = tip_x * (4 / SCALE + 2 * d0) + side_x * d1
    oy_m = -tip_y * (4 / SCALE + 2 * d0) - side_y * d1
    jx_m = -ox_m * params.main_power * m_power
    jy_m = -oy_m * params.main_power * m_power
    # application point relative to center of mass
    rx_m = ox_m
    ry_m = oy_m
    torque_m = rx_m * jy_m - ry_m * jx_m

    # side engines
    ox_s = tip_x * d0 + side_x * (3 * d1 + s_direction * SIDE_ENGINE_AWAY / SCALE)
    oy_s = -tip_y * d0 - side_y * (3 * d1 + s_direction * SIDE_ENGINE_AWAY / SCALE)
    jx_s = -ox_s * params.side_power * s_power
    jy_s = -oy_s * params.side_power * s_power
    rx_s = ox_s - tip_x * 17 / SCALE
    ry_s = oy_s + tip_y * SIDE_ENGINE_HEIGHT / SCALE
    torque_s = rx_s * jy_s - ry_s * jx_s

    jx = jx_m + jx_s
    jy = jy_m + jy_s
    torque = torque_m + torque_s
    return jx, jy, torque


def contact_forces(xp, state, terrain, params):
    """Spring-damper ground reaction at leg tips and hull probes.

    Returns (fx, fy, torque, leg1_contact, leg2_contact, hull_contact).
    """
    x = state[..., 0]
    y = state[..., 1]
    vx = state[..., 2]
    vy = state[..., 3]
    angle = state[..., 4]
    omega = state[..., 5]
    c = xp.cos(angle)
    s = xp.sin(angle)

    fx_total = xp.zeros_like(x)
    fy_total = xp.zeros_like(x)
    torque_total = xp.zeros_like(x)
    contacts = []

    all_pts = np.concatenate([_LEG_TIP, _HULL_PTS], axis=0)
    for idx in range(all_pts.shape[0]):
        bx, by = float(all_pts[idx, 0]), float(all_pts[idx, 1])
        rx, ry = _rotate(xp, bx, by, c, s)
        px = x + rx
        py = y + ry
        gy = ground_height(xp, terrain, px)
        depth = gy - py
        in_contact = depth > 0.0

        # point velocity = v + omega x r
        pvx = vx - omega * ry
        pvy = vy + omega * rx

        fn = xp.where(
            in_contact,
            params.contact_k * depth - params.contact_c * pvy,
            0.0,
        )
        fn = xp.maximum(fn, 0.0)
        ft = -xp.clip(
            params.contact_c * pvx, -params.friction_mu * fn, params.friction_mu * fn
        )

        fx_total = fx_total + ft
        fy_total = fy_total + fn
        torque_total = torque_total + (rx * fn - ry * ft)
        contacts.append(in_contact)

    leg1 = contacts[0]
    leg2 = contacts[1]
    hull = contacts[2]
    for extra in contacts[3:]:
        hull = hull | extra
    return fx_total, fy_total, torque_total, leg1, leg2, hull


def integrate_body(xp, state, jx, jy, j_torque, fx, fy, f_torque, params):
    """Semi-implicit Euler update with engine impulses + contact forces."""
    dt = params.dt
    m = params.mass
    inertia = params.inertia

    vx = state[..., 2] + jx / m + (fx / m) * dt
    vy = state[..., 3] + jy / m + (params.gravity + fy / m) * dt
    omega = state[..., 5] + j_torque / inertia + (f_torque / inertia) * dt

    x = state[..., 0] + vx * dt
    y = state[..., 1] + vy * dt
    angle = state[..., 4] + omega * dt
    return xp.stack([x, y, vx, vy, angle, omega], axis=-1)


def observe(xp, body, leg1, leg2):
    """The 8-dim LunarLander observation (reference lunar_lander.py:600)."""
    x = body[..., 0]
    y = body[..., 1]
    vx = body[..., 2]
    vy = body[..., 3]
    angle = body[..., 4]
    omega = body[..., 5]
    return xp.stack(
        [
            (x - W / 2) / (W / 2),
            (y - (HELIPAD_Y + LEG_DOWN / SCALE)) / (H / 2),
            vx * (W / 2) / FPS,
            vy * (H / 2) / FPS,
            angle,
            20.0 * omega / FPS,
            leg1.astype(body.dtype) if hasattr(leg1, "astype") else float(leg1),
            leg2.astype(body.dtype) if hasattr(leg2, "astype") else float(leg2),
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


def initial_state(xp, terrain_uniform, force_uniform2, params: LunarParams):
    """Initial episode state dict.

    ``terrain_uniform``: (..., CHUNKS) uniform(0,1) draws;
    ``force_uniform2``: (..., 2) uniform(-1,1) draws for the initial kick
    (reference applies uniform(-INITIAL_RANDOM, INITIAL_RANDOM) N of force
    to the center for one tick).
    """
    terrain = generate_terrain(xp, terrain_uniform)
    batch_shape = terrain_uniform.shape[:-1]
    zeros = xp.zeros(batch_shape)
    x = zeros + W / 2
    y = zeros + H
    kick = force_uniform2 * INITIAL_RANDOM
    vx = kick[..., 0] * params.dt / params.mass
    vy = kick[..., 1] * params.dt / params.mass
    body = xp.stack([x, y, vx, vy, zeros, zeros], axis=-1)
    obs0 = observe(xp, body, zeros > 1, zeros > 1)
    state = {
        "body": body,
        "terrain": terrain,
        "leg1": zeros > 1.0,
        "leg2": zeros > 1.0,
        "done": zeros > 1.0,
        "sleep_timer": zeros,
        "prev_shaping": shaping(xp, obs0),
        "r": zeros,
    }
    # The reference's reset runs one no-op physics tick and returns its obs
    # (reference lunar_lander.py:448: `return self.step(noop)[0]`) — so the
    # first observation shows one tick of free fall under the initial kick.
    # No engines fire, so the dispersion draw is irrelevant; wind is omitted
    # for this single tick.
    noop = xp.zeros(batch_shape, dtype=xp.int32)
    wind0 = xp.zeros(batch_shape + (2,))
    return full_step(xp, state, noop, wind0, wind0, params, continuous=False)


def full_step(xp, state, action, dispersion, wind, params: LunarParams, continuous: bool):
    """One complete LunarLander tick: engines, contact, integration, reward.

    ``dispersion``: (..., 2) uniform(-1,1); ``wind``: (..., 2) wind/torque
    terms (zeros when wind disabled). Returns the next state dict with the
    step's reward in ``"r"`` and termination in ``"done"``.
    """
    body = state["body"]
    m_power, s_direction, s_power = engine_activation(xp, action, continuous)
    jx, jy, torque = engine_impulses(xp, body, m_power, s_direction, s_power, dispersion, params)

    # wind force + turbulence torque (reference lunar_lander.py:470-510)
    jx = jx + wind[..., 0] * params.dt
    torque = torque + wind[..., 1] * params.dt

    fx, fy, f_torque, leg1, leg2, hull = contact_forces(xp, body, state["terrain"], params)
    new_body = integrate_body(xp, body, jx, jy, torque, fx, fy, f_torque, params)

    # sleep detection: at rest (on legs) for sleep_time seconds => landed
    lin_speed = xp.sqrt(new_body[..., 2] ** 2 + new_body[..., 3] ** 2)
    at_rest = (
        (lin_speed < params.sleep_lin_vel)
        & (xp.abs(new_body[..., 5]) < params.sleep_ang_vel)
        & (leg1 | leg2)
    )
    sleep_timer = xp.where(at_rest, state["sleep_timer"] + params.dt, 0.0)
    asleep = sleep_timer >= params.sleep_time

    obs = observe(xp, new_body, leg1, leg2)
    new_shaping = shaping(xp, obs)
    reward = new_shaping - state["prev_shaping"]
    reward = reward - m_power * 0.30 - s_power * 0.03

    crashed = hull | (xp.abs(obs[..., 0]) >= 1.0)
    terminated = crashed | asleep
    reward = xp.where(crashed, -100.0, xp.where(asleep, 100.0, reward))

    return {
        "body": new_body,
        "terrain": state["terrain"],
        "leg1": leg1,
        "leg2": leg2,
        "done": terminated,
        "sleep_timer": sleep_timer,
        "prev_shaping": new_shaping,
        "r": reward,
    }


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
