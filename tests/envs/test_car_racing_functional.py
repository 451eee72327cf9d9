"""Device-resident CarRacing tests: track geometry, car physics, pixel
observations, reward/termination semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymnasium_tpu.envs.box2d.car_racing import PLAYFIELD, TRACK_WIDTH
from gymnasium_tpu.envs.box2d.car_racing_functional import (
    NUM_TILES,
    CarRacingFunctional,
)


@pytest.fixture(scope="module")
def env_and_state():
    fe = CarRacingFunctional()
    state = fe.initial(jax.random.PRNGKey(0))
    return fe, state


def test_track_is_closed_loop(env_and_state):
    _, state = env_and_state
    centers = np.asarray(state["centers"])
    assert centers.shape == (NUM_TILES, 2)
    gaps = np.linalg.norm(centers - np.roll(centers, -1, axis=0), axis=-1)
    assert gaps.max() < 10.0, "spline gap too large — not a contiguous track"
    assert np.abs(centers).max() < PLAYFIELD, "track leaves the playfield"


def test_tracks_differ_by_seed():
    fe = CarRacingFunctional()
    a = np.asarray(fe.initial(jax.random.PRNGKey(1))["centers"])
    b = np.asarray(fe.initial(jax.random.PRNGKey(2))["centers"])
    assert not np.allclose(a, b)


def test_car_starts_on_track(env_and_state):
    _, state = env_and_state
    centers = np.asarray(state["centers"])
    pos = np.asarray(state["hull"][:2])
    assert np.linalg.norm(centers - pos, axis=-1).min() < TRACK_WIDTH


def test_observation_shape_and_palette(env_and_state):
    fe, state = env_and_state
    obs = np.asarray(fe.observation(state, None))
    assert obs.shape == (96, 96, 3) and obs.dtype == np.uint8
    road = (obs == np.array([102, 102, 102])).all(-1)
    car = (obs[:, :, 0] == 204) & (obs[:, :, 1] == 0)
    bar = (obs == 0).all(-1)
    assert 0.1 < road.mean() < 0.8, "road should occupy part of the frame"
    assert car.sum() > 10, "car rectangle missing"
    assert bar.any(), "status bar missing"
    # car sits on road: pixels just outside the car rectangle are road
    assert road[50, 40] or road[50, 56]


def test_full_throttle_accelerates(env_and_state):
    fe, state = env_and_state
    a = jnp.asarray([0.0, 1.0, 0.0])
    for _ in range(50):
        state = fe.transition(state, a, None)
    speed = float(jnp.sqrt(state["hull"][3] ** 2 + state["hull"][4] ** 2))
    assert speed > 10.0, f"car too slow after 50 throttle steps: {speed}"
    assert int(state["visited"].sum()) > 1, "no tiles visited while driving"


def test_reward_structure(env_and_state):
    fe, state = env_and_state
    a = jnp.asarray([0.0, 1.0, 0.0])
    rewards = []
    for _ in range(60):
        state = fe.transition(state, a, None)
        rewards.append(float(state["r"]))
    rewards = np.asarray(rewards)
    # every step costs 0.1; visited tiles add 1000/NUM_TILES
    tile_bonus = 1000.0 / NUM_TILES
    assert np.all(
        (np.abs(rewards + 0.1) < 1e-5) | (np.abs(rewards + 0.1 - tile_bonus) < 1e-4)
    ), "rewards must be -0.1 or -0.1 + tile bonus"
    assert (rewards > 0).sum() > 0, "driving forward should visit tiles"


def test_brake_stops_car(env_and_state):
    fe, state = env_and_state
    gas = jnp.asarray([0.0, 1.0, 0.0])
    brake = jnp.asarray([0.0, 0.0, 1.0])
    for _ in range(40):
        state = fe.transition(state, gas, None)
    for _ in range(60):
        state = fe.transition(state, brake, None)
    speed = float(jnp.sqrt(state["hull"][3] ** 2 + state["hull"][4] ** 2))
    assert speed < 2.0, f"car should stop under full brake, speed {speed}"


def test_offroad_termination():
    fe = CarRacingFunctional()
    state = fe.initial(jax.random.PRNGKey(0))
    # teleport the car off the playfield
    hull = state["hull"].at[0].set(PLAYFIELD + 10.0).at[3].set(0.0)
    state = dict(state, hull=hull)
    state = fe.transition(state, jnp.asarray([0.0, 0.0, 0.0]), None)
    assert bool(state["done"])
    assert float(state["r"]) == -100.0


def test_discrete_action_mode():
    fe = CarRacingFunctional(options={"continuous": False})
    assert fe.action_space.n == 5
    state = fe.initial(jax.random.PRNGKey(0))
    for _ in range(20):
        state = fe.transition(state, jnp.asarray(3), None)  # gas
    speed = float(jnp.sqrt(state["hull"][3] ** 2 + state["hull"][4] ** 2))
    assert speed > 1.0


def test_vmapped_batch():
    fe = CarRacingFunctional()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(fe.initial)(keys)
    assert states["centers"].shape == (4, NUM_TILES, 2)
    acts = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (4, 1))
    step = jax.jit(jax.vmap(lambda s, a: fe.transition(s, a, None)))
    for _ in range(5):
        states = step(states, acts)
    obs = jax.jit(jax.vmap(lambda s: fe.observation(s, None)))(states)
    assert obs.shape == (4, 96, 96, 3)


def test_rasterizer_matches_all_tiles_sweep():
    """The view-rect tile culling + separable car-frame sweep must reproduce
    the brute-force world-frame road mask exactly: any culled tile is
    provably out of reach of every pixel (outside the rotated view window),
    and the car-frame factorization changes only sub-ulp boundary pixels."""
    from gymnasium_tpu.envs.box2d.car_racing import STATE_H, STATE_W

    fe = CarRacingFunctional()
    obs_fn = jax.jit(lambda s: fe.observation(s, None))
    road_color = np.array([102, 102, 102])
    for seed in range(4):
        state = fe.initial(jax.random.PRNGKey(seed))
        centers = np.asarray(state["centers"])
        betas = np.asarray(state["betas"])
        # park the car at several along-track positions, incl. near hairpins
        for tile in [0, 50, NUM_TILES // 3, NUM_TILES // 2, NUM_TILES - 20]:
            hull = np.zeros(6, np.float32)
            hull[:2] = centers[tile]
            hull[2] = betas[tile]
            state = dict(state, hull=jnp.asarray(hull))
            obs = np.asarray(obs_fn(state))
            got_road = (obs == road_color).all(-1)

            # brute-force oracle: min distance over ALL tiles, no culling
            ppm = STATE_W / 30.0
            px = np.arange(STATE_W, dtype=np.float32)
            py = np.arange(STATE_H, dtype=np.float32)
            vx = (px[None, :] - STATE_W / 2) / ppm
            vy = (STATE_H * 0.75 - py[:, None]) / ppm
            ca, sa = np.cos(hull[2]), np.sin(hull[2])
            wx = hull[0] + vx * ca - vy * sa
            wy = hull[1] + vx * sa + vy * ca
            d2 = (wx[..., None] - centers[None, None, :, 0]) ** 2 + (
                wy[..., None] - centers[None, None, :, 1]
            ) ** 2
            want_road = d2.min(-1) <= TRACK_WIDTH**2
            # exclude pixels the car/status-bar overlays paint over
            overlay = ((np.abs(vx) <= 1.5) & (np.abs(vy) <= 2.5)) | (
                py[:, None] >= STATE_H - 4
            )
            # f32-vs-f64 distance round-off flips only sub-ulp boundary
            # pixels; everything else must agree bit-for-bit
            boundary = np.abs(d2.min(-1) - TRACK_WIDTH**2) < 1e-3
            mism = got_road != want_road
            assert not (mism & ~overlay & ~boundary).any(), (
                f"seed {seed} tile {tile}: culled rasterizer diverges on "
                f"{int((mism & ~overlay).sum())} px"
            )


def test_raster_slots_never_overflow():
    """The compaction bound behind the rasterizer's exactness claim: across
    many tracks and EVERY along-track car pose (plus off-road poses between
    track branches), the number of tiles inside the margin-padded view
    rectangle stays below RASTER_TILES, so no reachable tile is dropped."""
    from gymnasium_tpu.envs.box2d.car_racing_functional import RASTER_TILES

    fe = CarRacingFunctional()
    worst = 0
    for seed in range(16):
        state = fe.initial(jax.random.PRNGKey(seed))
        centers = np.asarray(state["centers"])
        betas = np.asarray(state["betas"])
        margin = TRACK_WIDTH * 1.001
        # every tile center as the car pose, with the track heading there
        rel = centers[None, :, :] - centers[:, None, :]  # (pose, tile, 2)
        ca, sa = np.cos(betas)[:, None], np.sin(betas)[:, None]
        tx = rel[..., 0] * ca + rel[..., 1] * sa
        ty = -rel[..., 0] * sa + rel[..., 1] * ca
        in_rect = (
            (np.abs(tx) <= 15.0 + margin)
            & (ty >= -7.5 - margin)
            & (ty <= 22.5 + margin)
        )
        worst = max(worst, int(in_rect.sum(axis=1).max()))
        # midpoints between all pairs of nearby-but-far-in-arc tiles — the
        # densest off-road poses (between parallel straights / hairpins)
        mid = (centers[::8, None, :] + centers[None, ::8, :]) / 2.0
        mid = mid.reshape(-1, 2)
        relm = centers[None, :, :] - mid[:, None, :]
        d2 = relm[..., 0] ** 2 + relm[..., 1] ** 2
        # disc bound (heading-free upper bound on any rect count)
        r_disc = np.hypot(15.0 + margin, np.maximum(22.5, 7.5) + margin)
        worst = max(worst, int((d2 <= r_disc**2).sum(axis=1).max()))
    assert worst <= RASTER_TILES, (
        f"view-rect tile count {worst} exceeds RASTER_TILES={RASTER_TILES}"
    )
