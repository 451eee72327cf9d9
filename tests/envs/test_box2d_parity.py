"""Box2D-family parity vs the reference (which runs the real Box2D engine).

The rigid-body engine is a re-implementation (envs/dynamics/lunar_lander.py,
physics/planar.py), so parity is distributional, not bit-exact: resets align
to the reference's RNG stream, and short trajectories under identical action
sequences stay within tolerance before contact chaos takes over.

Skipped when `Box2D` is unavailable.
"""

import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

pytest.importorskip("Box2D")
ref_gym = pytest.importorskip("gymnasium")

import gymnasium_tpu as gym  # noqa: E402

LANDERS = ["LunarLander-v3", "LunarLanderContinuous-v3"]


@pytest.mark.parametrize("env_id", LANDERS + ["BipedalWalker-v3", "BipedalWalkerHardcore-v3"])
def test_spaces_match_reference(env_id):
    ref = ref_gym.make(env_id)
    ours = gym.make(env_id)
    assert ours.observation_space.shape == ref.observation_space.shape
    if hasattr(ref.action_space, "n"):
        assert ours.action_space.n == ref.action_space.n
    else:
        assert ours.action_space.shape == ref.action_space.shape
        assert np.allclose(np.asarray(ours.action_space.low), ref.action_space.low)
        assert np.allclose(np.asarray(ours.action_space.high), ref.action_space.high)
    ref.close()
    ours.close()


@pytest.mark.parametrize("env_id", LANDERS)
@pytest.mark.parametrize("seed", [0, 3, 7])
def test_lander_reset_matches_reference_stream(env_id, seed):
    """Terrain + initial-kick draws consume the reference's exact RNG stream,
    so the reset observation agrees to ~1e-3 (legs' joint torque on the first
    tick accounts for the small angular residual)."""
    ref = ref_gym.make(env_id)
    ours = gym.make(env_id)
    ro, _ = ref.reset(seed=seed)
    oo, _ = ours.reset(seed=seed)
    assert np.max(np.abs(ro[:4] - oo[:4])) < 5e-3, f"pos/vel reset dev {ro} vs {oo}"
    assert np.max(np.abs(ro[4:] - oo[4:])) < 0.15, "angle reset dev too large"
    ref.close()
    ours.close()


@pytest.mark.parametrize("env_id", LANDERS)
def test_lander_early_trajectory_close(env_id):
    """10 steps under identical actions stay within loose tolerance of the
    real Box2D engine (pre-contact free flight + engine impulses)."""
    ref = ref_gym.make(env_id).unwrapped
    ours = gym.make(env_id).unwrapped
    ref.reset(seed=2)
    ours.reset(seed=2)
    if env_id.endswith("Continuous-v3"):
        action = np.array([0.5, 0.0], np.float32)
    else:
        action = 2  # main engine
    worst = 0.0
    for _ in range(10):
        ro, *_ = ref.step(action)
        oo, *_ = ours.step(action)
        worst = max(worst, float(np.max(np.abs(ro - oo))))
    assert worst < 0.3, f"{env_id}: early trajectory dev {worst}"
    ref.close()
    ours.close()


def test_lander_terrain_heights_bit_match():
    """The terrain generator reproduces the reference's smoothing (including
    its height[-1] wraparound) on the same draws."""
    from gymnasium_tpu.envs.dynamics import lunar_lander as dyn

    rng = np.random.default_rng(0)
    u = rng.uniform(0, 1, size=(dyn.CHUNKS + 1,))
    height = u * (dyn.H / 2)
    for i in range(dyn.CHUNKS // 2 - 2, dyn.CHUNKS // 2 + 3):
        height[i] = dyn.HELIPAD_Y
    expected = [
        0.33 * (height[i - 1] + height[i] + height[i + 1]) for i in range(dyn.CHUNKS)
    ]
    got = dyn.generate_terrain(np, u[None])[0]
    np.testing.assert_allclose(got, expected, rtol=1e-12)


@pytest.mark.parametrize("env_id", LANDERS)
def test_lander_return_distribution_overlaps(env_id):
    """Random-policy return distributions overlap: |mean difference| bounded
    by the pooled spread (contact chaos makes per-seed returns incomparable)."""
    ref = ref_gym.make(env_id)
    ours = gym.make(env_id)
    rets_r, rets_o = [], []
    for seed in range(8):
        ref.action_space.seed(seed)
        acts = [ref.action_space.sample() for _ in range(250)]

        def run(env):
            env.reset(seed=seed)
            tot = 0.0
            for a in acts:
                _, r, term, trunc, _ = env.step(a)
                tot += r
                if term or trunc:
                    break
            return tot

        rets_r.append(run(ref))
        rets_o.append(run(ours))
    mr, mo = np.mean(rets_r), np.mean(rets_o)
    spread = max(np.std(rets_r), np.std(rets_o), 50.0)
    assert abs(mr - mo) < 3 * spread, (
        f"{env_id}: mean return {mo:.0f} vs reference {mr:.0f} (spread {spread:.0f})"
    )
    ref.close()
    ours.close()
