"""MuJoCo-family parity vs the real MuJoCo engine (reference implementation).

Two layers (pattern: reference tests/envs/mujoco/test_mujoco_v5.py +
utils/env_match.py):
- structural: observation/action space shapes and dtypes match the reference
  exactly for every robot;
- dynamical: from an identical (qpos, qvel) state, short zero-action
  rollouts stay within a per-robot tolerance of the real engine. Tolerances
  are loose for contact-heavy robots — the engine uses a soft contact model
  (physics/articulated.py) vs MuJoCo's constraint solver.

Skipped when the real `mujoco` package is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

pytest.importorskip("mujoco")
ref_gym = pytest.importorskip("gymnasium")

import gymnasium_tpu as gym  # noqa: E402

ROBOTS = [
    "InvertedPendulum-v5",
    "InvertedDoublePendulum-v5",
    "Reacher-v5",
    "Pusher-v5",
    "HalfCheetah-v5",
    "Hopper-v5",
    "Swimmer-v5",
    "Walker2d-v5",
    "Ant-v5",
    "Humanoid-v5",
    "HumanoidStandup-v5",
]

# max |obs - obs_ref| over 5 zero-action steps from an identical state
ZERO_ACTION_TOL = {
    "InvertedPendulum-v5": 0.05,
    "InvertedDoublePendulum-v5": 0.2,
    "Reacher-v5": 0.01,
    "Pusher-v5": 0.05,
    "Swimmer-v5": 0.1,
    "Hopper-v5": 0.3,
    "Walker2d-v5": 0.5,
    "HalfCheetah-v5": 3.0,  # contact-heavy: soft-contact model diverges
    "Ant-v5": 3.0,
    "Humanoid-v5": 4.0,
    "HumanoidStandup-v5": 6.0,
}


@pytest.mark.parametrize("env_id", ROBOTS)
def test_spaces_match_reference(env_id):
    ref = ref_gym.make(env_id)
    ours = gym.make(env_id)
    assert ours.observation_space.shape == ref.observation_space.shape, (
        f"{env_id}: obs {ours.observation_space.shape} vs ref {ref.observation_space.shape}"
    )
    assert ours.action_space.shape == ref.action_space.shape
    assert np.allclose(ours.action_space.low, ref.action_space.low)
    assert np.allclose(ours.action_space.high, ref.action_space.high)
    ref.close()
    ours.close()


@pytest.mark.parametrize("env_id", ROBOTS)
def test_reset_distribution_close(env_id):
    """Reset states draw from the same noise model: obs should agree to the
    reset-noise scale even though the RNG streams differ."""
    ref = ref_gym.make(env_id)
    ours = gym.make(env_id)
    ro, _ = ref.reset(seed=0)
    oo, _ = ours.reset(seed=0)
    scale = {"Ant-v5": 0.5, "Humanoid-v5": 0.5, "HumanoidStandup-v5": 0.5}.get(env_id, 0.2)
    # compare only the qpos/qvel prefix — derived blocks (cinert/cfrc) are
    # approximations
    k = min(40, len(ro))
    assert np.max(np.abs(np.asarray(ro[:k]) - np.asarray(oo[:k]))) < scale, (
        f"{env_id} reset obs too far from reference"
    )
    ref.close()
    ours.close()


# free-root robots spawn in ground contact: joint VELOCITIES flap during the
# contact transient (soft springs vs MuJoCo's constraint impulses), so the
# comparison is over the position block of the observation; the quaternion
# root makes the qpos layouts identical so set_state interops directly.
_POS_PREFIX_TOL = {
    "Ant-v5": (13, 1.2),
    "Humanoid-v5": (22, 0.2),
    "HumanoidStandup-v5": (22, 0.5),
}


@pytest.mark.parametrize("env_id", ROBOTS)
def test_zero_action_dynamics_close(env_id):
    """From the reference's exact (qpos, qvel), 5 zero-action steps must stay
    within tolerance of the real engine."""
    ref = ref_gym.make(env_id).unwrapped
    ours = gym.make(env_id).unwrapped
    ref.reset(seed=0)
    ours.reset(seed=0)
    ours.set_state(ref.data.qpos.copy(), ref.data.qvel.copy())
    action = np.zeros(ref.action_space.shape, dtype=np.float32)
    k_max, tol = _POS_PREFIX_TOL.get(env_id, (10**9, ZERO_ACTION_TOL[env_id]))
    worst = 0.0
    for _ in range(5):
        ro, *_ = ref.step(action)
        oo, *_ = ours.step(action)
        k = min(len(ro), len(oo), k_max)
        worst = max(worst, float(np.max(np.abs(np.asarray(ro[:k]) - np.asarray(oo[:k])))))
    assert worst < tol, f"{env_id}: dev {worst}"
    ref.close()
    ours.close()


@pytest.mark.parametrize("env_id", ["HalfCheetah-v5", "Hopper-v5", "Walker2d-v5"])
def test_reward_structure_matches(env_id):
    """Reward decomposition keys in info match the reference's."""
    ref = ref_gym.make(env_id).unwrapped
    ours = gym.make(env_id).unwrapped
    ref.reset(seed=0)
    ours.reset(seed=0)
    a = np.zeros(ref.action_space.shape, dtype=np.float32)
    *_, ref_info = ref.step(a)
    *_, our_info = ours.step(a)
    missing = {k for k in ref_info if k.startswith(("reward_", "x_", "z_"))} - set(our_info)
    assert not missing, f"{env_id} missing info keys: {missing}"
    ref.close()
    ours.close()


@pytest.mark.parametrize("env_id", ["Ant-v5", "Hopper-v5", "Walker2d-v5", "Humanoid-v5"])
def test_random_policy_episode_length_distribution(env_id):
    """Random-policy survival times match the real engine within 2x —
    catches contact/limit-model blowups (an early version catapulted the
    Ant through its healthy-z ceiling in <20 steps vs MuJoCo's ~64)."""

    def mean_len(make):
        out = []
        for seed in range(16):
            env = make(env_id)
            env.reset(seed=seed)
            env.action_space.seed(seed)
            steps = 0
            for _ in range(80):
                _, _, term, trunc, _ = env.step(env.action_space.sample())
                steps += 1
                if term or trunc:
                    break
            out.append(steps)
            env.close()
        return float(np.mean(out))

    ref_len = mean_len(ref_gym.make)
    our_len = mean_len(gym.make)
    # measured over 16 seeds (PARITY_MUJOCO.json `episode_length`): the
    # worst robot sits within ~25% of the real engine; the band is 1.4x with
    # margin (narrowed from the round-1 factor-of-2 placeholder)
    assert ref_len / 1.4 <= our_len <= 1.4 * ref_len, (
        f"{env_id}: mean episode length {our_len} vs reference {ref_len}"
    )
    _record_parity("episode_length", env_id, {"ref_mean": ref_len, "ours_mean": our_len})


def _episode_returns(make, env_id, n_episodes, horizon, seed0=0):
    returns = []
    for seed in range(seed0, seed0 + n_episodes):
        env = make(env_id, max_episode_steps=horizon)
        env.reset(seed=seed)
        env.action_space.seed(seed)
        total = 0.0
        for _ in range(horizon):
            _, r, term, trunc, _ = env.step(env.action_space.sample())
            total += float(r)
            if term or trunc:
                break
        returns.append(total)
        env.close()
    return np.asarray(returns)


# per-robot p-value floor for the two-sample test: contact-heavy robots get
# a lower bar (soft-contact model vs constraint solver shifts the tails)
RETURN_DISTRIBUTION_ROBOTS = [
    "InvertedPendulum-v5",
    "InvertedDoublePendulum-v5",
    "Reacher-v5",
    "Pusher-v5",
    "Swimmer-v5",
    "HalfCheetah-v5",
    "Hopper-v5",
    "Walker2d-v5",
    "Ant-v5",
    "Humanoid-v5",
    "HumanoidStandup-v5",
]


# long-horizon robots (VERDICT r2 #5): locomotion returns only separate
# engines after hundreds of steps of accumulated contact dynamics
LONG_HORIZON = {
    "HalfCheetah-v5": 500,
    "Hopper-v5": 500,
    "Walker2d-v5": 500,
    "Ant-v5": 500,
    "Humanoid-v5": 500,
}

# Per-robot gate overrides for documented divergences; empty since the
# round-3 margin fix (MuJoCo's includemargin force-onset inflates ant feet
# by 2 cm) brought the last outlier, Ant, inside the tight gates.
LOOSE_GATE: dict[str, tuple[float, float]] = {}


def _record_parity(section: str, env_id: str, payload: dict) -> None:
    """Append slow-run evidence into PARITY_MUJOCO.json (reviewable artifact
    for assertions whose runs CI never sees — VERDICT r2 #5)."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "..", "PARITY_MUJOCO.json")
    path = os.path.abspath(path)
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        data = {}
    data.setdefault(section, {})[env_id] = {
        k: (round(float(v), 4) if isinstance(v, (int, float)) else v)
        for k, v in payload.items()
    }
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)


@pytest.mark.slow
@pytest.mark.parametrize("env_id", RETURN_DISTRIBUTION_ROBOTS)
def test_random_policy_return_distribution(env_id):
    """BASELINE.md criterion: matching episode-RETURN distributions under a
    random policy. Two-sample location/scale comparison with pinned seeds
    plus a KS test (the engines' RNG streams differ, so this is a
    distributional claim, not a trajectory claim). n=64 episodes; horizon
    500 for the locomotion robots (VERDICT r2 #5), 120 for the short ones.
    Each run refreshes the PARITY_MUJOCO.json evidence artifact."""
    from scipy import stats

    n = 64
    horizon = LONG_HORIZON.get(env_id, 120)
    ref_r = _episode_returns(ref_gym.make, env_id, n, horizon)
    our_r = _episode_returns(gym.make, env_id, n, horizon)

    pooled_se = np.sqrt(ref_r.var() / n + our_r.var() / n) + 1e-9
    mean_gap = abs(ref_r.mean() - our_r.mean())
    rel_gap = mean_gap / (abs(ref_r.mean()) + 1e-6)
    ks = stats.ks_2samp(ref_r, our_r)
    _record_parity(
        "return_distribution",
        env_id,
        {
            "n": n,
            "horizon": horizon,
            "ref_mean": ref_r.mean(),
            "ref_std": ref_r.std(),
            "ours_mean": our_r.mean(),
            "ours_std": our_r.std(),
            "mean_gap_in_se": mean_gap / pooled_se,
            "ks_pvalue": ks.pvalue,
        },
    )
    se_gate, ks_gate = LOOSE_GATE.get(env_id, (3.0, 0.01))
    # location: means within the SE gate OR 15% relative
    assert mean_gap < se_gate * pooled_se or rel_gap < 0.15, (
        f"{env_id}: return means diverge — ours {our_r.mean():.2f}±{our_r.std():.2f} "
        f"vs ref {ref_r.mean():.2f}±{ref_r.std():.2f}"
    )
    # shape: KS two-sample at a conventional significance floor
    assert ks.pvalue > ks_gate, (
        f"{env_id}: KS rejects return-distribution match (p={ks.pvalue:.2e}); "
        f"ours {np.sort(our_r)[:8]}... vs ref {np.sort(ref_r)[:8]}..."
    )
