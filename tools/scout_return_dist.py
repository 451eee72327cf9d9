"""Scout: random-policy return-distribution comparison vs the reference.

Usage: JAX_PLATFORMS=cpu python tools/scout_return_dist.py ENV_ID [horizon] [n] [cap]

Prints ref/ours mean±std, mean gap in SE, and the KS p-value — the same
statistics the parity gate (tests/envs/test_mujoco_parity.py) asserts on.
Optional ``cap`` overrides ArticulatedModel.contact_stiffness before the
model loads, for tradeoff scouting.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def episode_returns(make, env_id, n, horizon, seed0=0):
    returns, lengths = [], []
    for seed in range(seed0, seed0 + n):
        env = make(env_id, max_episode_steps=horizon)
        env.reset(seed=seed)
        env.action_space.seed(seed)
        total, steps = 0.0, 0
        for _ in range(horizon):
            _, r, term, trunc, _ = env.step(env.action_space.sample())
            total += float(r)
            steps += 1
            if term or trunc:
                break
        returns.append(total)
        lengths.append(steps)
        env.close()
    return np.asarray(returns), np.asarray(lengths)


def main():
    from scipy import stats

    env_id = sys.argv[1]
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    if len(sys.argv) > 4:
        from gymnasium_tpu.physics import articulated as art

        overrides = {"contact_stiffness": float(sys.argv[4])}
        if len(sys.argv) > 5:
            overrides["contact_damp_ratio"] = float(sys.argv[5])
        if len(sys.argv) > 6:
            overrides["contact_alpha"] = float(sys.argv[6])
        d = list(art.ArticulatedModel.__new__.__defaults__)
        off = len(art.ArticulatedModel._fields) - len(d)
        for k, v in overrides.items():
            d[art.ArticulatedModel._fields.index(k) - off] = v
        art.ArticulatedModel.__new__.__defaults__ = tuple(d)

    import gymnasium as ref_gym

    import gymnasium_tpu as gym

    ref_r, ref_l = episode_returns(ref_gym.make, env_id, n, horizon)
    our_r, our_l = episode_returns(gym.make, env_id, n, horizon)
    pooled_se = np.sqrt(ref_r.var() / n + our_r.var() / n) + 1e-9
    gap = abs(ref_r.mean() - our_r.mean())
    ks = stats.ks_2samp(ref_r, our_r)
    print(
        f"{env_id} h={horizon} n={n}: "
        f"ref {ref_r.mean():.1f}±{ref_r.std():.1f} (len {ref_l.mean():.1f}) "
        f"ours {our_r.mean():.1f}±{our_r.std():.1f} (len {our_l.mean():.1f}) "
        f"gap={gap / pooled_se:.2f}SE rel={gap / (abs(ref_r.mean()) + 1e-6):.3f} "
        f"KS p={ks.pvalue:.4f}"
    )


if __name__ == "__main__":
    main()
