"""Scout: zero-action 5-step obs deviation vs the real MuJoCo reference.

Usage: JAX_PLATFORMS=cpu python tools/scout_zero_action.py ENV_ID [cap] [damp_ratio] [alpha]

Mirrors tests/envs/test_mujoco_parity.py::test_zero_action_dynamics_close so
contact-material tradeoffs can be iterated without the full suite.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    env_id = sys.argv[1]
    if len(sys.argv) > 2:
        from gymnasium_tpu.physics import articulated as art

        overrides = {"contact_stiffness": float(sys.argv[2])}
        if len(sys.argv) > 3:
            overrides["contact_damp_ratio"] = float(sys.argv[3])
        if len(sys.argv) > 4:
            overrides["contact_alpha"] = float(sys.argv[4])
        d = list(art.ArticulatedModel.__new__.__defaults__)
        off = len(art.ArticulatedModel._fields) - len(d)
        for k, v in overrides.items():
            d[art.ArticulatedModel._fields.index(k) - off] = v
        art.ArticulatedModel.__new__.__defaults__ = tuple(d)

    import gymnasium as ref_gym

    import gymnasium_tpu as gym

    ref = ref_gym.make(env_id)
    ours = gym.make(env_id)
    ro, _ = ref.reset(seed=123)
    oo, _ = ours.reset(seed=123)
    action = np.zeros(ref.action_space.shape, dtype=np.float64)
    devs = []
    for _ in range(10):
        ro, *_ = ref.step(action)
        oo, *_ = ours.step(action)
        k = min(len(ro), len(oo))
        devs.append(float(np.max(np.abs(np.asarray(ro[:k]) - np.asarray(oo[:k])))))
    print(f"{env_id} per-step max-dev: " + " ".join(f"{d:.3f}" for d in devs))
    print(f"worst over first 5: {max(devs[:5]):.4f} (gate 0.5)")


if __name__ == "__main__":
    main()
