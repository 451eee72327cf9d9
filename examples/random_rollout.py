"""Classic stateful API — drop-in for reference Gymnasium code."""

import os

if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit platform request even where a TPU plugin overrides
    # the env var for the default backend (e.g. JAX_PLATFORMS=cpu runs)
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import gymnasium_tpu as gym


def main():
    env = gym.make("LunarLander-v3")
    obs, info = env.reset(seed=42)
    total, steps = 0.0, 0
    while True:
        action = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        total += float(reward)
        steps += 1
        if terminated or truncated:
            break
    print(f"episode finished after {steps} steps, return {total:.1f}")
    env.close()


if __name__ == "__main__":
    main()
