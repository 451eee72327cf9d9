"""Device-resident PPO on CartPole: rollout, GAE, and clipped-surrogate
updates all inside ONE jitted train step — no host/device round trips."""

import os

if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit platform request even where a TPU plugin overrides
    # the env var for the default backend (e.g. JAX_PLATFORMS=cpu runs)
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
from gymnasium_tpu.train.ppo import PPOConfig, train


def main():
    config = PPOConfig(
        num_envs=256,
        rollout_steps=128,
        hidden_sizes=(64, 64),
        num_minibatches=4,
        update_epochs=4,
        max_episode_steps=500,
    )
    train(CartPoleFunctional(), config, num_updates=100, seed=0, verbose=True)


if __name__ == "__main__":
    main()
