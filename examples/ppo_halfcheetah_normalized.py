"""PPO on HalfCheetah with observation AND return normalization running
entirely inside ONE jitted train step — the functional wrapper layer
(gymnasium_tpu/wrappers/func.py) folded into the compiled rollout.

The wrapper states (running mean/var, return accumulators, episode
statistics) live in the training carry and checkpoint with it. No host code
touches the hot loop; `episode_stats_to_infos` converts the device episode
statistics to the reference's info-dict format for logging.
"""

import os

if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit platform request even where a TPU plugin overrides
    # the env var for the default backend (e.g. JAX_PLATFORMS=cpu runs)
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import numpy as np

from gymnasium_tpu.envs.mujoco.half_cheetah import HalfCheetahFunctional
from gymnasium_tpu.train.ppo import PPOConfig, init_ppo, make_train_step
from gymnasium_tpu.wrappers.func import (
    EpisodeStatistics,
    NormalizeObservation,
    NormalizeReward,
)


def main():
    wrappers = (NormalizeObservation(), NormalizeReward(), EpisodeStatistics())
    config = PPOConfig(
        num_envs=256,
        rollout_steps=64,
        hidden_sizes=(64, 64),
        num_minibatches=4,
        update_epochs=2,
        max_episode_steps=200,
    )
    env = HalfCheetahFunctional()
    state, env_params, tx = init_ppo(env, config, jax.random.PRNGKey(0), wrappers=wrappers)
    train_step = jax.jit(make_train_step(env, config, env_params, tx, wrappers=wrappers))

    for update in range(30):
        state, metrics = train_step(state)
        if update % 5 == 0:
            obs_rms = state.env_carry.wrappers[0]
            print(
                f"update {update:3d}  loss={float(metrics['loss']):+.4f}  "
                f"episodes={int(metrics['episodes_finished'])}  "
                f"obs_rms_count={float(obs_rms.count):.0f}  "
                f"|obs_mean|={float(abs(np.asarray(obs_rms.mean)).mean()):.3f}"
            )
    print("done — normalization statistics evolved entirely on device")


if __name__ == "__main__":
    main()
