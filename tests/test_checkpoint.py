"""Checkpoint/resume: the env carry pytree round-trips and resumes exactly."""

import numpy as np

import gymnasium_tpu as gym
from gymnasium_tpu.utils.checkpoint import restore_pytree, save_pytree


def test_env_carry_checkpoint_resume(tmp_path):
    import jax

    env = gym.make_vec("CartPole-v1", num_envs=8, vectorization_mode="jax")
    env.reset(seed=0)
    for _ in range(5):
        env.step(np.zeros(8, dtype=np.int32))

    path = save_pytree(str(tmp_path / "carry"), env.carry)
    obs_a, r_a, *_ = env.step(np.ones(8, dtype=np.int32))

    # restore into a fresh env and take the same step
    env2 = gym.make_vec("CartPole-v1", num_envs=8, vectorization_mode="jax")
    env2.reset(seed=999)  # different seed: state fully replaced by restore
    restored = restore_pytree(path)
    if isinstance(restored, dict):  # orbax restores NamedTuples as dicts
        restored = type(env.carry)(**restored)
    env2.carry = jax.tree_util.tree_map(jax.numpy.asarray, restored)
    obs_b, r_b, *_ = env2.step(np.ones(8, dtype=np.int32))

    np.testing.assert_allclose(np.asarray(obs_a), np.asarray(obs_b), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))


def test_mujoco_state_snapshot():
    env = gym.make("HalfCheetah-v5", disable_env_checker=True).unwrapped
    env.reset(seed=0)
    for _ in range(3):
        env.step(env.action_space.sample())
    qpos, qvel = env.get_state()

    action = env.action_space.sample()
    obs_a, *_ = env.step(action)

    env.set_state(qpos, qvel)
    obs_b, *_ = env.step(action)
    np.testing.assert_allclose(obs_a, obs_b, rtol=1e-10)
