"""Training utilities: pure-JAX learners over FuncEnvs."""

from gymnasium_tpu.train.ppo import PPOConfig, PPOState, init_ppo, make_train_step, train

__all__ = ["PPOConfig", "PPOState", "init_ppo", "make_train_step", "train"]
