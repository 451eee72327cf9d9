"""SyncVectorEnv: serial host-side vectorization of arbitrary Python envs.

Parity with reference gymnasium/vector/sync_vector_env.py:26-378 — for-loop
over N sub-envs with preallocated batched buffers, the three autoreset modes,
masked partial reset, and call/get_attr/set_attr broadcast.

On this framework this class exists for wrapping arbitrary Python envs; the
device path is :class:`~gymnasium_tpu.vector.JaxVectorEnv`.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any, Callable, Iterator, Sequence

import numpy as np

from gymnasium_tpu import Env, Space
from gymnasium_tpu.error import Error
from gymnasium_tpu.spaces.utils import is_space_dtype_shape_equiv
from gymnasium_tpu.vector.utils import (
    batch_differing_spaces,
    batch_space,
    concatenate,
    create_empty_array,
    iterate,
)
from gymnasium_tpu.vector.vector_env import AutoresetMode, VectorEnv

__all__ = ["SyncVectorEnv"]


class SyncVectorEnv(VectorEnv):
    """Serially-stepped batched environment in a single process."""

    def __init__(
        self,
        env_fns: Iterator[Callable[[], Env]] | Sequence[Callable[[], Env]],
        copy: bool = True,
        observation_mode: str | Space = "same",
        autoreset_mode: str | AutoresetMode = AutoresetMode.NEXT_STEP,
    ):
        super().__init__()
        self.env_fns = env_fns
        self.copy = copy
        self.observation_mode = observation_mode
        self.autoreset_mode = (
            AutoresetMode(autoreset_mode) if isinstance(autoreset_mode, str) else autoreset_mode
        )
        assert isinstance(self.autoreset_mode, AutoresetMode)

        self.envs = [env_fn() for env_fn in env_fns]
        self.num_envs = len(self.envs)
        self.metadata = self.envs[0].metadata
        self.metadata["autoreset_mode"] = self.autoreset_mode
        self.render_mode = self.envs[0].render_mode

        self.single_action_space = self.envs[0].action_space
        self.action_space = batch_space(self.single_action_space, self.num_envs)

        if isinstance(observation_mode, tuple) and len(observation_mode) == 2:
            assert isinstance(observation_mode[0], Space)
            assert isinstance(observation_mode[1], Space)
            self.observation_space, self.single_observation_space = observation_mode
        elif observation_mode == "same":
            self.single_observation_space = self.envs[0].observation_space
            for env in self.envs:
                assert env.observation_space == self.single_observation_space, (
                    "SyncVectorEnv(..., observation_mode='same') however the sub-environments observation spaces are not equivalent. "
                    "If this is intentional, use `observation_mode='different'` instead."
                )
            self.observation_space = batch_space(self.single_observation_space, self.num_envs)
        elif observation_mode == "different":
            self.single_observation_space = self.envs[0].observation_space
            self.observation_space = batch_differing_spaces(
                [env.observation_space for env in self.envs]
            )
        else:
            raise ValueError(f"Invalid `observation_mode`, expected: 'same' or 'different' or tuple of single and batch observation space, actual got {observation_mode}")

        # check sub-environment obs and action spaces
        # (reference sync_vector_env.py:95-110 — also applies to tuple mode)
        for env in self.envs:
            if observation_mode == "same":
                assert env.observation_space == self.single_observation_space, (
                    f"SyncVectorEnv(..., observation_mode='same') however the sub-environments observation spaces are not equivalent. single_observation_space={self.single_observation_space}, sub-environment observation_space={env.observation_space}. If this is intentional, use `observation_mode='different'` instead."
                )
            else:
                assert is_space_dtype_shape_equiv(
                    env.observation_space, self.single_observation_space
                ), (
                    f"SyncVectorEnv(..., observation_mode='different' or custom space) however the sub-environments observation spaces do not share a common shape and dtype, single_observation_space={self.single_observation_space}, sub-environment observation space={env.observation_space}"
                )

            assert env.action_space == self.single_action_space, (
                f"Sub-environment action space doesn't make the `single_action_space`, action_space={env.action_space}, single_action_space={self.single_action_space}"
            )

        self._observations = create_empty_array(
            self.single_observation_space, n=self.num_envs, fn=np.zeros
        )
        self._rewards = np.zeros((self.num_envs,), dtype=np.float64)
        self._terminations = np.zeros((self.num_envs,), dtype=np.bool_)
        self._truncations = np.zeros((self.num_envs,), dtype=np.bool_)

        self._autoreset_envs = np.zeros((self.num_envs,), dtype=np.bool_)

    @property
    def np_random_seed(self) -> tuple[int, ...]:
        """Seeds of all sub-environments."""
        return self.get_attr("np_random_seed")

    @property
    def np_random(self) -> tuple[np.random.Generator, ...]:
        """Generators of all sub-environments."""
        return self.get_attr("np_random")

    def reset(
        self,
        *,
        seed: int | list[int | None] | None = None,
        options: dict[str, Any] | None = None,
    ):
        """Reset all (or a masked subset of) sub-environments."""
        if seed is None:
            seed = [None for _ in range(self.num_envs)]
        elif isinstance(seed, int):
            seed = [seed + i for i in range(self.num_envs)]
        assert len(seed) == self.num_envs, (
            f"If seeds are passed as a list the length must match num_envs={self.num_envs} but got length={len(seed)}."
        )

        # masked partial reset (reference sync_vector_env.py:192-220)
        if options is not None and "reset_mask" in options:
            reset_mask = options.pop("reset_mask")
            assert isinstance(reset_mask, np.ndarray), (
                f"`options['reset_mask': mask]` must be a numpy array, got {type(reset_mask)}"
            )
            assert reset_mask.shape == (self.num_envs,), (
                f"`options['reset_mask': mask]` must have shape `({self.num_envs},)`, got {reset_mask.shape}"
            )
            assert reset_mask.dtype == np.bool_, (
                f"`options['reset_mask': mask]` must have `dtype=np.bool_`, got {reset_mask.dtype}"
            )
            assert np.any(reset_mask), (
                f"`options['reset_mask': mask]` must contain a boolean array, got reset_mask={reset_mask}"
            )

            self._terminations[reset_mask] = False
            self._truncations[reset_mask] = False
            self._autoreset_envs[reset_mask] = False

            infos: dict[str, Any] = {}
            env_obs = {}
            for i, (env, env_seed, env_reset) in enumerate(zip(self.envs, seed, reset_mask)):
                if env_reset:
                    env_obs[i], env_info = env.reset(seed=env_seed, options=options)
                    infos = self._add_info(infos, env_info, i)
            # rebuild the batched observation with the refreshed entries
            prev = list(iterate(self.observation_space, self._observations))
            all_obs = [env_obs.get(i, prev[i]) for i in range(self.num_envs)]
            self._observations = concatenate(self.single_observation_space, all_obs, self._observations)
            return (deepcopy(self._observations) if self.copy else self._observations), infos

        self._terminations = np.zeros((self.num_envs,), dtype=np.bool_)
        self._truncations = np.zeros((self.num_envs,), dtype=np.bool_)
        self._autoreset_envs = np.zeros((self.num_envs,), dtype=np.bool_)

        observations, infos = [], {}
        for i, (env, single_seed) in enumerate(zip(self.envs, seed)):
            env_obs, env_info = env.reset(seed=single_seed, options=options)
            observations.append(env_obs)
            infos = self._add_info(infos, env_info, i)

        self._observations = concatenate(self.single_observation_space, observations, self._observations)
        return (deepcopy(self._observations) if self.copy else self._observations), infos

    def step(self, actions):
        """Step all sub-envs serially, applying the configured autoreset mode."""
        actions = iterate(self.action_space, actions)

        observations, infos = [], {}
        # strict zip raises ValueError when the action count mismatches
        # num_envs (reference sync_vector_env.py:251).
        for i, (action, _) in enumerate(zip(actions, self.envs, strict=True)):
            if self.autoreset_mode == AutoresetMode.NEXT_STEP:
                if self._autoreset_envs[i]:
                    env_obs, env_info = self.envs[i].reset()
                    self._rewards[i] = 0.0
                    self._terminations[i] = False
                    self._truncations[i] = False
                else:
                    (
                        env_obs,
                        self._rewards[i],
                        self._terminations[i],
                        self._truncations[i],
                        env_info,
                    ) = self.envs[i].step(action)
            elif self.autoreset_mode == AutoresetMode.SAME_STEP:
                (
                    env_obs,
                    self._rewards[i],
                    self._terminations[i],
                    self._truncations[i],
                    env_info,
                ) = self.envs[i].step(action)
                if self._terminations[i] or self._truncations[i]:
                    infos = self._add_info(
                        infos,
                        {"final_obs": env_obs, "final_info": env_info},
                        i,
                    )
                    env_obs, env_info = self.envs[i].reset()
            elif self.autoreset_mode == AutoresetMode.DISABLED:
                assert not self._autoreset_envs[i], (
                    f"Environment {i} is done and AutoresetMode is DISABLED; call `reset` with a reset_mask."
                )
                (
                    env_obs,
                    self._rewards[i],
                    self._terminations[i],
                    self._truncations[i],
                    env_info,
                ) = self.envs[i].step(action)
            else:
                raise ValueError(f"Unexpected autoreset mode, {self.autoreset_mode}")

            observations.append(env_obs)
            infos = self._add_info(infos, env_info, i)

        self._observations = concatenate(self.single_observation_space, observations, self._observations)
        self._autoreset_envs = np.logical_or(self._terminations, self._truncations)

        return (
            deepcopy(self._observations) if self.copy else self._observations,
            np.copy(self._rewards),
            np.copy(self._terminations),
            np.copy(self._truncations),
            infos,
        )

    def render(self) -> tuple | None:
        """Render all sub-envs, returning a tuple of frames."""
        return tuple(env.render() for env in self.envs)

    def call(self, name: str, *args: Any, **kwargs: Any) -> tuple[Any, ...]:
        """Call a method (or read an attribute) on every sub-env."""
        results = []
        for env in self.envs:
            function = env.get_wrapper_attr(name)
            if callable(function):
                results.append(function(*args, **kwargs))
            else:
                results.append(function)
        return tuple(results)

    def get_attr(self, name: str) -> tuple[Any, ...]:
        """Read attribute ``name`` from every sub-env."""
        return self.call(name)

    def set_attr(self, name: str, values: list[Any] | tuple[Any, ...] | Any):
        """Set attribute ``name`` on every sub-env."""
        if not isinstance(values, (list, tuple)):
            values = [values for _ in range(self.num_envs)]
        if len(values) != self.num_envs:
            raise ValueError(
                "Values must be a list or tuple with length equal to the number of environments. "
                f"Got `{len(values)}` values for {self.num_envs} environments."
            )
        for env, value in zip(self.envs, values):
            env.set_wrapper_attr(name, value)

    def close_extras(self, **kwargs: Any):
        if hasattr(self, "envs"):
            [env.close() for env in self.envs]
