"""Discrete space: integers in ``[start, start + n)``.

Parity with reference gymnasium/spaces/discrete.py:15-217 including binary
``mask`` and float ``probability`` sampling; jittable ``sample_jax`` added.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

from gymnasium_tpu.spaces.space import Space


class Discrete(Space[np.int64]):
    r"""Finite set :math:`\{start, start+1, \dots, start+n-1\}`."""

    def __init__(
        self,
        n: int | np.integer,
        seed: int | np.random.Generator | None = None,
        start: int | np.integer = 0,
    ):
        assert np.issubdtype(type(n), np.integer), f"Expects `n` to be an int, actual type: {type(n)}"
        assert n > 0, "n (counts of elements) have to be positive"
        assert np.issubdtype(type(start), np.integer), f"Expects `start` to be an int, actual type: {type(start)}"
        self.n = np.int64(n)
        self.start = np.int64(start)
        super().__init__((), np.int64, seed)

    @property
    def is_np_flattenable(self) -> bool:
        return True

    def sample(self, mask: np.ndarray | None = None, probability: np.ndarray | None = None) -> np.int64:
        """Uniform sample; with ``mask`` (int8 0/1) restrict support; with
        ``probability`` (float, sums to 1) sample from that distribution."""
        if mask is not None and probability is not None:
            raise ValueError("Only one of `mask` or `probability` can be provided")

        if mask is not None:
            assert isinstance(mask, np.ndarray), f"Expects mask to be np.ndarray, actual type: {type(mask)}"
            assert mask.dtype == np.int8, f"Expects mask dtype np.int8, actual dtype: {mask.dtype}"
            assert mask.shape == (int(self.n),), f"Expects mask shape ({self.n},), actual shape: {mask.shape}"
            valid = np.logical_and(mask == 1, np.logical_or(mask == 0, mask == 1))
            assert np.all(np.logical_or(mask == 0, mask == 1)), f"Mask values must be 0 or 1, actual values: {mask}"
            valid_indices = np.where(mask)[0]
            if len(valid_indices) == 0:
                return self.start
            return self.start + self.np_random.choice(valid_indices)

        if probability is not None:
            assert isinstance(probability, np.ndarray), (
                f"Expects probability to be np.ndarray, actual type: {type(probability)}"
            )
            assert probability.shape == (int(self.n),), (
                f"Expects probability shape ({self.n},), actual shape: {probability.shape}"
            )
            assert np.all(probability >= 0), f"Probabilities must be non-negative, actual values: {probability}"
            assert np.isclose(np.sum(probability), 1.0), (
                f"Probabilities must sum to 1, actual sum: {np.sum(probability)}"
            )
            return self.start + self.np_random.choice(int(self.n), p=probability)

        return self.start + self.np_random.integers(self.n)

    def sample_jax(self, key, batch_shape: tuple[int, ...] = ()):
        import jax

        return self.start + jax.random.randint(
            key, tuple(batch_shape), 0, int(self.n), dtype="int32"
        )

    def contains(self, x: Any) -> bool:
        if isinstance(x, int):
            as_int64 = np.int64(x)
        elif (
            hasattr(x, "dtype")
            and np.issubdtype(x.dtype, np.integer)
            and getattr(x, "shape", None) == ()
        ):
            # covers numpy scalars/0-d arrays and device (jax) scalars
            as_int64 = np.int64(x)
        else:
            return False
        return bool(self.start <= as_int64 < self.start + self.n)

    def contains_jax(self, x):
        import jax.numpy as jnp

        return (x >= self.start) & (x < self.start + self.n)

    def __repr__(self) -> str:
        if self.start != 0:
            return f"Discrete({self.n}, start={self.start})"
        return f"Discrete({self.n})"

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, Discrete) and self.n == other.n and self.start == other.start

    def __setstate__(self, state: Iterable[tuple[str, Any]] | dict):
        super().__setstate__(state)
        if not hasattr(self, "start"):
            self.start = np.int64(0)

    def to_jsonable(self, sample_n):
        return [int(x) for x in sample_n]

    def from_jsonable(self, sample_n):
        return [np.int64(x) for x in sample_n]
