"""Box space: (possibly unbounded) n-dimensional continuous/integer intervals.

Behavioral parity with reference gymnasium/spaces/box.py:37-475 — per-element
low/high with dtype-aware bound casting, ``is_bounded``, and a ``sample`` that
mixes uniform / exponential / normal draws by boundedness — plus a jittable
``sample_jax`` for the device path (bounded boxes only; unbounded dimensions
use normal/exponential tails exactly as the host path does).
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence, SupportsFloat

import numpy as np

import gymnasium_tpu.logger as logger
from gymnasium_tpu.spaces.space import Space


def _broadcast(value, dtype: np.dtype, shape: tuple[int, ...]) -> np.ndarray:
    """Broadcast a scalar or array bound to ``shape`` with dtype-aware casting."""
    if np.isscalar(value) or (isinstance(value, np.ndarray) and value.shape == ()):
        value = float(value) if np.dtype(dtype).kind == "f" else value
        out = np.full(shape, value, dtype=float)
    else:
        out = np.broadcast_to(np.asarray(value, dtype=float), shape).copy()
    return out


def _cast_bound(bound: np.ndarray, dtype: np.dtype, is_low: bool) -> np.ndarray:
    """Cast a float bound array to ``dtype``, mapping infinities to dtype limits."""
    if dtype.kind in "iu":
        info = np.iinfo(dtype)
        out = bound.copy()
        out[np.isneginf(out)] = info.min
        out[np.isposinf(out)] = info.max
        return out.astype(dtype)
    if dtype.kind == "f" and dtype.itemsize < 8:
        # Narrow float dtypes cannot represent very large finite floats; clamp
        # finite out-of-range bounds to the dtype limits (infinities pass through).
        finfo = np.finfo(dtype)
        finite = np.isfinite(bound)
        out = bound.copy()
        out[finite] = np.clip(out[finite], -np.float64(finfo.max), np.float64(finfo.max))
        return out.astype(dtype)
    return bound.astype(dtype)


class Box(Space[np.ndarray]):
    r"""A (possibly unbounded) box in :math:`\mathbb{R}^n`.

    Each coordinate is bounded by ``low[i] <= x[i] <= high[i]`` where either
    bound may be infinite.
    """

    def __init__(
        self,
        low: SupportsFloat | np.ndarray,
        high: SupportsFloat | np.ndarray,
        shape: Sequence[int] | None = None,
        dtype: Any = np.float32,
        seed: int | np.random.Generator | None = None,
    ):
        assert dtype is not None, "Box dtype must not be None"
        dtype = np.dtype(dtype)
        assert dtype.kind in "fiu" or dtype == np.bool_, f"Invalid Box dtype: {dtype}"

        if shape is not None:
            shape = tuple(int(dim) for dim in shape)
        elif isinstance(low, np.ndarray) and low.shape != ():
            shape = low.shape
        elif isinstance(high, np.ndarray) and high.shape != ():
            shape = high.shape
        else:
            shape = (1,)

        low_f = _broadcast(low, dtype, shape)
        high_f = _broadcast(high, dtype, shape)
        if low_f.shape != shape or high_f.shape != shape:
            raise ValueError(
                f"Box low/high shape mismatch: low {low_f.shape}, high {high_f.shape}, shape {shape}"
            )
        if np.any(low_f > high_f):
            raise ValueError(f"Box low must be <= high, got low={low_f}, high={high_f}")

        self.bounded_below: np.ndarray = -np.inf < low_f
        self.bounded_above: np.ndarray = np.inf > high_f

        self.low = _cast_bound(low_f, dtype, is_low=True)
        self.high = _cast_bound(high_f, dtype, is_low=False)

        if np.any(self.low.astype(np.float64) > low_f) or np.any(
            self.high.astype(np.float64) < high_f
        ):
            logger.warn(f"Box bound precision lowered by casting to {dtype}")

        self.low_repr = _short_repr(self.low)
        self.high_repr = _short_repr(self.high)

        super().__init__(shape, dtype, seed)

    @property
    def shape(self) -> tuple[int, ...]:
        """Shape of box elements (always fixed)."""
        return self._shape  # type: ignore[return-value]

    @property
    def is_np_flattenable(self) -> bool:
        return True

    def is_bounded(self, manner: str = "both") -> bool:
        """Whether the box is bounded ``"below"``, ``"above"``, or ``"both"``."""
        below = bool(np.all(self.bounded_below))
        above = bool(np.all(self.bounded_above))
        if manner == "both":
            return below and above
        if manner == "below":
            return below
        if manner == "above":
            return above
        raise ValueError(f"manner must be 'both', 'below' or 'above', got {manner!r}")

    def sample(self, mask: None = None, probability: None = None) -> np.ndarray:
        """Sample mixing uniform/exponential/normal draws per-element boundedness."""
        if mask is not None:
            raise Exception("Box.sample cannot be provided a mask, actual value: " + str(mask))
        if probability is not None:
            raise Exception(
                "Box.sample cannot be provided a probability mask, actual value: "
                + str(probability)
            )

        high = self.high if self.dtype.kind == "f" else self.high.astype("int64") + 1
        sample = np.empty(self.shape)

        unbounded = ~self.bounded_below & ~self.bounded_above
        upp_bounded = ~self.bounded_below & self.bounded_above
        low_bounded = self.bounded_below & ~self.bounded_above
        bounded = self.bounded_below & self.bounded_above

        sample[unbounded] = self.np_random.normal(size=unbounded[unbounded].shape)
        sample[low_bounded] = (
            self.np_random.exponential(size=low_bounded[low_bounded].shape)
            + self.low[low_bounded]
        )
        sample[upp_bounded] = (
            -self.np_random.exponential(size=upp_bounded[upp_bounded].shape)
            + high[upp_bounded]
        )
        sample[bounded] = self.np_random.uniform(
            low=self.low[bounded], high=high[bounded], size=bounded[bounded].shape
        )

        if self.dtype.kind in "iu":
            sample = np.floor(sample)

        if self.dtype.kind in "iu":
            info = np.iinfo(self.dtype)
            sample = np.clip(sample, info.min, info.max)

        return sample.astype(self.dtype)

    def sample_jax(self, key, batch_shape: tuple[int, ...] = ()):
        """Jittable sampler with the same per-element boundedness mixture.

        ``batch_shape`` prepends leading axes drawn in one fused call — the
        preferred way to sample whole env batches (one threefry pass instead
        of N vmapped ones).
        """
        import jax
        import jax.numpy as jnp

        shape = tuple(batch_shape) + self.shape
        dtype = jnp.float32 if self.dtype.kind == "f" else jnp.int32
        k_u, k_n, k_e1, k_e2 = jax.random.split(key, 4)
        low = jnp.asarray(np.where(self.bounded_below, self.low, 0.0), jnp.float32)
        high = jnp.asarray(np.where(self.bounded_above, self.high, 0.0), jnp.float32)
        uniform = jax.random.uniform(k_u, shape, jnp.float32, 0.0, 1.0)
        normal = jax.random.normal(k_n, shape, jnp.float32)
        exp1 = jax.random.exponential(k_e1, shape, jnp.float32)
        exp2 = jax.random.exponential(k_e2, shape, jnp.float32)

        below = jnp.asarray(self.bounded_below)
        above = jnp.asarray(self.bounded_above)
        bounded = low + uniform * (high - low)
        sample = jnp.where(
            below & above,
            bounded,
            jnp.where(below, low + exp1, jnp.where(above, high - exp2, normal)),
        )
        if self.dtype.kind in "iu":
            sample = jnp.floor(sample)
        return sample.astype(dtype)

    def contains(self, x: Any) -> bool:
        if not isinstance(x, np.ndarray):
            try:
                x = np.asarray(x, dtype=self.dtype)
            except (ValueError, TypeError):
                return False
        return bool(
            np.can_cast(x.dtype, self.dtype)
            and x.shape == self.shape
            and np.all(x >= self.low)
            and np.all(x <= self.high)
        )

    def contains_jax(self, x):
        import jax.numpy as jnp

        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        return jnp.all(x >= low) & jnp.all(x <= high)

    def to_jsonable(self, sample_n: Sequence[np.ndarray]) -> list[list]:
        return [np.asarray(s).tolist() for s in sample_n]

    def from_jsonable(self, sample_n: Sequence[list]) -> list[np.ndarray]:
        return [np.asarray(s, dtype=self.dtype) for s in sample_n]

    def __repr__(self) -> str:
        return f"Box({self.low_repr}, {self.high_repr}, {self.shape}, {self.dtype})"

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Box)
            and self.shape == other.shape
            and self.dtype == other.dtype
            and np.allclose(self.low, other.low)
            and np.allclose(self.high, other.high)
        )

    def __setstate__(self, state: Iterable[tuple[str, Any]] | dict):
        super().__setstate__(state)
        # Rebuild derived reprs for pickles from older versions.
        if not hasattr(self, "low_repr"):
            self.low_repr = _short_repr(self.low)
        if not hasattr(self, "high_repr"):
            self.high_repr = _short_repr(self.high)


def _short_repr(arr: np.ndarray) -> str:
    """``'-1.0'`` when the array is constant, else its full repr."""
    if arr.size != 0 and np.min(arr) == np.max(arr):
        return str(np.min(arr))
    return np.array2string(arr)
