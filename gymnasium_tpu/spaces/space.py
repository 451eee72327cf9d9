"""Space base class.

API parity with reference gymnasium/spaces/space.py:19-163: ``shape``,
``dtype``, lazy ``np_random``, ``sample(mask, probability)``, ``contains``,
``seed``, ``is_np_flattenable``, ``to/from_jsonable``.

TPU-native extension: spaces double as *pytree specs*. Fixed-shape spaces
additionally expose :meth:`sample_jax` (jittable threefry sampling) and
:meth:`contains_jax` so that sampling and validation can run device-resident
inside a compiled step, with the numpy path kept for host-side parity tests.
"""

from __future__ import annotations

from typing import Any, Generic, Iterable, Mapping, Sequence, TypeVar

import numpy as np

from gymnasium_tpu.utils import seeding

T_cov = TypeVar("T_cov", covariant=True)

MaskNDArray = np.ndarray


class Space(Generic[T_cov]):
    """Superclass defining an observation/action domain.

    A space describes the set of valid elements, knows how to sample from it,
    and (for fixed-shape spaces) how to do so inside ``jax.jit``.
    """

    def __init__(
        self,
        shape: Sequence[int] | None = None,
        dtype: npt_like | None = None,
        seed: int | np.random.Generator | None = None,
    ):
        self._shape = None if shape is None else tuple(shape)
        self.dtype = None if dtype is None else np.dtype(dtype)
        self._np_random: np.random.Generator | None = None
        if seed is not None:
            if isinstance(seed, np.random.Generator):
                self._np_random = seed
            else:
                self.seed(seed)

    # -- numpy RNG ---------------------------------------------------------

    @property
    def np_random(self) -> np.random.Generator:
        """Lazily-initialised PCG64 generator used by :meth:`sample`."""
        if self._np_random is None:
            self.seed()
        if self._np_random is None:
            # Composite spaces' seed() seeds the subspaces without setting
            # _np_random (reference space.py:74-79) — fall back to fresh entropy.
            self._np_random, _ = seeding.np_random()
        return self._np_random

    @np_random.setter
    def np_random(self, value: np.random.Generator) -> None:
        self._np_random = value

    def seed(self, seed: int | None = None) -> int | dict[str, Any] | tuple[Any, ...]:
        """Seed the space's PRNG, returning the entropy actually used."""
        self._np_random, np_random_seed = seeding.np_random(seed)
        return np_random_seed

    # -- shape/dtype -------------------------------------------------------

    @property
    def shape(self) -> tuple[int, ...] | None:
        """Shape of elements of the space, or ``None`` if not fixed-shape."""
        return self._shape

    @property
    def is_np_flattenable(self) -> bool:
        """Whether the space can be flattened to a fixed-size numpy array."""
        raise NotImplementedError

    # -- sampling/membership ----------------------------------------------

    def sample(self, mask: Any | None = None, probability: Any | None = None) -> T_cov:
        """Randomly sample an element, optionally restricted by a mask."""
        raise NotImplementedError

    def contains(self, x: Any) -> bool:
        """Return whether ``x`` is a valid member of the space."""
        raise NotImplementedError

    def __contains__(self, x: Any) -> bool:
        return self.contains(x)

    # -- device path -------------------------------------------------------

    def sample_jax(self, key):
        """Jittable sample. Fixed-shape subclasses override; others raise."""
        raise NotImplementedError(
            f"{type(self).__name__} has no device-resident sampler; "
            "use the host-side sample() instead."
        )

    def contains_jax(self, x):
        """Jittable membership predicate returning a traced bool."""
        raise NotImplementedError(
            f"{type(self).__name__} has no device-resident contains; "
            "use the host-side contains() instead."
        )

    # -- (de)serialization -------------------------------------------------

    def to_jsonable(self, sample_n: Sequence[T_cov]) -> list[Any]:
        """Convert a batch of samples to a JSON-able list."""
        return list(sample_n)

    def from_jsonable(self, sample_n: list[Any]) -> list[T_cov]:
        """Convert a JSON-able list back to a batch of samples."""
        return sample_n

    # -- pickling ----------------------------------------------------------

    def __setstate__(self, state: Iterable[tuple[str, Any]] | Mapping[str, Any]):
        # Accept legacy pickles that stored `shape`/`np_random` directly
        # (reference space.py:129).
        state = dict(state)
        if "np_random" in state:
            state["_np_random"] = state.pop("np_random")
        if "shape" in state:
            state["_shape"] = state.pop("shape")
        self.__dict__.update(state)


# np.typing alias kept local to avoid a hard minimum-numpy-version pin.
npt_like = Any
