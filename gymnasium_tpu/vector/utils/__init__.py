"""Vector-env utilities: space batching, shared memory, misc helpers."""

from gymnasium_tpu.vector.utils.space_utils import (
    batch_differing_spaces,
    batch_space,
    concatenate,
    create_empty_array,
    iterate,
)

__all__ = [
    "batch_space",
    "batch_differing_spaces",
    "iterate",
    "concatenate",
    "create_empty_array",
    "create_shared_memory",
    "read_from_shared_memory",
    "write_to_shared_memory",
    "CloudpickleWrapper",
    "clear_mpi_env_vars",
]


def __getattr__(name):
    # Lazy: shared-memory and misc helpers import multiprocessing.
    if name in ("create_shared_memory", "read_from_shared_memory", "write_to_shared_memory"):
        from gymnasium_tpu.vector.utils import shared_memory

        return getattr(shared_memory, name)
    if name in ("CloudpickleWrapper", "clear_mpi_env_vars"):
        from gymnasium_tpu.vector.utils import misc

        return getattr(misc, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
