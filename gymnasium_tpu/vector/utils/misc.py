"""Multiprocessing helpers (reference gymnasium/vector/utils/misc.py:14-61)."""

from __future__ import annotations

import contextlib
import os

__all__ = ["CloudpickleWrapper", "clear_mpi_env_vars"]

_MPI_PREFIXES = ("OMPI_", "PMI_")


class CloudpickleWrapper:
    """Wrap a callable so it crosses process boundaries via cloudpickle.

    Plain pickle rejects lambdas and locally-defined env factories; routing
    the payload through cloudpickle on the sending side (the receiving side
    unpickles with the stdlib, since cloudpickle output is stdlib-loadable)
    lets AsyncVectorEnv ship arbitrary ``env_fns`` to its workers.
    """

    __slots__ = ("fn",)

    def __init__(self, fn):
        self.fn = fn

    def __call__(self):
        return self.fn()

    def __getstate__(self):
        import cloudpickle

        return cloudpickle.dumps(self.fn)

    def __setstate__(self, payload):
        import pickle

        self.fn = pickle.loads(payload)


@contextlib.contextmanager
def clear_mpi_env_vars():
    """Temporarily strip MPI environment variables around process spawn.

    Forked children inheriting OMPI_/PMI_ vars confuse MPI setups that
    expect to manage process trees themselves (``MPI_Init`` mistakes the
    worker for an MPI rank and can hang it).
    """
    stashed = {
        key: os.environ.pop(key)
        for key in list(os.environ)
        if key.startswith(_MPI_PREFIXES)
    }
    try:
        yield
    finally:
        os.environ.update(stashed)
