"""Multiprocessing helpers (reference gymnasium/vector/utils/misc.py:14-61)."""

from __future__ import annotations

import contextlib
import os

__all__ = ["CloudpickleWrapper", "clear_mpi_env_vars"]


class CloudpickleWrapper:
    """Wrap a callable so it crosses process boundaries via cloudpickle."""

    def __init__(self, fn):
        self.fn = fn

    def __getstate__(self):
        import cloudpickle

        return cloudpickle.dumps(self.fn)

    def __setstate__(self, ob):
        import pickle

        self.fn = pickle.loads(ob)

    def __call__(self):
        return self.fn()


@contextlib.contextmanager
def clear_mpi_env_vars():
    """Temporarily strip MPI environment variables around process spawn.

    Forked children inheriting OMPI_/PMI_ vars confuse MPI setups that
    expect to manage process trees themselves.
    """
    removed_environment = {}
    for k, v in list(os.environ.items()):
        for prefix in ("OMPI_", "PMI_"):
            if k.startswith(prefix):
                removed_environment[k] = v
                del os.environ[k]
    try:
        yield
    finally:
        os.environ.update(removed_environment)
