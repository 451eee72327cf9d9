"""EzPickle: pickle objects by their constructor arguments.

Parity with reference gymnasium/utils/ezpickle.py:6-37. Needed for envs whose
state holds unpicklable native handles (renderers, device buffers).
"""

from __future__ import annotations

from typing import Any


class EzPickle:
    """Objects that pickle/unpickle via constructor arguments.

    Subclasses should call ``EzPickle.__init__(self, *args, **kwargs)`` with
    the exact constructor arguments in their own ``__init__``.
    """

    def __init__(self, *args: Any, **kwargs: Any):
        self._ezpickle_args = args
        self._ezpickle_kwargs = kwargs

    def __getstate__(self):
        return {
            "_ezpickle_args": self._ezpickle_args,
            "_ezpickle_kwargs": self._ezpickle_kwargs,
        }

    def __setstate__(self, d):
        out = type(self)(*d["_ezpickle_args"], **d["_ezpickle_kwargs"])
        self.__dict__.update(out.__dict__)
