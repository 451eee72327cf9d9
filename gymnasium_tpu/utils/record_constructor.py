"""RecordConstructorArgs: remember wrapper constructor args for spec rebuild.

Parity with reference gymnasium/utils/record_constructor.py:10 — wrappers
inheriting this mixin can be reconstructed from an ``EnvSpec``'s
``additional_wrappers`` stack.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any


class RecordConstructorArgs:
    """Records the arguments passed to the constructor for later spec export."""

    def __init__(self, *, _disable_deepcopy: bool = False, **kwargs: Any):
        if _disable_deepcopy is False:
            kwargs = deepcopy(kwargs)
        self._saved_kwargs = kwargs
