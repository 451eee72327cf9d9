"""Experimental module (reference gymnasium/experimental/__init__.py).

In this framework the functional API is first-class and lives at
``gymnasium_tpu.functional``; this package re-exports it under the
reference's ``experimental`` path for drop-in compatibility.
"""

from gymnasium_tpu.experimental import functional

__all__ = ["functional"]
