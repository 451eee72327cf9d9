"""Compatibility alias for the functional env API
(reference gymnasium/experimental/functional.py:21-131).

The real implementation is ``gymnasium_tpu.functional`` — first-class here,
not experimental — this module mirrors the reference import path.
"""

from gymnasium_tpu.functional import *  # noqa: F401,F403
from gymnasium_tpu.functional import __all__  # noqa: F401
