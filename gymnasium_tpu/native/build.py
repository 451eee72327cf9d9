"""Build-on-first-import for the native components.

Compiles the C++ sources with the system toolchain into a cached shared
library next to this package; everything degrades gracefully to the Python
implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import gymnasium_tpu.logger as logger

_DIR = os.path.dirname(__file__)


def _source_digest(sources: list[str]) -> str:
    h = hashlib.sha256()
    for src in sources:
        with open(src, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def build_library(name: str, sources: list[str]) -> ctypes.CDLL | None:
    """Compile ``sources`` into ``lib<name>-<digest>.so`` and dlopen it."""
    srcs = [os.path.join(_DIR, s) for s in sources]
    digest = _source_digest(srcs)
    out = os.path.join(_DIR, f"lib{name}-{digest}.so")
    if not os.path.exists(out):
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            *srcs,
            "-o",
            out,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
            logger.warn(f"native build of {name} failed ({e}); using Python fallback")
            return None
    try:
        return ctypes.CDLL(out)
    except OSError as e:
        logger.warn(f"failed to load native {name} ({e}); using Python fallback")
        return None
