"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding paths are
validated on virtual CPU devices (see SURVEY.md §7 stage 7).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
