"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding paths are
validated on virtual CPU devices (see SURVEY.md §7 stage 7). The axon
sitecustomize overrides JAX_PLATFORMS at interpreter start, so the config
must be re-pinned here before any backend initialisation.
"""

import os

if os.environ.get("GYMTPU_TPU_TESTS") != "1":
    # Default: CPU mesh. Set GYMTPU_TPU_TESTS=1 to run the TPU-only suites
    # (tests/ops/) against real hardware.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
