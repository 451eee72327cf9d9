"""Seeding utilities: host-side PCG64 generators and device-side JAX keys.

The host path matches reference gymnasium/utils/seeding.py:10-42 exactly in
behavior (``np.random.Generator(PCG64(SeedSequence(seed)))`` and returning the
generated entropy), because bit-exact parity of environment trajectories
depends on identical PCG64 streams. The device path issues JAX threefry keys
for jitted sampling.
"""

from __future__ import annotations

import numpy as np

from gymnasium_tpu import error

__all__ = ["np_random", "jax_key", "RandomNumberGenerator"]

RandomNumberGenerator = np.random.Generator


def np_random(seed: int | None = None) -> tuple[np.random.Generator, int]:
    """Return a PCG64 generator and the entropy used to seed it.

    Args:
        seed: non-negative int, or ``None`` for OS entropy.

    Returns:
        ``(generator, seed)`` where ``seed`` is the entropy actually used.

    Raises:
        gymnasium_tpu.error.Error: if ``seed`` is negative or not an int.
    """
    if seed is not None and not (isinstance(seed, int) and 0 <= seed):
        if isinstance(seed, int):
            raise error.Error(f"Seed must be a non-negative integer, actual value: {seed}")
        raise error.Error(f"Seed must be a python integer, actual type: {type(seed)}")

    seed_seq = np.random.SeedSequence(seed)
    entropy = seed_seq.entropy
    assert isinstance(entropy, int)
    rng = np.random.Generator(np.random.PCG64(seed_seq))
    return rng, entropy


def jax_key(seed: int | None = None):
    """Return a JAX PRNG key from ``seed`` (OS entropy when ``None``).

    Imported lazily so that pure host-side users never pay for a JAX import.
    """
    import jax

    if seed is None:
        seed = int(np.random.SeedSequence().entropy) % (2**63)
    if not (isinstance(seed, int) and seed >= 0):
        raise error.Error(f"Seed must be a non-negative integer, actual value: {seed}")
    return jax.random.PRNGKey(seed)
