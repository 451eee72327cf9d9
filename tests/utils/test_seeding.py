"""Seeding tests (coverage pattern: reference tests/utils/test_seeding.py)."""

import numpy as np
import pytest

from gymnasium_tpu import error
from gymnasium_tpu.utils import seeding


def test_np_random_returns_generator_and_entropy():
    rng, entropy = seeding.np_random(42)
    assert isinstance(rng, np.random.Generator)
    assert entropy == 42


def test_np_random_deterministic():
    a, _ = seeding.np_random(7)
    b, _ = seeding.np_random(7)
    assert a.random() == b.random()
    assert np.array_equal(a.integers(0, 100, 10), b.integers(0, 100, 10))


def test_np_random_none_seed_gives_fresh_entropy():
    rng1, seed1 = seeding.np_random(None)
    rng2, seed2 = seeding.np_random(None)
    assert isinstance(seed1, int)
    # overwhelmingly likely distinct
    assert seed1 != seed2 or rng1.random() != rng2.random()


@pytest.mark.parametrize("bad_seed", [0.5, "7", [1]])
def test_np_random_rejects_non_int(bad_seed):
    with pytest.raises((error.Error, AssertionError, TypeError)):
        seeding.np_random(bad_seed)


def test_np_random_rejects_negative():
    with pytest.raises((error.Error, AssertionError, ValueError)):
        seeding.np_random(-1)


def test_np_random_matches_reference_construction():
    """rng must be PCG64 over SeedSequence(seed) (reference seeding.py:10-42)."""
    ours, _ = seeding.np_random(314)
    theirs = np.random.Generator(np.random.PCG64(np.random.SeedSequence(314)))
    assert np.array_equal(ours.integers(0, 1_000_000, 20), theirs.integers(0, 1_000_000, 20))


def test_jax_key_deterministic():
    import jax

    k1 = seeding.jax_key(5)
    k2 = seeding.jax_key(5)
    assert jax.numpy.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
