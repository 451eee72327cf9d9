"""Discrete space behavioral tests (coverage pattern: reference tests/spaces/test_discrete.py)."""

import pickle

import numpy as np
import pytest

from gymnasium_tpu.spaces import Discrete


def test_basic_construction():
    space = Discrete(5)
    assert space.n == 5 and space.start == 0
    assert space.shape == ()
    assert np.issubdtype(space.dtype, np.integer)


def test_start_offset():
    space = Discrete(4, start=-2, seed=0)
    samples = [int(space.sample()) for _ in range(100)]
    assert min(samples) >= -2 and max(samples) <= 1
    assert space.contains(-2) and space.contains(1)
    assert not space.contains(2) and not space.contains(-3)


def test_invalid_n():
    with pytest.raises((AssertionError, ValueError)):
        Discrete(0)
    with pytest.raises((AssertionError, ValueError)):
        Discrete(-3)


def test_contains_accepts_numpy_ints():
    space = Discrete(3)
    assert space.contains(np.int64(2))
    assert space.contains(np.int32(0))
    assert not space.contains(3)
    assert not space.contains(0.5)
    assert not space.contains("0")


def test_sample_mask_restricts_support():
    space = Discrete(4, seed=0)
    mask = np.array([0, 1, 0, 1], dtype=np.int8)
    for _ in range(50):
        assert int(space.sample(mask=mask)) in (1, 3)


def test_sample_all_zero_mask_returns_start():
    space = Discrete(4, start=7, seed=0)
    mask = np.zeros(4, dtype=np.int8)
    assert int(space.sample(mask=mask)) == 7


def test_sample_probability_mask():
    space = Discrete(3, seed=5)
    probability = np.array([0.0, 1.0, 0.0])
    for _ in range(20):
        assert int(space.sample(probability=probability)) == 1


def test_sample_probability_distribution():
    space = Discrete(2, seed=11)
    probability = np.array([0.8, 0.2])
    counts = np.bincount(
        [int(space.sample(probability=probability)) for _ in range(2000)], minlength=2
    )
    assert counts[0] > counts[1]
    assert abs(counts[0] / 2000 - 0.8) < 0.05


def test_mask_and_probability_mutually_exclusive():
    space = Discrete(3)
    with pytest.raises(Exception):
        space.sample(mask=np.array([1, 1, 1], dtype=np.int8), probability=np.array([1 / 3] * 3))


def test_bad_mask_rejected():
    space = Discrete(3)
    with pytest.raises(Exception):
        space.sample(mask=np.array([1, 1], dtype=np.int8))  # wrong length


def test_equality_and_repr():
    assert Discrete(3) == Discrete(3)
    assert Discrete(3) != Discrete(4)
    assert Discrete(3, start=1) != Discrete(3)
    assert "Discrete(3)" in repr(Discrete(3))
    assert "start" in repr(Discrete(3, start=2))


def test_pickle_roundtrip_preserves_start():
    space = Discrete(6, start=-3, seed=0)
    clone = pickle.loads(pickle.dumps(space))
    assert clone == space
    assert int(space.sample()) == int(clone.sample())


def test_seed_determinism():
    a, b = Discrete(10), Discrete(10)
    a.seed(3)
    b.seed(3)
    assert [int(a.sample()) for _ in range(10)] == [int(b.sample()) for _ in range(10)]


def test_jsonable_roundtrip():
    space = Discrete(5, start=2)
    samples = [space.sample() for _ in range(5)]
    recovered = space.from_jsonable(space.to_jsonable(samples))
    assert all(int(x) == int(y) for x, y in zip(samples, recovered))
