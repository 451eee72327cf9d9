"""MultiDiscrete + MultiBinary behavioral tests
(coverage pattern: reference tests/spaces/test_multidiscrete.py / test_multibinary.py)."""

import pickle

import numpy as np
import pytest

from gymnasium_tpu.spaces import Discrete, MultiBinary, MultiDiscrete

# --- MultiDiscrete ----------------------------------------------------------


def test_md_construction_1d():
    space = MultiDiscrete([3, 4, 5])
    assert space.shape == (3,)
    assert np.array_equal(space.nvec, [3, 4, 5])
    sample = space.sample()
    assert sample.shape == (3,)
    assert space.contains(sample)


def test_md_construction_2d():
    space = MultiDiscrete([[2, 3], [4, 5]])
    assert space.shape == (2, 2)
    sample = space.sample()
    assert sample.shape == (2, 2)
    assert np.all(sample < space.nvec)
    assert space.contains(sample)


def test_md_start():
    space = MultiDiscrete([3, 4], start=[10, -5], seed=0)
    for _ in range(20):
        sample = space.sample()
        assert 10 <= sample[0] <= 12
        assert -5 <= sample[1] <= -2
    assert space.contains(np.array([10, -5]))
    assert not space.contains(np.array([9, -5]))
    assert not space.contains(np.array([13, -5]))


def test_md_contains_shape_and_range():
    space = MultiDiscrete([3, 3])
    assert space.contains(np.array([0, 2]))
    assert not space.contains(np.array([0, 3]))
    assert not space.contains(np.array([0, 2, 1]))
    assert not space.contains(np.array([-1, 0]))


def test_md_mask_sampling():
    space = MultiDiscrete([3, 3], seed=0)
    mask = (np.array([0, 1, 0], dtype=np.int8), np.array([0, 0, 1], dtype=np.int8))
    for _ in range(20):
        sample = space.sample(mask=mask)
        assert sample[0] == 1 and sample[1] == 2


def test_md_seed_determinism():
    a, b = MultiDiscrete([5, 5, 5]), MultiDiscrete([5, 5, 5])
    a.seed(17)
    b.seed(17)
    for _ in range(5):
        assert np.array_equal(a.sample(), b.sample())


def test_md_equality():
    assert MultiDiscrete([2, 3]) == MultiDiscrete([2, 3])
    assert MultiDiscrete([2, 3]) != MultiDiscrete([3, 2])
    assert MultiDiscrete([2, 3], start=[1, 1]) != MultiDiscrete([2, 3])


def test_md_pickle():
    space = MultiDiscrete([4, 4], seed=3)
    clone = pickle.loads(pickle.dumps(space))
    assert clone == space
    assert np.array_equal(space.sample(), clone.sample())


def test_md_jsonable_roundtrip():
    space = MultiDiscrete([3, 4])
    samples = [space.sample() for _ in range(4)]
    recovered = space.from_jsonable(space.to_jsonable(samples))
    for x, y in zip(samples, recovered):
        assert np.array_equal(x, y)


# --- MultiBinary ------------------------------------------------------------


def test_mb_construction_int():
    space = MultiBinary(8)
    assert space.shape == (8,)
    sample = space.sample()
    assert sample.shape == (8,)
    assert set(np.unique(sample)) <= {0, 1}
    assert space.contains(sample)


def test_mb_construction_ndshape():
    space = MultiBinary([2, 3])
    assert space.shape == (2, 3)
    assert space.contains(space.sample())


def test_mb_contains_rejects_nonbinary():
    space = MultiBinary(3)
    assert space.contains(np.array([0, 1, 1]))
    assert not space.contains(np.array([0, 1, 2]))
    assert not space.contains(np.array([0, 1]))


def test_mb_mask_sampling():
    space = MultiBinary(4, seed=0)
    # convention (reference multi_binary.py): mask 0 -> free sample, 1 -> forced
    mask = np.array([0, 1, 0, 1], dtype=np.int8)
    samples = np.stack([space.sample(mask=mask) for _ in range(50)])
    assert set(np.unique(samples[:, 0])) <= {0, 1}
    assert np.all(samples[:, 1] == 1)
    assert np.all(samples[:, 3] == 1)


def test_mb_probability_sampling():
    space = MultiBinary(2, seed=0)
    probability = np.array([0.0, 1.0])
    samples = np.stack([space.sample(probability=probability) for _ in range(30)])
    assert np.all(samples[:, 0] == 0) and np.all(samples[:, 1] == 1)


def test_mb_seed_determinism():
    a, b = MultiBinary(16), MultiBinary(16)
    a.seed(5)
    b.seed(5)
    assert np.array_equal(a.sample(), b.sample())


def test_mb_equality_and_pickle():
    assert MultiBinary(4) == MultiBinary(4)
    assert MultiBinary(4) != MultiBinary(5)
    space = MultiBinary(4, seed=1)
    clone = pickle.loads(pickle.dumps(space))
    assert np.array_equal(space.sample(), clone.sample())
