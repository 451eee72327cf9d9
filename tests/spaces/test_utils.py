"""flatten / unflatten / flatdim / flatten_space tests over the space zoo
(coverage pattern: reference tests/spaces/test_utils.py)."""

import numpy as np
import pytest

from gymnasium_tpu import spaces
from gymnasium_tpu.spaces.utils import (
    flatdim,
    flatten,
    flatten_space,
    is_space_dtype_shape_equiv,
    unflatten,
)
from tests.spaces.utils import TESTING_SPACES, TESTING_SPACES_IDS

EXPECTED_FLATDIMS = {
    "Discrete(5)": 5,
    "Discrete(5, start=-2)": 5,
    "MultiDiscrete([2 2])": 4,
    "MultiBinary(8)": 8,
}


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_flatten_space_flatdim_consistent(space):
    if not space.is_np_flattenable:
        with pytest.raises(Exception):
            flatdim(space)
        return
    flat_space = flatten_space(space)
    assert isinstance(flat_space, spaces.Box)
    assert flat_space.shape == (flatdim(space),)


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_flatten_sample_in_flat_space(space):
    space.seed(42)
    sample = space.sample()
    flat = flatten(space, sample)
    if space.is_np_flattenable:
        flat_space = flatten_space(space)
        assert flat_space.contains(flat), f"flattened {sample} -> {flat} not in {flat_space}"


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_flatten_unflatten_roundtrip(space):
    space.seed(7)
    sample = space.sample()
    recovered = unflatten(space, flatten(space, sample))

    def eq(a, b):
        if isinstance(a, dict):
            return set(a) == set(b) and all(eq(a[k], b[k]) for k in a)
        if isinstance(a, tuple):
            return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
        if isinstance(a, spaces.GraphInstance):
            return (
                np.array_equal(a.nodes, b.nodes)
                and (a.edges is None) == (b.edges is None)
                and (a.edges is None or np.array_equal(a.edges, b.edges))
            )
        if isinstance(a, str):
            return a == b
        return np.array_equal(np.asarray(a), np.asarray(b))

    assert eq(sample, recovered), f"{sample} != {recovered}"


def test_discrete_flatten_is_onehot():
    space = spaces.Discrete(4, start=1)
    flat = flatten(space, np.int64(3))
    assert np.array_equal(flat, [0, 0, 1, 0])
    assert int(unflatten(space, flat)) == 3


def test_multidiscrete_flatten_is_concat_onehot():
    space = spaces.MultiDiscrete([2, 3])
    flat = flatten(space, np.array([1, 2]))
    assert np.array_equal(flat, [0, 1, 0, 0, 1])
    assert flatdim(space) == 5


def test_box_flatten_is_ravel():
    space = spaces.Box(0.0, 1.0, (2, 3))
    sample = space.sample()
    assert np.array_equal(flatten(space, sample), sample.ravel())


def test_dict_flatten_is_ordered_concat():
    space = spaces.Dict({"a": spaces.Box(0.0, 1.0, (2,)), "b": spaces.Discrete(3)})
    sample = {"a": np.array([0.25, 0.5], dtype=np.float32), "b": np.int64(1)}
    flat = flatten(space, sample)
    assert flat.shape == (5,)
    assert np.allclose(flat[:2], [0.25, 0.5])
    assert np.array_equal(flat[2:], [0, 1, 0])


@pytest.mark.parametrize(
    "space,expected",
    [
        (spaces.Discrete(5), 5),
        (spaces.Discrete(5, start=3), 5),
        (spaces.Box(0.0, 1.0, (3, 4)), 12),
        (spaces.MultiBinary([2, 3]), 6),
        (spaces.MultiDiscrete([3, 4]), 7),
        (spaces.Tuple([spaces.Discrete(2), spaces.Box(0.0, 1.0, (3,))]), 5),
        (spaces.Dict({"a": spaces.Discrete(2), "b": spaces.MultiBinary(4)}), 6),
    ],
)
def test_expected_flatdims(space, expected):
    assert flatdim(space) == expected


def test_is_space_dtype_shape_equiv():
    assert is_space_dtype_shape_equiv(spaces.Box(0.0, 1.0, (2,)), spaces.Box(-5.0, 5.0, (2,)))
    assert not is_space_dtype_shape_equiv(
        spaces.Box(0.0, 1.0, (2,)), spaces.Box(0.0, 1.0, (3,))
    )
    assert not is_space_dtype_shape_equiv(
        spaces.Box(0.0, 1.0, (2,), dtype=np.float32),
        spaces.Box(0.0, 1.0, (2,), dtype=np.float64),
    )
    assert is_space_dtype_shape_equiv(spaces.Discrete(3), spaces.Discrete(7))


def test_flatten_space_composite_bounds():
    space = spaces.Dict({"a": spaces.Box(-2.0, 2.0, (2,)), "b": spaces.Discrete(2)})
    flat_space = flatten_space(space)
    assert np.all(flat_space.low[:2] == -2.0)
    assert np.all(flat_space.high[:2] == 2.0)
    # one-hot dims are [0, 1]
    assert np.all(flat_space.low[2:] == 0.0) and np.all(flat_space.high[2:] == 1.0)
