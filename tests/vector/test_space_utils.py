"""batch_space / iterate / concatenate / create_empty_array / shared-memory tests
(coverage pattern: reference tests/vector/utils/)."""

import multiprocessing as mp

import numpy as np
import pytest

from gymnasium_tpu import spaces
from gymnasium_tpu.vector.utils import (
    batch_differing_spaces,
    batch_space,
    concatenate,
    create_empty_array,
    create_shared_memory,
    iterate,
    read_from_shared_memory,
    write_to_shared_memory,
)
from tests.spaces.utils import TESTING_SPACES, TESTING_SPACES_IDS

# --- batch_space expected structures -----------------------------------------


def test_batch_box():
    batched = batch_space(spaces.Box(0.0, 1.0, (3,)), n=4)
    assert batched == spaces.Box(0.0, 1.0, (4, 3))


def test_batch_discrete_to_multidiscrete():
    batched = batch_space(spaces.Discrete(5), n=3)
    assert isinstance(batched, spaces.MultiDiscrete)
    assert np.array_equal(batched.nvec, [5, 5, 5])


def test_batch_discrete_with_start():
    batched = batch_space(spaces.Discrete(4, start=-1), n=2)
    assert isinstance(batched, spaces.MultiDiscrete)
    assert np.all(batched.start == -1)


def test_batch_multidiscrete_stacks():
    # reference space_utils.py:92-103 batches MultiDiscrete to an integer Box
    # of per-element [start, start+nvec-1] ranges
    batched = batch_space(spaces.MultiDiscrete([2, 3]), n=4)
    assert isinstance(batched, spaces.Box)
    assert batched.shape == (4, 2)
    assert np.all(batched.low == 0) and np.all(batched.high == [[1, 2]] * 4)


def test_batch_multibinary():
    # reference space_utils.py:105 batches MultiBinary to a 0/1 Box
    batched = batch_space(spaces.MultiBinary(5), n=3)
    assert isinstance(batched, spaces.Box)
    assert batched.shape == (3, 5)
    assert np.all(batched.low == 0) and np.all(batched.high == 1)


def test_batch_dict_recursive():
    space = spaces.Dict({"a": spaces.Discrete(3), "b": spaces.Box(0.0, 1.0, (2,))})
    batched = batch_space(space, n=2)
    assert isinstance(batched, spaces.Dict)
    assert isinstance(batched["a"], spaces.MultiDiscrete)
    assert batched["b"] == spaces.Box(0.0, 1.0, (2, 2))


def test_batch_custom_space_tuple_of_copies():
    space = spaces.Text(5)
    batched = batch_space(space, n=3)
    assert isinstance(batched, spaces.Tuple)
    assert len(batched.spaces) == 3
    assert all(sub == space for sub in batched.spaces)
    # distinct RNG streams per copy
    samples = [sub.sample() for sub in batched.spaces]
    assert len(set(samples)) > 1 or len(samples[0]) == 0


def test_batch_differing_spaces_heterogeneous_boxes():
    batched = batch_differing_spaces(
        [spaces.Box(0.0, 1.0, (2,)), spaces.Box(-1.0, 2.0, (2,))]
    )
    assert isinstance(batched, spaces.Box)
    assert batched.shape == (2, 2)
    assert np.allclose(batched.low, [[0.0, 0.0], [-1.0, -1.0]])
    assert np.allclose(batched.high, [[1.0, 1.0], [2.0, 2.0]])


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_batched_samples_contained(space):
    space.seed(0)
    batched = batch_space(space, n=4)
    batched.seed(0)
    sample = batched.sample()
    assert batched.contains(sample)


# --- iterate / concatenate / create_empty_array ------------------------------


def test_iterate_box_rows():
    space = spaces.Box(0.0, 1.0, (3,))
    batched = batch_space(space, n=4)
    batch = batched.sample()
    rows = list(iterate(batched, batch))
    assert len(rows) == 4
    assert all(row.shape == (3,) for row in rows)
    assert np.array_equal(rows[0], batch[0])


def test_iterate_dict_yields_dicts():
    space = spaces.Dict({"a": spaces.Discrete(3), "b": spaces.Box(0.0, 1.0, (2,))})
    batched = batch_space(space, n=3)
    items = list(iterate(batched, batched.sample()))
    assert len(items) == 3
    assert all(isinstance(item, dict) and set(item) == {"a", "b"} for item in items)


def test_concatenate_roundtrip_box():
    space = spaces.Box(0.0, 1.0, (2,))
    samples = [space.sample() for _ in range(5)]
    out = create_empty_array(space, n=5)
    result = concatenate(space, samples, out)
    assert result.shape == (5, 2)
    for i in range(5):
        assert np.array_equal(result[i], samples[i])


def test_concatenate_roundtrip_dict():
    space = spaces.Dict({"a": spaces.Discrete(4), "b": spaces.Box(0.0, 1.0, (2,))})
    samples = [space.sample() for _ in range(3)]
    out = create_empty_array(space, n=3)
    result = concatenate(space, samples, out)
    assert set(result) == {"a", "b"}
    assert result["b"].shape == (3, 2)
    assert np.array_equal(result["a"], [s["a"] for s in samples])


def test_create_empty_array_zero_initialized_shapes():
    space = spaces.Tuple([spaces.Box(0.0, 1.0, (2,)), spaces.MultiBinary(3)])
    out = create_empty_array(space, n=4, fn=np.zeros)
    assert out[0].shape == (4, 2) and np.all(out[0] == 0)
    assert out[1].shape == (4, 3)


# --- shared memory -----------------------------------------------------------


@pytest.mark.parametrize(
    "space",
    [
        spaces.Box(0.0, 1.0, (3,)),
        spaces.Discrete(5),
        spaces.MultiBinary(4),
        spaces.Dict({"a": spaces.Discrete(3), "b": spaces.Box(0.0, 1.0, (2,))}),
        spaces.Tuple([spaces.Discrete(2), spaces.Box(0.0, 1.0, (2,))]),
    ],
    ids=["box", "discrete", "multibinary", "dict", "tuple"],
)
def test_shared_memory_write_read_roundtrip(space):
    n = 4
    shm = create_shared_memory(space, n=n, ctx=mp)
    view = read_from_shared_memory(space, shm, n=n)
    samples = [space.sample() for _ in range(n)]
    for i, sample in enumerate(samples):
        write_to_shared_memory(space, i, sample, shm)

    def check(space, view, samples):
        if isinstance(space, spaces.Dict):
            for key, sub in space.spaces.items():
                check(sub, view[key], [s[key] for s in samples])
        elif isinstance(space, spaces.Tuple):
            for j, sub in enumerate(space.spaces):
                check(sub, view[j], [s[j] for s in samples])
        else:
            for i, sample in enumerate(samples):
                assert np.allclose(np.asarray(view[i]), np.asarray(sample))

    check(space, view, samples)


def test_shared_memory_unsupported_space_raises():
    with pytest.raises(Exception):
        create_shared_memory(spaces.Sequence(spaces.Discrete(2)), n=2)
