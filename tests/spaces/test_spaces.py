"""Space zoo behavioral tests (pattern: reference tests/spaces/)."""

import copy
import pickle

import numpy as np
import pytest

from gymnasium_tpu import spaces
from tests.spaces.utils import TESTING_SPACES, TESTING_SPACES_IDS


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_sample_contains(space):
    space.seed(0)
    for _ in range(8):
        sample = space.sample()
        assert space.contains(sample), f"{space} does not contain its own sample {sample}"


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_seed_determinism(space):
    space.seed(123)
    samples_a = [space.sample() for _ in range(5)]
    space.seed(123)
    samples_b = [space.sample() for _ in range(5)]
    for a, b in zip(samples_a, samples_b):
        assert_samples_equal(a, b)


def assert_samples_equal(a, b):
    if isinstance(a, dict):
        assert a.keys() == b.keys()
        for key in a:
            assert_samples_equal(a[key], b[key])
    elif isinstance(a, tuple):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert_samples_equal(x, y)
    elif isinstance(a, spaces.GraphInstance):
        assert np.array_equal(a.nodes, b.nodes)
        assert (a.edges is None) == (b.edges is None)
        if a.edges is not None:
            assert np.array_equal(a.edges, b.edges)
            assert np.array_equal(a.edge_links, b.edge_links)
    elif isinstance(a, str):
        assert a == b
    else:
        assert np.array_equal(a, b), f"{a} != {b}"


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_pickle_roundtrip(space):
    space.seed(7)
    restored = pickle.loads(pickle.dumps(space))
    assert space == restored
    # Sampling stays in lockstep after the roundtrip.
    assert_samples_equal(space.sample(), restored.sample())


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_deepcopy_equality(space):
    assert space == copy.deepcopy(space)


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_jsonable_roundtrip(space):
    space.seed(11)
    samples = [space.sample() for _ in range(3)]
    restored = space.from_jsonable(space.to_jsonable(samples))
    assert len(restored) == len(samples)
    for a, b in zip(samples, restored):
        assert_samples_equal(np.asarray(a) if isinstance(a, np.ndarray) else a, b)


@pytest.mark.parametrize("space", TESTING_SPACES, ids=TESTING_SPACES_IDS)
def test_flatten_roundtrip(space):
    if not space.is_np_flattenable:
        pytest.skip("not np-flattenable")
    space.seed(3)
    sample = space.sample()
    flat = spaces.flatten(space, sample)
    assert np.asarray(flat).shape == (spaces.flatdim(space),)
    unflat = spaces.unflatten(space, flat)
    assert_samples_equal(sample, unflat)
    flat_space = spaces.flatten_space(space)
    assert flat_space.contains(np.asarray(flat, dtype=flat_space.dtype))


def test_box_bounds():
    with pytest.raises(ValueError):
        spaces.Box(low=1.0, high=0.0)
    space = spaces.Box(low=np.array([0.0, -np.inf]), high=np.array([1.0, np.inf]))
    assert space.is_bounded("below") is False
    assert space.is_bounded("above") is False
    assert space.is_bounded("both") is False
    assert spaces.Box(-1.0, 1.0, (3,)).is_bounded("both") is True


def test_discrete_mask():
    space = spaces.Discrete(4)
    space.seed(0)
    mask = np.array([0, 1, 0, 1], dtype=np.int8)
    for _ in range(10):
        assert space.sample(mask=mask) in (1, 3)
    # All-zero mask falls back to start.
    assert space.sample(mask=np.zeros(4, dtype=np.int8)) == 0
    prob = np.array([0.0, 1.0, 0.0, 0.0])
    assert space.sample(probability=prob) == 1


def test_multibinary_mask():
    space = spaces.MultiBinary(4)
    space.seed(0)
    mask = np.array([0, 1, 2, 2], dtype=np.int8)
    sample = space.sample(mask=mask)
    assert sample[0] == 0 and sample[1] == 1


def test_jax_sampling():
    import jax

    key = jax.random.PRNGKey(0)
    fixed = [
        spaces.Box(-1.0, 1.0, (4,)),
        spaces.Discrete(5),
        spaces.MultiDiscrete([3, 4]),
        spaces.MultiBinary(6),
        spaces.Dict(a=spaces.Discrete(2), b=spaces.Box(0, 1, (2,))),
        spaces.Tuple([spaces.Discrete(2), spaces.Box(0, 1, (2,))]),
    ]
    for space in fixed:
        sample = jax.jit(space.sample_jax)(key)
        host = jax.tree_util.tree_map(np.asarray, sample)
        contains = jax.jit(space.contains_jax)(sample)
        assert bool(contains), f"{space} contains_jax rejected its own sample {host}"


def test_batch_space():
    from gymnasium_tpu.vector.utils import batch_space

    assert batch_space(spaces.Box(-1.0, 1.0, (3,)), 4).shape == (4, 3)
    md = batch_space(spaces.Discrete(5, start=2), 3)
    assert isinstance(md, spaces.MultiDiscrete)
    assert np.all(md.nvec == 5) and np.all(md.start == 2)
    t = batch_space(spaces.Text(5), 3)
    assert isinstance(t, spaces.Tuple) and len(t.spaces) == 3
