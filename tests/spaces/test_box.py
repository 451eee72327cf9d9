"""Box space behavioral tests (coverage pattern: reference tests/spaces/test_box.py)."""

import pickle
import re
import warnings

import numpy as np
import pytest

from gymnasium_tpu.spaces import Box


# --- construction -----------------------------------------------------------


def test_shape_inference_from_low():
    space = Box(low=np.zeros((2, 3)), high=1.0)
    assert space.shape == (2, 3)
    assert space.low.shape == (2, 3) and space.high.shape == (2, 3)


def test_shape_inference_from_high():
    space = Box(low=0.0, high=np.ones(4))
    assert space.shape == (4,)


def test_scalar_bounds_default_shape():
    space = Box(low=-1.0, high=1.0)
    assert space.shape == (1,)


def test_explicit_shape_broadcasts_scalars():
    space = Box(low=0.0, high=1.0, shape=(3, 2))
    assert space.shape == (3, 2)
    assert np.all(space.low == 0.0) and np.all(space.high == 1.0)


def test_low_greater_than_high_raises():
    with pytest.raises(ValueError):
        Box(low=1.0, high=0.0, shape=(2,))
    with pytest.raises(ValueError):
        Box(low=np.array([0.0, 2.0]), high=np.array([1.0, 1.0]))


def test_shape_mismatch_raises():
    with pytest.raises((ValueError, AssertionError)):
        Box(low=np.zeros(3), high=np.ones(4))


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32, np.int64, np.uint8])
def test_dtypes(dtype):
    space = Box(low=0, high=2, shape=(2,), dtype=dtype)
    assert space.dtype == np.dtype(dtype)
    sample = space.sample()
    assert sample.dtype == np.dtype(dtype)
    assert space.contains(sample)


def test_none_dtype_rejected():
    with pytest.raises(ValueError, match="dtype must be explicitly provided"):
        Box(low=0, high=1, dtype=None)


def test_int_dtype_inf_bounds_map_to_dtype_limits():
    space = Box(low=-np.inf, high=np.inf, shape=(2,), dtype=np.int32)
    info = np.iinfo(np.int32)
    assert np.all(space.low == info.min)
    assert np.all(space.high == info.max)


# --- boundedness ------------------------------------------------------------


@pytest.mark.parametrize(
    "low,high,below,above",
    [
        (0.0, 1.0, True, True),
        (-np.inf, 1.0, False, True),
        (0.0, np.inf, True, False),
        (-np.inf, np.inf, False, False),
    ],
)
def test_is_bounded(low, high, below, above):
    space = Box(low=low, high=high, shape=(2,))
    assert space.is_bounded("below") is below
    assert space.is_bounded("above") is above
    assert space.is_bounded("both") is (below and above)


def test_is_bounded_bad_manner():
    with pytest.raises(ValueError):
        Box(0.0, 1.0).is_bounded("sideways")


# --- sampling ---------------------------------------------------------------


def test_sample_within_bounds():
    space = Box(low=-5.0, high=5.0, shape=(100,), seed=0)
    for _ in range(10):
        sample = space.sample()
        assert np.all(sample >= space.low) and np.all(sample <= space.high)


def test_sample_half_bounded_respects_bound():
    below = Box(low=2.0, high=np.inf, shape=(50,), seed=0)
    assert np.all(below.sample() >= 2.0)
    above = Box(low=-np.inf, high=-2.0, shape=(50,), seed=0)
    assert np.all(above.sample() <= -2.0)


def test_sample_unbounded_is_normal_ish():
    space = Box(low=-np.inf, high=np.inf, shape=(10_000,), seed=123)
    sample = space.sample()
    # standard normal: mean ~0, std ~1
    assert abs(float(np.mean(sample))) < 0.1
    assert abs(float(np.std(sample)) - 1.0) < 0.1


def test_sample_mask_rejected():
    space = Box(0.0, 1.0)
    with pytest.raises(Exception):
        space.sample(mask=np.array([1], dtype=np.int8))


def test_integer_box_sample_inclusive_of_high():
    space = Box(low=0, high=1, shape=(200,), dtype=np.int64, seed=7)
    samples = np.concatenate([space.sample() for _ in range(20)])
    assert set(np.unique(samples)) == {0, 1}


# --- contains ---------------------------------------------------------------


def test_contains_basics():
    space = Box(low=0.0, high=1.0, shape=(2,))
    assert space.contains(np.array([0.5, 0.5], dtype=np.float32))
    assert not space.contains(np.array([1.5, 0.5], dtype=np.float32))
    assert not space.contains(np.array([0.5], dtype=np.float32))  # wrong shape


def test_contains_list_cast():
    space = Box(low=0.0, high=1.0, shape=(2,))
    assert space.contains([0.5, 0.5])


def test_contains_non_array_garbage():
    space = Box(low=0.0, high=1.0, shape=(2,))
    assert not space.contains("hello")
    assert not space.contains(None)


# --- dunder / serialization --------------------------------------------------


def test_equality():
    assert Box(0.0, 1.0, (2,)) == Box(0.0, 1.0, (2,))
    assert Box(0.0, 1.0, (2,)) != Box(0.0, 2.0, (2,))
    assert Box(0.0, 1.0, (2,)) != Box(0.0, 1.0, (3,))
    assert Box(0.0, 1.0, (2,), dtype=np.float64) != Box(0.0, 1.0, (2,), dtype=np.float32)


def test_repr_contains_bounds():
    rep = repr(Box(-1.0, 1.0, (2,)))
    assert "Box" in rep and re.search(r"-1\.0", rep)


def test_pickle_preserves_rng_stream():
    space = Box(0.0, 1.0, (3,), seed=42)
    space.sample()
    clone = pickle.loads(pickle.dumps(space))
    assert np.allclose(space.sample(), clone.sample())


def test_seed_reproducibility():
    a, b = Box(0.0, 1.0, (5,)), Box(0.0, 1.0, (5,))
    a.seed(99)
    b.seed(99)
    assert np.allclose(a.sample(), b.sample())


def test_out_of_dtype_range_rejected():
    # reference contract: finite bounds beyond the dtype range raise
    with pytest.raises(ValueError, match="out of bounds of the dtype range"):
        Box(low=0.0, high=np.array([1e39]), shape=(1,), dtype=np.float32)


def test_precision_warning_on_lossy_cast():
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Box(low=np.zeros(1), high=np.ones(1), dtype=np.float32)  # f64 arrays -> f32
    assert any("precision lowered" in str(c.message) for c in caught)
