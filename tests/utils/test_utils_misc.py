"""EzPickle / RecordConstructorArgs / step-API compatibility / data_equivalence
(coverage pattern: reference tests/utils/)."""

import pickle

import numpy as np
import pytest

from gymnasium_tpu.utils.data_equivalence import data_equivalence
from gymnasium_tpu.utils.ezpickle import EzPickle
from gymnasium_tpu.utils.record_constructor import RecordConstructorArgs
from gymnasium_tpu.utils.step_api_compatibility import (
    convert_to_done_step_api,
    convert_to_terminated_truncated_step_api,
    step_api_compatibility,
)

# --- EzPickle -----------------------------------------------------------------


class _Pickleable(EzPickle):
    def __init__(self, a, b=2, *, c=3):
        EzPickle.__init__(self, a, b=b, c=c)
        self.a, self.b, self.c = a, b, c
        self.derived = a * 100  # NOT pickled state; reconstructed via __init__


def test_ezpickle_reconstructs_via_constructor_args():
    obj = _Pickleable(5, b=7, c=9)
    obj.derived = -1  # mutated runtime state must NOT survive
    clone = pickle.loads(pickle.dumps(obj))
    assert (clone.a, clone.b, clone.c) == (5, 7, 9)
    assert clone.derived == 500  # rebuilt by __init__, mutation dropped


# --- RecordConstructorArgs -----------------------------------------------------


class _Recorded(RecordConstructorArgs):
    def __init__(self, x, flag=True):
        RecordConstructorArgs.__init__(self, x=x, flag=flag)


def test_record_constructor_saves_kwargs():
    obj = _Recorded(4, flag=False)
    assert obj._saved_kwargs == {"x": 4, "flag": False}


# --- step API compatibility ----------------------------------------------------


def test_old_to_new_done_false():
    obs, reward, term, trunc, info = convert_to_terminated_truncated_step_api(
        ("obs", 1.0, False, {})
    )
    assert (term, trunc) == (False, False)


def test_old_to_new_done_true_defaults_to_terminated():
    _, _, term, trunc, _ = convert_to_terminated_truncated_step_api(("obs", 1.0, True, {}))
    assert term is True and trunc is False


def test_old_to_new_truncation_from_info():
    _, _, term, trunc, info = convert_to_terminated_truncated_step_api(
        ("obs", 1.0, True, {"TimeLimit.truncated": True})
    )
    assert term is False and trunc is True
    assert "TimeLimit.truncated" not in info


def test_new_to_old_sets_done_and_info():
    obs, reward, done, info = convert_to_done_step_api(("obs", 1.0, False, True, {}))
    assert done is True
    assert info.get("TimeLimit.truncated") is True


def test_new_to_old_terminated_has_no_truncated_flag():
    _, _, done, info = convert_to_done_step_api(("obs", 1.0, True, False, {}))
    assert done is True
    assert info.get("TimeLimit.truncated", False) is False


def test_step_api_compatibility_dispatch():
    new_style = ("obs", 1.0, True, False, {})
    assert len(step_api_compatibility(new_style, output_truncation_bool=True)) == 5
    assert len(step_api_compatibility(new_style, output_truncation_bool=False)) == 4
    old_style = ("obs", 1.0, True, {})
    assert len(step_api_compatibility(old_style, output_truncation_bool=True)) == 5


def test_vector_old_to_new():
    dones = np.array([True, False, True])
    infos = {"TimeLimit.truncated": np.array([True, False, False]), "_TimeLimit.truncated": np.array([True, False, True])}
    _, _, term, trunc, _ = convert_to_terminated_truncated_step_api(
        ("obs", np.ones(3), dones, infos), is_vector_env=True
    )
    assert np.array_equal(term, [False, False, True])
    assert np.array_equal(trunc, [True, False, False])


# --- data_equivalence ----------------------------------------------------------


def test_data_equivalence_nested():
    a = {"x": np.arange(3), "y": ("s", 1.0, {"z": np.float32(2.0)})}
    b = {"x": np.arange(3), "y": ("s", 1.0, {"z": np.float32(2.0)})}
    assert data_equivalence(a, b)


def test_data_equivalence_detects_differences():
    assert not data_equivalence({"x": 1}, {"x": 2})
    assert not data_equivalence({"x": 1}, {"y": 1})
    assert not data_equivalence((1, 2), (1, 2, 3))
    assert not data_equivalence(np.array([1, 2]), np.array([1, 3]))


def test_data_equivalence_dtype_sensitive():
    assert not data_equivalence(np.float32(1.0), np.float64(1.0))


def test_data_equivalence_inexact_mode():
    # tolerance applies to arrays (scalars always compare exactly, as in reference)
    assert data_equivalence(np.array([1.0]), np.array([1.0 + 1e-7]), exact=False)
    assert not data_equivalence(np.array([1.0]), np.array([1.1]), exact=False)


def test_data_equivalence_default_is_inexact():
    # reference env_checker.py:33 defaults exact=False
    assert data_equivalence(np.array([1.0]), np.array([1.0 + 1e-7]))
