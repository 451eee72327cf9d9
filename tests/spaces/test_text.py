"""Text space behavioral tests (coverage pattern: reference tests/spaces/test_text.py)."""

import numpy as np
import pytest

from gymnasium_tpu.spaces import Text


def test_lengths_and_charset():
    space = Text(min_length=2, max_length=5, charset="abc", seed=0)
    for _ in range(30):
        s = space.sample()
        assert 2 <= len(s) <= 5
        assert set(s) <= {"a", "b", "c"}
        assert space.contains(s)


def test_contains():
    space = Text(min_length=1, max_length=3, charset="xy")
    assert space.contains("x") and space.contains("xyx")
    assert not space.contains("")  # too short
    assert not space.contains("xyxy")  # too long
    assert not space.contains("xz")  # bad char
    assert not space.contains(5)


def test_invalid_lengths():
    with pytest.raises(AssertionError):
        Text(min_length=5, max_length=3)
    with pytest.raises(AssertionError):
        Text(min_length=-1, max_length=3)


def test_sample_length_mask():
    space = Text(min_length=1, max_length=8, seed=0)
    for _ in range(10):
        assert len(space.sample(mask=(4, None))) == 4


def test_sample_char_mask():
    space = Text(3, charset="abc", seed=0)
    # sorted charset is a,b,c; allow only 'b'
    mask = np.array([0, 1, 0], dtype=np.int8)
    s = space.sample(mask=(3, mask))
    assert s == "bbb"


def test_sample_probability_mask():
    space = Text(4, charset="abc", seed=0)
    prob = np.array([0.0, 0.0, 1.0])
    assert set(space.sample(probability=(4, prob))) == {"c"}


def test_all_zero_char_mask():
    zero_min = Text(min_length=0, max_length=4, charset="ab", seed=0)
    assert zero_min.sample(mask=(None, np.zeros(2, dtype=np.int8))) == ""
    pos_min = Text(min_length=1, max_length=4, charset="ab", seed=0)
    with pytest.raises(ValueError):
        pos_min.sample(mask=(None, np.zeros(2, dtype=np.int8)))


def test_length_mask_out_of_bounds():
    space = Text(min_length=2, max_length=4)
    with pytest.raises(AssertionError):
        space.sample(mask=(5, None))
    with pytest.raises(AssertionError):
        space.sample(mask=(1, None))


def test_character_helpers():
    space = Text(3, charset="cba")
    assert space.characters == "abc"
    assert space.character_list == ("a", "b", "c")
    assert int(space.character_index("b")) == 1
    assert space.character_set == frozenset("abc")


def test_equality_and_seed():
    assert Text(3, charset="ab") == Text(3, charset="ba")
    assert Text(3) != Text(4)
    a, b = Text(6), Text(6)
    a.seed(9)
    b.seed(9)
    assert a.sample() == b.sample()


def test_np_flattenable():
    # flattens to an int32 char-index array padded to max_length (reference text.py:222)
    assert Text(3).is_np_flattenable
