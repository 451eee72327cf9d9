"""Wrapper helpers: running mean/std and zero-array construction.

Parity surface: reference gymnasium/wrappers/utils.py:30-130.
"""

from __future__ import annotations

from functools import singledispatch

import numpy as np

from gymnasium_tpu import Space
from gymnasium_tpu.error import CustomSpaceError
from gymnasium_tpu.spaces import (
    Box,
    Dict,
    Discrete,
    Graph,
    MultiBinary,
    MultiDiscrete,
    OneOf,
    Sequence,
    Text,
    Tuple,
)

__all__ = ["RunningMeanStd", "update_mean_var_count_from_moments", "create_zero_array"]


class RunningMeanStd:
    """Tracks running mean/variance with Chan's parallel update."""

    def __init__(self, epsilon: float = 1e-4, shape: tuple[int, ...] = (), dtype=np.float64):
        self.mean = np.zeros(shape, dtype=dtype)
        self.var = np.ones(shape, dtype=dtype)
        self.count = epsilon

    def update(self, x: np.ndarray):
        """Fold a batch of samples (leading axis) into the statistics."""
        batch_mean = np.mean(x, axis=0)
        batch_var = np.var(x, axis=0)
        batch_count = x.shape[0]
        self.update_from_moments(batch_mean, batch_var, batch_count)

    def update_from_moments(self, batch_mean, batch_var, batch_count):
        """Fold precomputed batch moments into the statistics."""
        self.mean, self.var, self.count = update_mean_var_count_from_moments(
            self.mean, self.var, self.count, batch_mean, batch_var, batch_count
        )


def update_mean_var_count_from_moments(mean, var, count, batch_mean, batch_var, batch_count):
    """Chan et al. parallel-variance merge of two moment sets."""
    delta = batch_mean - mean
    tot_count = count + batch_count

    new_mean = mean + delta * batch_count / tot_count
    m_a = var * count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + np.square(delta) * count * batch_count / tot_count
    new_var = m2 / tot_count
    new_count = tot_count

    return new_mean, new_var, new_count


@singledispatch
def create_zero_array(space: Space):
    """A zero-valued element of ``space`` (used for padding)."""
    if isinstance(space, Space):
        raise CustomSpaceError(
            f"Space of type `{type(space)}` doesn't have an registered `create_zero_array` function. Register `{type(space)}` for `create_zero_array` to support it."
        )
    raise TypeError(f"The space provided to `create_zero_array` is not a gymnasium Space instance, type: {type(space)}, {space}")


@create_zero_array.register(Box)
def _create_box_zero_array(space: Box):
    zero_array = np.zeros(space.shape, dtype=space.dtype)
    zero_array = np.where(space.low > 0, space.low, zero_array)
    zero_array = np.where(space.high < 0, space.high, zero_array)
    return zero_array


@create_zero_array.register(Discrete)
def _create_discrete_zero_array(space: Discrete):
    return space.start


@create_zero_array.register(MultiDiscrete)
def _create_multidiscrete_zero_array(space: MultiDiscrete):
    return np.array(space.start, copy=True, dtype=space.dtype)


@create_zero_array.register(MultiBinary)
def _create_multibinary_zero_array(space: MultiBinary):
    return np.zeros(space.shape, dtype=space.dtype)


@create_zero_array.register(Tuple)
def _create_tuple_zero_array(space: Tuple):
    return tuple(create_zero_array(subspace) for subspace in space.spaces)


@create_zero_array.register(Dict)
def _create_dict_zero_array(space: Dict):
    return {key: create_zero_array(subspace) for key, subspace in space.spaces.items()}


@create_zero_array.register(Sequence)
def _create_sequence_zero_array(space: Sequence):
    if space.stack:
        from gymnasium_tpu.vector.utils import create_empty_array

        return create_empty_array(space.feature_space, 0)
    return tuple()


@create_zero_array.register(Text)
def _create_text_zero_array(space: Text):
    return space.characters[0] * space.min_length


@create_zero_array.register(Graph)
def _create_graph_zero_array(space: Graph):
    from gymnasium_tpu.spaces import GraphInstance

    nodes = np.expand_dims(create_zero_array(space.node_space), axis=0)
    if space.edge_space is None:
        return GraphInstance(nodes=nodes, edges=None, edge_links=None)
    edges = np.expand_dims(create_zero_array(space.edge_space), axis=0)
    edge_links = np.zeros((1, 2), dtype=np.int64)
    return GraphInstance(nodes=nodes, edges=edges, edge_links=edge_links)


@create_zero_array.register(OneOf)
def _create_oneof_zero_array(space: OneOf):
    return (np.int64(0), create_zero_array(space.spaces[0]))


def rescale_box(box, new_min, new_max):
    """Affine rescale of a Box with inf-aware bounds: unbounded components
    must stay unbounded and pass through unscaled (reference
    wrappers/utils.py:156-236).

    Returns ``(new_box, forward, backward)`` where forward maps original ->
    rescaled and backward maps rescaled -> original.
    """
    from gymnasium_tpu.spaces import Box

    assert isinstance(box, Box)

    if not isinstance(new_min, np.ndarray):
        assert np.issubdtype(type(new_min), np.integer) or np.issubdtype(
            type(new_min), np.floating
        )
        new_min = np.full(box.shape, new_min)
    assert new_min.shape == box.shape, f"{new_min.shape}, {box.shape}, {new_min}, {box.low}"

    if not isinstance(new_max, np.ndarray):
        assert np.issubdtype(type(new_max), np.integer) or np.issubdtype(
            type(new_max), np.floating
        )
        new_max = np.full(box.shape, new_max)
    assert new_max.shape == box.shape
    assert np.all((new_min == box.low)[np.isinf(new_min) | np.isinf(box.low)])
    assert np.all((new_max == box.high)[np.isinf(new_max) | np.isinf(box.high)])
    assert np.all(new_min <= new_max)
    assert np.all(box.low <= box.high)

    try:
        high_low_diff_dtype = np.float128
    except AttributeError:
        high_low_diff_dtype = np.float64

    min_finite = np.isfinite(new_min)
    max_finite = np.isfinite(new_max)
    both_finite = min_finite & max_finite

    high_low_diff = np.array(box.high[both_finite], dtype=high_low_diff_dtype) - np.array(
        box.low[both_finite], dtype=high_low_diff_dtype
    )

    gradient = np.ones_like(new_min, dtype=box.dtype)
    gradient[both_finite] = (new_max[both_finite] - new_min[both_finite]) / high_low_diff

    intercept = np.zeros_like(new_min, dtype=box.dtype)
    # where both are finite, the lower-bound anchoring takes precedence
    intercept[max_finite] = new_max[max_finite] - box.high[max_finite]
    intercept[min_finite] = gradient[min_finite] * -box.low[min_finite] + new_min[min_finite]

    new_box = Box(low=new_min, high=new_max, shape=box.shape, dtype=box.dtype)

    def forward(obs):
        return gradient * obs + intercept

    def backward(obs):
        return (obs - intercept) / gradient

    return new_box, forward, backward
