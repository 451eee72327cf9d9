"""Dict / Tuple / Sequence / Graph / OneOf behavioral tests
(coverage pattern: reference tests/spaces/test_{dict,tuple,sequence,graph,oneof}.py)."""

import pickle
from collections import OrderedDict

import numpy as np
import pytest

from gymnasium_tpu.spaces import (
    Box,
    Dict,
    Discrete,
    Graph,
    GraphInstance,
    MultiBinary,
    OneOf,
    Sequence,
    Tuple,
)

# --- Dict -------------------------------------------------------------------


def test_dict_mapping_interface():
    space = Dict({"a": Discrete(3), "b": Box(0.0, 1.0, (2,))})
    assert len(space) == 2
    assert set(iter(space)) == {"a", "b"}
    assert isinstance(space["a"], Discrete)
    assert "a" in space.spaces


def test_dict_kwargs_construction():
    space = Dict(a=Discrete(2), b=Discrete(3))
    assert set(space.spaces.keys()) == {"a", "b"}


def test_dict_sorted_keys():
    space = Dict({"z": Discrete(2), "a": Discrete(2), "m": Discrete(2)})
    assert list(space.spaces.keys()) == ["a", "m", "z"]


def test_dict_ordered_dict_preserves_order():
    space = Dict(OrderedDict([("z", Discrete(2)), ("a", Discrete(2))]))
    assert list(space.spaces.keys()) == ["z", "a"]


def test_dict_sample_and_contains():
    space = Dict({"a": Discrete(3), "b": Box(0.0, 1.0, (2,))}, seed=0)
    sample = space.sample()
    assert isinstance(sample, dict)
    assert space.contains(sample)
    assert not space.contains({"a": 0})  # missing key
    assert not space.contains({"a": 5, "b": sample["b"]})  # out of range


def test_dict_seed_by_dict():
    a = Dict({"x": Discrete(10), "y": Discrete(10)})
    b = Dict({"x": Discrete(10), "y": Discrete(10)})
    a.seed({"x": 1, "y": 2})
    b.seed({"x": 1, "y": 2})
    sa, sb = a.sample(), b.sample()
    assert sa == sb


def test_dict_seed_int_decorrelates_subspaces():
    space = Dict({"x": Discrete(100), "y": Discrete(100)})
    space.seed(0)
    samples = [space.sample() for _ in range(20)]
    # with per-subspace derived seeds, x and y should not be identical streams
    assert any(s["x"] != s["y"] for s in samples)


def test_dict_equality():
    assert Dict({"a": Discrete(2)}) == Dict({"a": Discrete(2)})
    assert Dict({"a": Discrete(2)}) != Dict({"a": Discrete(3)})
    assert Dict({"a": Discrete(2)}) != Dict({"b": Discrete(2)})


# --- Tuple ------------------------------------------------------------------


def test_tuple_interface():
    space = Tuple([Discrete(2), Box(0.0, 1.0, (1,))])
    assert len(space) == 2
    assert isinstance(space[0], Discrete)
    sample = space.sample()
    assert isinstance(sample, tuple) and len(sample) == 2
    assert space.contains(sample)


def test_tuple_contains_rejects():
    space = Tuple([Discrete(2), Discrete(2)])
    assert not space.contains((0,))  # wrong arity
    assert not space.contains((0, 5))
    assert not space.contains([0, 1]) or space.contains([0, 1])  # list may be accepted


def test_tuple_seed_sequence():
    a = Tuple([Discrete(10), Discrete(10)])
    b = Tuple([Discrete(10), Discrete(10)])
    a.seed([3, 4])
    b.seed([3, 4])
    assert a.sample() == b.sample()


def test_tuple_nested():
    space = Tuple((Discrete(2), Tuple((Box(0.0, 1.0, (1,)), Discrete(3)))))
    sample = space.sample()
    assert space.contains(sample)


# --- Sequence ---------------------------------------------------------------


def test_sequence_unstacked():
    space = Sequence(Discrete(4), seed=0)
    sample = space.sample()
    assert isinstance(sample, tuple)
    assert all(0 <= int(x) < 4 for x in sample)
    assert space.contains(sample)
    assert not space.contains((np.int64(7),))


def test_sequence_stacked():
    space = Sequence(Box(0.0, 1.0, (3,)), stack=True, seed=0)
    sample = space.sample()
    assert isinstance(sample, np.ndarray)
    assert sample.ndim == 2 and sample.shape[1] == 3
    assert space.contains(sample)


def test_sequence_length_mask_int():
    space = Sequence(Discrete(3), seed=0)
    sample = space.sample(mask=(4, None))
    assert len(sample) == 4


def test_sequence_length_mask_array():
    space = Sequence(Discrete(3), seed=0)
    lengths = {len(space.sample(mask=(np.array([2, 5]), None))) for _ in range(30)}
    assert lengths <= {2, 5} and len(lengths) == 2


def test_sequence_feature_mask_forwarded():
    space = Sequence(Discrete(3), seed=0)
    feature_mask = np.array([0, 0, 1], dtype=np.int8)
    sample = space.sample(mask=(5, feature_mask))
    assert all(int(x) == 2 for x in sample)


def test_sequence_equality():
    assert Sequence(Discrete(3)) == Sequence(Discrete(3))
    assert Sequence(Discrete(3)) != Sequence(Discrete(3), stack=True)
    assert Sequence(Discrete(3)) != Sequence(Discrete(4))


# --- Graph ------------------------------------------------------------------


def test_graph_sample_shapes():
    space = Graph(node_space=Box(-1.0, 1.0, (3,)), edge_space=Discrete(4), seed=0)
    sample = space.sample(num_nodes=5, num_edges=7)
    assert isinstance(sample, GraphInstance)
    assert sample.nodes.shape == (5, 3)
    assert sample.edges.shape == (7,)
    assert sample.edge_links.shape == (7, 2)
    assert np.all(sample.edge_links >= 0) and np.all(sample.edge_links < 5)
    assert space.contains(sample)


def test_graph_no_edge_space():
    space = Graph(node_space=Discrete(10), edge_space=None, seed=0)
    sample = space.sample(num_nodes=4)
    assert sample.edges is None and sample.edge_links is None
    assert space.contains(sample)


def test_graph_contains_rejects_bad_links():
    space = Graph(node_space=Box(-1.0, 1.0, (2,)), edge_space=Discrete(2), seed=0)
    good = space.sample(num_nodes=3, num_edges=2)
    bad_links = GraphInstance(good.nodes, good.edges, np.array([[0, 5], [1, 2]]))
    assert not space.contains(bad_links)
    assert not space.contains("not a graph")


def test_graph_zero_nodes_rejected():
    space = Graph(node_space=Discrete(3), edge_space=None)
    with pytest.raises(AssertionError):
        space.sample(num_nodes=0)


def test_graph_equality():
    assert Graph(node_space=Discrete(3), edge_space=None) == Graph(
        node_space=Discrete(3), edge_space=None
    )
    assert Graph(node_space=Discrete(3), edge_space=None) != Graph(
        node_space=Discrete(4), edge_space=None
    )


# --- OneOf ------------------------------------------------------------------


def test_oneof_sample_tagged():
    space = OneOf([Discrete(3), Box(0.0, 1.0, (2,))], seed=0)
    for _ in range(20):
        idx, sample = space.sample()
        assert idx in (0, 1)
        assert space.spaces[int(idx)].contains(sample)
        assert space.contains((idx, sample))


def test_oneof_contains_rejects():
    space = OneOf([Discrete(3), MultiBinary(2)])
    assert not space.contains((2, 0))  # idx out of range
    assert not space.contains((0, 5))  # sample not in subspace 0
    assert not space.contains(7)  # not a tuple


def test_oneof_len_getitem():
    space = OneOf([Discrete(3), Discrete(5)])
    assert len(space) == 2
    assert space[1] == Discrete(5)


def test_oneof_pickle_and_jsonable():
    space = OneOf([Discrete(3), Box(0.0, 1.0, (2,))], seed=0)
    clone = pickle.loads(pickle.dumps(space))
    assert clone == space
    samples = [space.sample() for _ in range(5)]
    recovered = space.from_jsonable(space.to_jsonable(samples))
    for (i1, s1), (i2, s2) in zip(samples, recovered):
        assert int(i1) == int(i2)
        assert np.all(np.asarray(s1) == np.asarray(s2))
