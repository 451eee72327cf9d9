"""The space zoo used across space tests (pattern from reference
tests/spaces/utils.py: enumerate instances of every space type)."""

import numpy as np

from gymnasium_tpu import spaces

TESTING_FUNDAMENTAL_SPACES = [
    spaces.Box(low=0.0, high=1.0),
    spaces.Box(low=0.0, high=np.inf, shape=(2, 2)),
    spaces.Box(low=np.array([-10.0, 0.0]), high=np.array([10.0, 10.0])),
    spaces.Box(low=-np.inf, high=np.inf, shape=(1, 3)),
    spaces.Box(low=0, high=255, shape=(2, 2, 3), dtype=np.uint8),
    spaces.Discrete(3),
    spaces.Discrete(5, start=-2),
    spaces.MultiDiscrete([2, 2]),
    spaces.MultiDiscrete([[2, 3], [3, 2]]),
    spaces.MultiDiscrete([3, 4], start=[1, -1]),
    spaces.MultiBinary(8),
    spaces.MultiBinary([2, 3]),
    spaces.Text(6),
    spaces.Text(min_length=2, max_length=4, charset="abcde"),
]

TESTING_COMPOSITE_SPACES = [
    spaces.Tuple([spaces.Discrete(5), spaces.Discrete(10)]),
    spaces.Tuple(
        [spaces.Discrete(5), spaces.Box(low=np.array([0.0, 0.0]), high=np.array([1.0, 5.0]))]
    ),
    spaces.Tuple((spaces.Discrete(5), spaces.Tuple((spaces.Box(low=0.0, high=1.0, shape=(3,)), spaces.Discrete(2))))),
    spaces.Dict({"position": spaces.Discrete(5), "velocity": spaces.Box(low=np.array([0.0, 0.0]), high=np.array([1.0, 5.0]))}),
    spaces.Dict(
        {
            "a": spaces.Box(low=0, high=1, shape=(3, 3)),
            "b": spaces.Dict({"b_1": spaces.Box(low=-100, high=100, shape=(2,)), "b_2": spaces.Box(low=-1, high=1, shape=(2,))}),
            "c": spaces.Discrete(4),
        }
    ),
    spaces.Graph(node_space=spaces.Box(low=-100, high=100, shape=(3, 4)), edge_space=spaces.Discrete(5)),
    spaces.Graph(node_space=spaces.Discrete(10), edge_space=None),
    spaces.Sequence(spaces.Discrete(4)),
    spaces.Sequence(spaces.Box(0.0, 1.0, (3,)), stack=True),
    spaces.OneOf([spaces.Discrete(3), spaces.Box(low=0.0, high=1.0, shape=(2,))]),
]

TESTING_SPACES = TESTING_FUNDAMENTAL_SPACES + TESTING_COMPOSITE_SPACES
TESTING_SPACES_IDS = [str(space) for space in TESTING_SPACES]
