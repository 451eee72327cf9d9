"""Space zoo: typed observation/action domains with host + device sampling.

Parity surface with reference gymnasium/spaces/__init__.py — the 10 concrete
space types plus the flatten utilities.
"""

from gymnasium_tpu.spaces.box import Box
from gymnasium_tpu.spaces.dict import Dict
from gymnasium_tpu.spaces.discrete import Discrete
from gymnasium_tpu.spaces.graph import Graph, GraphInstance
from gymnasium_tpu.spaces.multi_binary import MultiBinary
from gymnasium_tpu.spaces.multi_discrete import MultiDiscrete
from gymnasium_tpu.spaces.oneof import OneOf
from gymnasium_tpu.spaces.sequence import Sequence
from gymnasium_tpu.spaces.space import Space
from gymnasium_tpu.spaces.text import Text
from gymnasium_tpu.spaces.tuple import Tuple
from gymnasium_tpu.spaces.utils import (
    flatdim,
    flatten,
    flatten_space,
    is_space_dtype_shape_equiv,
    unflatten,
)

__all__ = [
    "Space",
    "Box",
    "Discrete",
    "MultiDiscrete",
    "MultiBinary",
    "Text",
    "Dict",
    "Tuple",
    "Sequence",
    "Graph",
    "GraphInstance",
    "OneOf",
    "flatdim",
    "flatten",
    "flatten_space",
    "unflatten",
    "is_space_dtype_shape_equiv",
]
