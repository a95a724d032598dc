"""Model components and networks as pure functions over pytrees."""

from .components import (
    Component, BiasedLinearity, SharedLinearity, DiscreteLinearity,
    SparseLinearity, ClusterLinearity, Sigmoid, Softmax, BlockSoftmax,
    Expand, Copy, Transpose, BlockLinearity, Bias, Window, Log,
    Rbm, RbmSparse, Recurrent, BlockArray, TAG_TO_TYPE,
)
from .network import Network, read_components, write_component
