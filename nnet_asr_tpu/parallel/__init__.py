"""Multi-chip parallelism: mesh construction, data-parallel and
senone-sharded training steps over XLA collectives."""

from .mesh import make_mesh
from .sharded_step import ShardedTrainState, make_sharded_train_step
