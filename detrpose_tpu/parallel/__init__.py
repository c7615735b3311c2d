from .mesh import make_mesh, batch_sharding, replicated_sharding
from .train_step import TrainState, make_train_step, init_train_state

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "TrainState",
    "make_train_step",
    "init_train_state",
]
