from .mesh import batch_sharding, make_mesh, replicated
from .train_step import TrainState, init_pretrain_state, make_pretrain_step

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "TrainState",
    "init_pretrain_state",
    "make_pretrain_step",
]
