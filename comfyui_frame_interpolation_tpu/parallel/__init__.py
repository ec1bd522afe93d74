from .infer import make_sharded_model_fn
from .mesh import (
    MIN_ROWS_PER_SHARD,
    data_sharding,
    frame_sharding,
    make_mesh,
    replicated,
)
from .train import l1_loss, make_train_step

__all__ = [
    "MIN_ROWS_PER_SHARD",
    "data_sharding",
    "frame_sharding",
    "make_mesh",
    "make_sharded_model_fn",
    "replicated",
    "l1_loss",
    "make_train_step",
]
