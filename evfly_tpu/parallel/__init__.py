from .mesh import make_mesh, replicate_params, shard_batch
from .data_parallel import make_dp_train_step, dp_train_demo_step

__all__ = [
    "make_mesh",
    "replicate_params",
    "shard_batch",
    "make_dp_train_step",
    "dp_train_demo_step",
]
