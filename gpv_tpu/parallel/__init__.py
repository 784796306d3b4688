from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                   initialize_distributed, make_mesh, mesh_from_config,
                   replicated, shard_batch)
from .sharding_rules import (make_param_shardings, param_partition_spec,
                             shard_params)
from .train_step import TrainState, create_train_state, make_train_step

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
    "initialize_distributed", "mesh_from_config", "replicated",
    "shard_batch",
    "TrainState", "create_train_state", "make_train_step",
    "make_param_shardings", "param_partition_spec", "shard_params",
]
