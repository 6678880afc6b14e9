from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, replicate,
                   replicated, shard_batch)
from .sharding import (shard_train_state, shard_tree, sharded_param_bytes,
                       spec_for, tree_specs)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh", "replicate",
    "replicated", "shard_batch", "shard_train_state", "shard_tree",
    "sharded_param_bytes", "spec_for", "tree_specs",
]
