from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, replicate,
                   replicated, shard_batch)
from .sharding import (shard_train_state, shard_tree, sharded_param_bytes,
                       spec_for, tree_specs)
from .spatial import activation_spec, make_sp_eps_fn, sp_shard_inputs

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh", "replicate",
    "replicated", "shard_batch", "shard_train_state", "shard_tree",
    "sharded_param_bytes", "spec_for", "tree_specs",
    "activation_spec", "make_sp_eps_fn", "sp_shard_inputs",
]
