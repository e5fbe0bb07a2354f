from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_batch, mesh_from_config, tp_state_sharding,
                   DEFAULT_TP_RULES)
