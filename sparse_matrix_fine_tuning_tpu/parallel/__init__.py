from sparse_matrix_fine_tuning_tpu.parallel.annotate import (
    activation_mesh,
    set_activation_mesh,
    shard_tokens,
)
from sparse_matrix_fine_tuning_tpu.parallel import multihost
from sparse_matrix_fine_tuning_tpu.parallel.mesh import make_mesh
from sparse_matrix_fine_tuning_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    shard_state,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_state",
           "activation_mesh", "set_activation_mesh", "shard_tokens",
           "multihost"]
