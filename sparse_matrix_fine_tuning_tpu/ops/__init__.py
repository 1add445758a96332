from sparse_matrix_fine_tuning_tpu.ops.blockdiag import (
    blockdiag_multiply,
    blockdiag_multiply_reference,
    blockdiag_weight_to_dense_weight,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import (
    blockdiag_butterfly_multiply,
    blockdiag_butterfly_multiply_reference,
    monarch_dense_equivalent,
)
from sparse_matrix_fine_tuning_tpu.ops.projection import (
    blockdiag_butterfly_project,
    blockdiag_butterfly_project_einsum_rank,
    blockdiag_butterfly_project_einsum_simple,
    low_rank_project,
)

__all__ = [
    "blockdiag_multiply",
    "blockdiag_multiply_reference",
    "blockdiag_weight_to_dense_weight",
    "blockdiag_butterfly_multiply",
    "blockdiag_butterfly_multiply_reference",
    "monarch_dense_equivalent",
    "blockdiag_butterfly_project",
    "blockdiag_butterfly_project_einsum_rank",
    "blockdiag_butterfly_project_einsum_simple",
    "low_rank_project",
]
