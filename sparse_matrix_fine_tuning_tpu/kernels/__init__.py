from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
    monarch_kernel,
    monarch_kernel_supported,
)

__all__ = ["monarch_kernel", "monarch_kernel_supported"]
