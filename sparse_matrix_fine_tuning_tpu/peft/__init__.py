from sparse_matrix_fine_tuning_tpu.peft.boft import BOFTLinear, init_boft
from sparse_matrix_fine_tuning_tpu.peft.surgery import (
    find_all_linear_names,
    init_lora,
    init_monarch,
    merge_all_adapters,
    param_stats,
    trainable_filter,
    unmerge_all_adapters,
)

__all__ = [
    "BOFTLinear",
    "init_boft",
    "find_all_linear_names",
    "init_lora",
    "init_monarch",
    "merge_all_adapters",
    "param_stats",
    "trainable_filter",
    "unmerge_all_adapters",
]
