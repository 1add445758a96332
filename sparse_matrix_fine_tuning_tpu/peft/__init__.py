from sparse_matrix_fine_tuning_tpu.peft.boft import BOFTLinear, init_boft
from sparse_matrix_fine_tuning_tpu.peft.import_reference import (
    export_reference_adapters,
    load_reference_adapters,
    save_reference_adapters,
)
from sparse_matrix_fine_tuning_tpu.peft.surgery import (
    disable_merged_training,
    enable_merged_training,
    find_all_linear_names,
    init_lora,
    init_monarch,
    merge_all_adapters,
    param_stats,
    refresh_merged,
    trainable_filter,
    unmerge_all_adapters,
)

__all__ = [
    "BOFTLinear",
    "init_boft",
    "disable_merged_training",
    "enable_merged_training",
    "find_all_linear_names",
    "init_lora",
    "export_reference_adapters",
    "init_monarch",
    "load_reference_adapters",
    "save_reference_adapters",
    "merge_all_adapters",
    "param_stats",
    "refresh_merged",
    "trainable_filter",
    "unmerge_all_adapters",
]
