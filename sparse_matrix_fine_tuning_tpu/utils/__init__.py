from sparse_matrix_fine_tuning_tpu.utils.config import (
    load_best_hp,
    load_json,
    override_config,
)

__all__ = ["load_best_hp", "load_json", "override_config"]
