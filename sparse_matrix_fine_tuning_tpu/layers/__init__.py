from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import (
    DEFAULT_PEFT_CONFIG,
    AdapterParam,
    MonarchFactor,
    MonarchLinear,
    Scaler,
)

__all__ = [
    "DEFAULT_PEFT_CONFIG",
    "AdapterParam",
    "MonarchFactor",
    "MonarchLinear",
    "Scaler",
]
