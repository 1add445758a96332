from sparse_matrix_fine_tuning_tpu.interventions.reft import (
    ConsreftIntervention,
    LoreftIntervention,
    MoReIntervention,
    NoIntervention,
    NoreftIntervention,
    ReftConfig,
    ReftModel,
    get_reft_model,
)

__all__ = [
    "ConsreftIntervention",
    "LoreftIntervention",
    "MoReIntervention",
    "NoIntervention",
    "NoreftIntervention",
    "ReftConfig",
    "ReftModel",
    "get_reft_model",
]
