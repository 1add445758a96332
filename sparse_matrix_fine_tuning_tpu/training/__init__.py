from sparse_matrix_fine_tuning_tpu.training.optim import (
    build_optimizer,
    build_schedule,
)
from sparse_matrix_fine_tuning_tpu.training.trainer import Trainer, TrainingArgs

__all__ = ["build_optimizer", "build_schedule", "Trainer", "TrainingArgs"]
