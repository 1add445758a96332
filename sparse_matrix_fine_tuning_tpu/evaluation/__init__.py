from sparse_matrix_fine_tuning_tpu.evaluation.predict import (
    predict_classes,
    predict_logits,
)
from sparse_matrix_fine_tuning_tpu.evaluation.reasoning import (
    compute_reasoning_metrics,
    extract_answer_letter,
    extract_answer_number,
    extract_output,
)

__all__ = [
    "compute_reasoning_metrics",
    "extract_answer_letter",
    "extract_answer_number",
    "extract_output",
    "predict_classes",
    "predict_logits",
]
