from sparse_matrix_fine_tuning_tpu.models.backpack_gpt2 import (
    BackpackGPT2Config,
    BackpackGPT2LMHeadModel,
)
from sparse_matrix_fine_tuning_tpu.models.blip import (
    BlipForImageTextRetrieval,
    BlipForQuestionAnswering,
    BlipITMWrapper,
    BlipModelConfig,
    BlipWrapper,
)
from sparse_matrix_fine_tuning_tpu.models.config import LlamaConfig, RobertaConfig
from sparse_matrix_fine_tuning_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
from sparse_matrix_fine_tuning_tpu.models.gpt_neo import (
    GPTNeoConfig,
    GPTNeoForCausalLM,
)
from sparse_matrix_fine_tuning_tpu.models.gpt_neox import (
    GPTNeoXConfig,
    GPTNeoXForCausalLM,
)
from sparse_matrix_fine_tuning_tpu.models.llama import LlamaForCausalLM, LlamaModel
from sparse_matrix_fine_tuning_tpu.models.roberta import (
    RobertaForSequenceClassification,
    RobertaModel,
)
from sparse_matrix_fine_tuning_tpu.models.toy import GRUModel, MLPModel, ToyConfig

__all__ = [
    "BackpackGPT2Config",
    "BackpackGPT2LMHeadModel",
    "BlipForImageTextRetrieval",
    "BlipForQuestionAnswering",
    "BlipITMWrapper",
    "BlipModelConfig",
    "BlipWrapper",
    "GPT2Config",
    "GPT2LMHeadModel",
    "GPTNeoConfig",
    "GPTNeoForCausalLM",
    "GPTNeoXConfig",
    "GPTNeoXForCausalLM",
    "LlamaConfig",
    "RobertaConfig",
    "LlamaForCausalLM",
    "LlamaModel",
    "RobertaForSequenceClassification",
    "RobertaModel",
    "GRUModel",
    "MLPModel",
    "ToyConfig",
]
