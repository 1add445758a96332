"""TPU-native Monarch (MoRe) parameter-efficient fine-tuning framework.

A from-scratch JAX/XLA/Pallas/pjit implementation of the capabilities of
SprocketLab/sparse_matrix_fine_tuning ("MoRe Fine-Tuning with 10x Fewer
Parameters", ICML 2024): structured Monarch matrix algebra, fused Pallas
kernels, Flax-NNX adapter layers with model surgery over transformer
families (RoBERTa / DeBERTa / Llama), jit/pjit bf16 training harnesses
with FSDP-style sharding over a device mesh, ASHA hyper-parameter search,
trainable-params-only checkpointing and profiling.

Package map (see SURVEY.md for the reference layer map this mirrors):
  ops/        pure-jnp Monarch algebra: multiplies, SVD projections
  kernels/    Pallas TPU kernels (fused monarch fwd+bwd, activations)
  layers/     MonarchLinear / MonarchFactor / Scaler adapter modules (nnx)
  peft/       model surgery (init_monarch), LoRA/BOFT baselines
  models/     TPU-native RoBERTa / DeBERTa / Llama + generation
  parallel/   mesh + sharding rules (dp x fsdp over ICI)
  training/   jit train loop, optimizer groups, checkpointing, HPO
  data/       GLUE / reasoning / alpaca / AG News pipelines
  interventions/  ReFT-style activation-intervention engine
  quant/      int8/int4 frozen-base quantization
  utils/      config system, logging
"""

__version__ = "0.1.0"
