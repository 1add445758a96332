"""Model configurations.

Plain dataclasses (JSON-serialisable) for the TPU-native model family.
Field names track the HF configs so checkpoints/configs map over directly
(the reference uses stock HF RoBERTa/DeBERTa/Llama -- SURVEY.md section 2.3).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


def _resolve_dtype(name):
    import jax.numpy as jnp
    if name is None:
        return None
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    num_labels: int = 2
    # regression tasks (STS-B) use num_labels == 1
    dtype: Optional[str] = None  # compute dtype, e.g. "bfloat16"; params stay f32

    @classmethod
    def tiny(cls, **kw):
        """CPU-testable config."""
        d = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=66)
        d.update(kw)
        return cls(**d)

    @classmethod
    def base(cls, **kw):
        return cls(**kw)

    @classmethod
    def large(cls, **kw):
        d = dict(hidden_size=1024, num_hidden_layers=24,
                 num_attention_heads=16, intermediate_size=4096)
        d.update(kw)
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Decoder-only causal-LM family config.

    The defaults are Llama-2; the extra knobs cover the sibling families the
    intervention/PEFT stack also targets (pyvene ships per-arch component
    maps for mistral/gemma/qwen2 -- reference
    pyreft/pyvene/pyvene/models/*/modelings_intervenable_*.py; here one
    parameterized stack serves them all):
      Mistral: ``sliding_window``
      Gemma:   ``head_dim`` (decoupled from hidden/heads), ``mlp_activation=
               "gelu_tanh"``, ``rmsnorm_unit_offset`` ((1+w) scale),
               ``scale_embeddings`` (sqrt(hidden) on the embedding output),
               ``tie_word_embeddings``
      Qwen2:   ``attention_qkv_bias``
    """
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None  # None -> MHA
    intermediate_size: int = 11008
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    tie_word_embeddings: bool = False
    # per-head width; None -> hidden_size // num_attention_heads.  Gemma
    # decouples it (e.g. 2B: 2048 hidden, 8 heads, head_dim 256).
    head_dim: Optional[int] = None
    # bias on q/k/v projections (Qwen2); o_proj stays bias-free in all
    # supported families
    attention_qkv_bias: bool = False
    # gated-MLP nonlinearity: "silu" (Llama/Mistral/Qwen2 SwiGLU) or
    # "gelu_tanh" (Gemma GeGLU) -- both fused custom_vjp ops
    mlp_activation: str = "silu"
    # Mistral-style local attention: token i attends to [i-window+1, i].
    # None disables.  HF semantics: the window COUNTS the query token.
    sliding_window: Optional[int] = None
    # Gemma: RMSNorm scale is stored as an offset, out = norm(x) * (1 + w)
    rmsnorm_unit_offset: bool = False
    # Gemma: multiply embedding output by sqrt(hidden_size)
    scale_embeddings: bool = False
    dtype: Optional[str] = None  # compute dtype, e.g. "bfloat16"; params stay f32
    # "einsum": explicit softmax(QK^T)V; "dpa": jax.nn.dot_product_attention
    # (XLA fused); "splash": Pallas splash-attention kernel (TPU, causal,
    # head_dim % 128 == 0) -- the flash-attention-2 capability slot
    # (reference loreft/train.py:122 attn_implementation)
    attention_impl: str = "einsum"
    # parameter storage dtype: "float32" (default) or "bfloat16" (halves the
    # frozen base's HBM footprint; adapters stay f32 via their own param_dtype)
    param_dtype: str = "float32"
    # rematerialise each decoder layer in the backward (gradient
    # checkpointing; the reference enables HF gradient_checkpointing for the
    # 7B flows -- qlora_monarch.py:144-146)
    remat: bool = False
    # what the per-layer remat SAVES instead of recomputing:
    #   "nothing"  -- full recompute, O(1)-layer activation memory (the HF
    #                 gradient_checkpointing equivalent; the 7B-on-one-chip
    #                 configs need this)
    #   "dots"     -- jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
    #                 matmul outputs are saved, only cheap elementwise /
    #                 norm / attention-softmax work is recomputed.  Costs
    #                 ~O(layers) saved dot outputs but removes most of the
    #                 ~2N recompute FLOPs -- the right default whenever the
    #                 model is not memory-bound on one chip.
    remat_policy: str = "nothing"
    # chunked cross-entropy (ops/losses.py): compute the training loss in
    # token chunks of this size so the full (B, T, V) float32 logits tensor
    # is never materialised (backward recomputes each chunk's logits).
    # 0 disables (materialised HF-style loss).  Only affects
    # ``training_loss``; ``__call__`` still returns full logits.
    loss_chunk: int = 0

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def head_width(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, num_key_value_heads=2,
                 intermediate_size=128, max_position_embeddings=128)
        d.update(kw)
        return cls(**d)

    @classmethod
    def llama2_7b(cls, **kw):
        return cls(**kw)

    @classmethod
    def mistral_7b(cls, **kw):
        d = dict(num_key_value_heads=8, intermediate_size=14336,
                 max_position_embeddings=32768, sliding_window=4096,
                 rms_norm_eps=1e-5, rope_theta=10000.0)
        d.update(kw)
        return cls(**d)

    @classmethod
    def gemma_2b(cls, **kw):
        d = dict(vocab_size=256000, hidden_size=2048, num_hidden_layers=18,
                 num_attention_heads=8, num_key_value_heads=1, head_dim=256,
                 intermediate_size=16384, max_position_embeddings=8192,
                 rms_norm_eps=1e-6, mlp_activation="gelu_tanh",
                 rmsnorm_unit_offset=True, scale_embeddings=True,
                 tie_word_embeddings=True)
        d.update(kw)
        return cls(**d)

    @classmethod
    def qwen2_7b(cls, **kw):
        d = dict(vocab_size=152064, hidden_size=3584, num_hidden_layers=28,
                 num_attention_heads=28, num_key_value_heads=4,
                 intermediate_size=18944, max_position_embeddings=32768,
                 rms_norm_eps=1e-6, rope_theta=1000000.0,
                 attention_qkv_bias=True)
        d.update(kw)
        return cls(**d)


RobertaConfig.compute_dtype = property(lambda self: _resolve_dtype(self.dtype))
LlamaConfig.compute_dtype = property(lambda self: _resolve_dtype(self.dtype))
LlamaConfig.params_dtype = property(
    lambda self: _resolve_dtype(self.param_dtype) or __import__("jax.numpy", fromlist=["x"]).float32)
