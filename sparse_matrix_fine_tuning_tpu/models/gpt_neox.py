"""TPU-native GPT-NeoX / Pythia (flax NNX).

The architecture between GPT-2 and Llama: rotary embeddings applied to only
the first ``rotary_pct`` of each head (partial rotary), PARALLEL residual
(``x + attn(ln1(x)) + mlp(ln2(x))`` computed from the same input), fused
``query_key_value`` projection with a PER-HEAD interleaved (q|k|v) layout,
biased LayerNorms/Linears, and an untied ``embed_out`` head.  The reference
vendors pyvene's per-arch GPT-NeoX support
(pyreft/pyvene/pyvene/models/gpt_neox/modelings_intervenable_gpt_neox.py);
here the model speaks the same functional ``layer_hooks`` contract as
models/llama.py so ReftModel, PEFT surgery, and the shared decode loops
work unchanged.

HF attribute names are kept (``query_key_value``/``dense``,
``dense_h_to_4h``/``dense_4h_to_h``, ``embed_in``/``embed_out``) so HF
checkpoints convert tensor-by-tensor (hf_convert.load_gpt_neox) and
``target_modules`` lists written for HF GPT-NeoX port 1:1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.config import _resolve_dtype
from sparse_matrix_fine_tuning_tpu.models.llama import apply_rope

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GPTNeoXConfig:
    vocab_size: int = 50432
    hidden_size: int = 2048
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 8192
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    rotary_pct: float = 0.25          # fraction of head_dim that rotates
    rope_theta: float = 10000.0       # HF rotary_emb_base
    use_parallel_residual: bool = True
    hidden_act: str = "gelu"          # exact (erf) GELU in HF GPT-NeoX
    bos_token_id: int = 0
    eos_token_id: int = 0
    pad_token_id: int = 0
    tie_word_embeddings: bool = False
    dtype: Optional[str] = None
    param_dtype: str = "float32"
    # chunked cross-entropy (ops/losses.py); 0 = materialised loss
    loss_chunk: int = 0

    @property
    def kv_heads(self) -> int:
        return self.num_attention_heads

    @property
    def head_width(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_ndims(self) -> int:
        return int(self.head_width * self.rotary_pct)

    @property
    def compute_dtype(self):
        return _resolve_dtype(self.dtype)

    @property
    def params_dtype(self):
        return _resolve_dtype(self.param_dtype) or jnp.float32

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=128,
                 max_position_embeddings=128)
        d.update(kw)
        return cls(**d)

    @classmethod
    def pythia_1b(cls, **kw):
        d = dict(hidden_size=2048, num_hidden_layers=16,
                 num_attention_heads=8, intermediate_size=8192)
        d.update(kw)
        return cls(**d)


def _linear(in_f, out_f, rngs, cfg, use_bias=True):
    return nnx.Linear(
        in_f, out_f, use_bias=use_bias, dtype=cfg.compute_dtype,
        param_dtype=cfg.params_dtype,
        kernel_init=nnx.initializers.normal(stddev=0.02), rngs=rngs)


def _ln(cfg, rngs):
    return nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                         dtype=cfg.compute_dtype,
                         param_dtype=cfg.params_dtype, rngs=rngs)


class GPTNeoXAttention(nnx.Module):
    """Fused qkv with HF's per-head interleave: ``query_key_value`` output
    reshapes to (b, t, heads, 3*head_dim) and splits q|k|v on the LAST axis
    (NOT three hidden-size chunks like GPT-2).  Rotary on the first
    ``rotary_ndims`` of each head; the rest passes through unrotated."""

    def __init__(self, cfg: GPTNeoXConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.num_heads = cfg.num_attention_heads
        self.head_dim = cfg.head_width
        self.query_key_value = _linear(cfg.hidden_size, 3 * cfg.hidden_size,
                                       rngs, cfg)
        self.dense = _linear(cfg.hidden_size, cfg.hidden_size, rngs, cfg)

    def _rope_partial(self, x, positions):
        rot = self.cfg.rotary_ndims
        if rot >= self.head_dim:
            return apply_rope(x, positions, self.cfg.rope_theta)
        return jnp.concatenate(
            [apply_rope(x[..., :rot], positions, self.cfg.rope_theta),
             x[..., rot:]], axis=-1)

    def __call__(self, x, attn_bias, positions, cache=None):
        b, t, _ = x.shape
        qkv = self.query_key_value(x).reshape(
            b, t, self.num_heads, 3 * self.head_dim)
        q = qkv[..., : self.head_dim]
        k = qkv[..., self.head_dim: 2 * self.head_dim]
        v = qkv[..., 2 * self.head_dim:]
        q = self._rope_partial(q, positions)
        k = self._rope_partial(k, positions)

        if cache is not None:
            k_cache, v_cache, idx = cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k, idx, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v, idx, axis=1)
            k, v = k_cache, v_cache
            new_cache = (k_cache, v_cache)
        else:
            new_cache = None

        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(self.head_dim)
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, -1)
        return self.dense(ctx), new_cache


class GPTNeoXMLP(nnx.Module):
    def __init__(self, cfg: GPTNeoXConfig, *, rngs: nnx.Rngs):
        self.hidden_act = cfg.hidden_act
        self.dense_h_to_4h = _linear(cfg.hidden_size, cfg.intermediate_size,
                                     rngs, cfg)
        self.dense_4h_to_h = _linear(cfg.intermediate_size, cfg.hidden_size,
                                     rngs, cfg)

    def __call__(self, x):
        h = self.dense_h_to_4h(x)
        h = jax.nn.gelu(h, approximate=self.hidden_act == "gelu_new")
        return self.dense_4h_to_h(h)


class GPTNeoXLayer(nnx.Module):
    def __init__(self, cfg: GPTNeoXConfig, *, rngs: nnx.Rngs):
        self.use_parallel_residual = cfg.use_parallel_residual
        self.input_layernorm = _ln(cfg, rngs)
        self.post_attention_layernorm = _ln(cfg, rngs)
        self.attention = GPTNeoXAttention(cfg, rngs=rngs)
        self.mlp = GPTNeoXMLP(cfg, rngs=rngs)

    def __call__(self, x, attn_bias, positions, cache=None, hooks=None):
        """Same hook contract as models/llama.py:177 (pyvene's GPT-NeoX
        component map, modelings_intervenable_gpt_neox.py)."""
        hooks = hooks or {}
        if "block_input" in hooks:
            x = hooks["block_input"](x)
        attn_out, new_cache = self.attention(
            self.input_layernorm(x), attn_bias, positions, cache)
        if "attention_output" in hooks:
            attn_out = hooks["attention_output"](attn_out)
        if self.use_parallel_residual:
            # x + attn(ln1(x)) + mlp(ln2(x)) -- both branches read the input
            mlp_out = self.mlp(self.post_attention_layernorm(x))
            if "mlp_output" in hooks:
                mlp_out = hooks["mlp_output"](mlp_out)
            x = x + attn_out + mlp_out
        else:
            x = x + attn_out
            mlp_out = self.mlp(self.post_attention_layernorm(x))
            if "mlp_output" in hooks:
                mlp_out = hooks["mlp_output"](mlp_out)
            x = x + mlp_out
        return x, new_cache


class GPTNeoXModel(nnx.Module):
    def __init__(self, cfg: GPTNeoXConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.embed_in = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                  dtype=cfg.compute_dtype,
                                  param_dtype=cfg.params_dtype,
                                  embedding_init=nnx.initializers.normal(stddev=0.02),
                                  rngs=rngs)
        self.layers = nnx.List([GPTNeoXLayer(cfg, rngs=rngs)
                                for _ in range(cfg.num_hidden_layers)])
        self.final_layer_norm = _ln(cfg, rngs)

    # hook-key split shared with LlamaModel._split_hooks (llama.py:209)
    @staticmethod
    def _split_hooks(layer_hooks):
        block, inner = {}, {}
        if layer_hooks:
            for key, fn in layer_hooks.items():
                if isinstance(key, tuple):
                    i, comp = key
                    if comp == "block_output":
                        block[int(i)] = fn
                    else:
                        inner.setdefault(int(i), {})[comp] = fn
                else:
                    block[int(key)] = fn
        return block, inner

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 caches=None, cache_index=None, layer_hooks=None,
                 segment_ids=None):
        block_hooks, inner_hooks = self._split_hooks(layer_hooks)
        b, t = input_ids.shape
        if positions is None:
            if segment_ids is not None:
                idx = jnp.broadcast_to(jnp.arange(t), (b, t))
                boundary = jnp.concatenate(
                    [jnp.ones((b, 1), bool),
                     segment_ids[:, 1:] != segment_ids[:, :-1]], axis=1)
                seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0), axis=1)
                positions = idx - seg_start
            else:
                positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        x = self.embed_in(input_ids)
        if caches is None:
            causal = jnp.tril(jnp.ones((t, t), dtype=bool))
            bias = jnp.where(causal[None, None], 0.0, -1e9).astype(x.dtype)
            if attention_mask is not None:
                pad = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) \
                    * jnp.asarray(-1e9, x.dtype)
                bias = bias + pad
            if segment_ids is not None:
                same = (segment_ids[:, None, :, None]
                        == segment_ids[:, None, None, :])
                bias = bias + jnp.where(same, 0.0, -1e9).astype(x.dtype)
            new_caches = None
            for i, lyr in enumerate(self.layers):
                x, _ = lyr(x, bias, positions, hooks=inner_hooks.get(i))
                if i in block_hooks:
                    x = block_hooks[i](x)
        else:
            cache_len = caches[0][0].shape[1]
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (t, cache_len), 1)
            row_pos = cache_index + jax.lax.broadcasted_iota(
                jnp.int32, (t, cache_len), 0)
            ok = (slot_ids <= row_pos)[None, None] \
                & (attention_mask[:, None, None, :] > 0)
            bias = jnp.where(ok, 0.0, -1e9).astype(x.dtype)
            new_caches = []
            for i, (lyr, (kc, vc)) in enumerate(zip(self.layers, caches)):
                x, nc = lyr(x, bias, positions, cache=(kc, vc, cache_index),
                            hooks=inner_hooks.get(i))
                if i in block_hooks:
                    x = block_hooks[i](x)
                new_caches.append(nc)
        return self.final_layer_norm(x), new_caches


class GPTNeoXForCausalLM(nnx.Module):
    """Causal LM with an untied ``embed_out`` head (HF GPTNeoXForCausalLM).
    Same call/loss surface as LlamaForCausalLM."""

    def __init__(self, cfg: GPTNeoXConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.gpt_neox = GPTNeoXModel(cfg, rngs=rngs)
        self.embed_out = _linear(cfg.hidden_size, cfg.vocab_size, rngs, cfg,
                                 use_bias=False)

    @property
    def model(self):
        return self.gpt_neox

    def logits(self, hidden: Array) -> Array:
        return self.embed_out(hidden)

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 caches=None, cache_index=None, layer_hooks=None,
                 segment_ids=None):
        hidden, new_caches = self.gpt_neox(
            input_ids, attention_mask, positions, caches, cache_index,
            layer_hooks=layer_hooks, segment_ids=segment_ids)
        out = self.logits(hidden)
        return (out, new_caches) if caches is not None else out

    def training_loss(self, input_ids, labels, attention_mask=None,
                      positions=None, layer_hooks=None, segment_ids=None,
                      weights=None, ignore_index: int = -100):
        """Forward + shifted CE (chunked when ``config.loss_chunk > 0`` --
        ops/losses.py: full logits never materialised)."""
        from sparse_matrix_fine_tuning_tpu.ops.losses import (
            model_training_loss)
        return model_training_loss(
            self, input_ids, labels, attention_mask=attention_mask,
            positions=positions, layer_hooks=layer_hooks,
            segment_ids=segment_ids, weights=weights,
            ignore_index=ignore_index)

    def loss(self, logits: Array, labels: Array, ignore_index: int = -100,
             weights: Array | None = None) -> Array:
        shift_logits = logits[:, :-1].astype(jnp.float32)
        shift_labels = labels[:, 1:]
        mask = shift_labels != ignore_index
        if weights is not None:
            mask = mask & (weights[:, None] != 0)
        safe = jnp.where(mask, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1).squeeze(-1)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
