"""TPU-native GPT-2 (flax NNX).

Decoder-only transformer with learned absolute position embeddings,
pre-LayerNorm (biased) blocks, fused qkv projection and a plain (non-gated)
tanh-GELU MLP — the architecture generation before the Llama family.  The
reference vendors pyvene's per-arch GPT-2 support (its most-exercised test
model: pyreft/pyvene/pyvene/models/gpt2/modelings_intervenable_gpt2.py plus
the gpt_neo/gpt_neox variants); here the model speaks the same functional
``layer_hooks`` contract as models/llama.py, so ``ReftModel``, the PEFT
surgery pass, and the ``generate``/``beam_generate`` decode loops all work
unchanged.

HF attribute names (``c_attn``/``c_proj``/``c_fc``, ``wte``/``wpe``,
``ln_1``/``ln_2``/``ln_f``) are kept so HF checkpoints convert tensor-by-
tensor (models/hf_convert.py:load_gpt2) and ``target_modules`` lists
written for HF GPT-2 port 1:1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.config import _resolve_dtype

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    """GPT-2 family config (HF field names where they exist; ``n_embd`` etc.
    are mapped in hf_convert.gpt2_config_from_hf)."""
    vocab_size: int = 50257
    hidden_size: int = 768            # n_embd
    num_hidden_layers: int = 12       # n_layer
    num_attention_heads: int = 12     # n_head
    intermediate_size: Optional[int] = None  # n_inner; None -> 4*hidden
    max_position_embeddings: int = 1024      # n_positions
    layer_norm_eps: float = 1e-5
    bos_token_id: int = 50256
    eos_token_id: int = 50256
    pad_token_id: int = 50256
    # GPT2LMHeadModel always ties lm_head to wte
    tie_word_embeddings: bool = True
    dtype: Optional[str] = None       # compute dtype; params stay f32
    param_dtype: str = "float32"
    # chunked cross-entropy (ops/losses.py); 0 = materialised loss
    loss_chunk: int = 0
    # HF GPT2Config.scale_attn_by_inverse_layer_idx: additionally divide
    # attention scores by (layer_idx + 1).  Off for stock GPT-2; the
    # Backpack-GPT-2 checkpoints train with it on (reference
    # modelings_backpack_gpt2.py:45).
    scale_attn_by_inverse_layer_idx: bool = False

    @property
    def inner(self) -> int:
        return self.intermediate_size or 4 * self.hidden_size

    # cache-shape properties shared with LlamaConfig so
    # models/llama.init_caches + generate.py work unchanged
    @property
    def kv_heads(self) -> int:
        return self.num_attention_heads

    @property
    def head_width(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def compute_dtype(self):
        return _resolve_dtype(self.dtype)

    @property
    def params_dtype(self):
        return _resolve_dtype(self.param_dtype) or jnp.float32

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, max_position_embeddings=128)
        d.update(kw)
        return cls(**d)

    @classmethod
    def gpt2(cls, **kw):
        return cls(**kw)

    @classmethod
    def gpt2_medium(cls, **kw):
        d = dict(hidden_size=1024, num_hidden_layers=24,
                 num_attention_heads=16)
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


class GPT2Attention(nnx.Module):
    """Fused-qkv multi-head attention with optional KV cache (HF
    GPT2Attention semantics: biased c_attn/c_proj, 1/sqrt(head_dim)
    scaling)."""

    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs, layer_idx: int = 0):
        self.cfg = cfg
        self.num_heads = cfg.num_attention_heads
        self.head_dim = cfg.head_width
        self.score_scale = 1.0 / math.sqrt(cfg.head_width)
        if cfg.scale_attn_by_inverse_layer_idx:
            self.score_scale /= float(layer_idx + 1)
        self.c_attn = _linear(cfg.hidden_size, 3 * cfg.hidden_size, rngs, cfg)
        self.c_proj = _linear(cfg.hidden_size, cfg.hidden_size, rngs, cfg)

    def __call__(self, x, attn_bias, cache=None):
        b, t, _ = x.shape
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.num_heads, self.head_dim)
        k = k.reshape(b, t, self.num_heads, self.head_dim)
        v = v.reshape(b, t, self.num_heads, self.head_dim)

        if cache is not None:
            k_cache, v_cache, idx = cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k, idx, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v, idx, axis=1)
            k, v = k_cache, v_cache
            new_cache = (k_cache, v_cache)
        else:
            new_cache = None

        scores = jnp.einsum("bthd,bshd->bhts", q, k) * self.score_scale
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, -1)
        return self.c_proj(ctx), new_cache


class GPT2MLP(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.c_fc = _linear(cfg.hidden_size, cfg.inner, rngs, cfg)
        self.c_proj = _linear(cfg.inner, cfg.hidden_size, rngs, cfg)

    def __call__(self, x):
        # HF "gelu_new" = tanh-approximate GELU; jax.nn.gelu(approximate=True)
        # is the same 0.044715 x^3 tanh formula
        return self.c_proj(jax.nn.gelu(self.c_fc(x), approximate=True))


class GPT2Block(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs, layer_idx: int = 0):
        self.ln_1 = _ln(cfg, rngs)
        self.attn = GPT2Attention(cfg, rngs=rngs, layer_idx=layer_idx)
        self.ln_2 = _ln(cfg, rngs)
        self.mlp = GPT2MLP(cfg, rngs=rngs)

    def __call__(self, x, attn_bias, cache=None, hooks=None):
        """hooks: {component: fn}, component in {"block_input",
        "attention_output", "mlp_output"}; "block_output" is applied by the
        caller (same contract as models/llama.py:177, mirroring pyvene's
        GPT-2 component map modelings_intervenable_gpt2.py)."""
        hooks = hooks or {}
        if "block_input" in hooks:
            x = hooks["block_input"](x)
        attn_out, new_cache = self.attn(self.ln_1(x), attn_bias, cache)
        if "attention_output" in hooks:
            attn_out = hooks["attention_output"](attn_out)
        x = x + attn_out
        mlp_out = self.mlp(self.ln_2(x))
        if "mlp_output" in hooks:
            mlp_out = hooks["mlp_output"](mlp_out)
        x = x + mlp_out
        return x, new_cache


class GPT2Model(nnx.Module):
    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.config = cfg
        self.wte = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                             dtype=cfg.compute_dtype,
                             param_dtype=cfg.params_dtype,
                             embedding_init=nnx.initializers.normal(stddev=0.02),
                             rngs=rngs)
        self.wpe = nnx.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                             dtype=cfg.compute_dtype,
                             param_dtype=cfg.params_dtype,
                             embedding_init=nnx.initializers.normal(stddev=0.01),
                             rngs=rngs)
        self.h = nnx.List([GPT2Block(cfg, rngs=rngs, layer_idx=i)
                           for i in range(cfg.num_hidden_layers)])
        self.ln_f = _ln(cfg, rngs)

    # same hook-key split as LlamaModel._split_hooks (models/llama.py:209)
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
        # positions may arrive as floats (generate derives them from the
        # attention mask; RoPE models cast internally, wpe needs ints)
        x = self.wte(input_ids) + self.wpe(positions.astype(jnp.int32))
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
            for i, blk in enumerate(self.h):
                x, _ = blk(x, bias, hooks=inner_hooks.get(i))
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
            for i, (blk, (kc, vc)) in enumerate(zip(self.h, caches)):
                x, nc = blk(x, bias, cache=(kc, vc, cache_index),
                            hooks=inner_hooks.get(i))
                if i in block_hooks:
                    x = block_hooks[i](x)
                new_caches.append(nc)
        return self.ln_f(x), new_caches


class GPT2LMHeadModel(nnx.Module):
    """Causal LM with the lm_head tied to ``wte`` (HF GPT2LMHeadModel).
    Same call/loss surface as LlamaForCausalLM so the trainer, decode
    loops, surgery, and ReftModel compose without adapters."""

    def __init__(self, cfg: GPT2Config, *, rngs: nnx.Rngs):
        self.config = cfg
        self.transformer = GPT2Model(cfg, rngs=rngs)

    # ReftModel/generate reach the embedding via .model on Llama; keep both
    @property
    def model(self):
        return self.transformer

    def logits(self, hidden: Array) -> Array:
        emb = self.transformer.wte.embedding[...]
        return hidden @ emb.T.astype(hidden.dtype)

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 caches=None, cache_index=None, layer_hooks=None,
                 segment_ids=None):
        hidden, new_caches = self.transformer(
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
