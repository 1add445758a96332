"""TPU-native GPT-Neo (flax NNX).

EleutherAI's GPT-3-style arch: learned absolute positions like GPT-2, but
separate UNBIASED q/k/v projections, NO attention-score scaling (raw QK^T,
HF GPTNeoSelfAttention computes it with softmax_scale=1.0), and layers
ALTERNATING global / local (sliding-window) causal attention per
``config.attention_layers``.  The reference vendors pyvene's per-arch
GPT-Neo support (pyreft/pyvene/pyvene/models/gpt_neo/); here the model
speaks the shared functional ``layer_hooks`` contract (models/llama.py:229)
so ReftModel, PEFT surgery, and the common decode loops work unchanged.

HF attribute names kept (``attn.attention.q_proj`` etc. flattened to
``attention.q_proj``; see hf_convert.load_gpt_neo for the exact mapping) so
checkpoints convert tensor-by-tensor and target_modules lists port.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.config import _resolve_dtype

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GPTNeoConfig:
    vocab_size: int = 50257
    hidden_size: int = 2048
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: Optional[int] = None  # n_inner; None -> 4*hidden
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    # per-layer "global" | "local"; None -> alternating starting global
    attention_layers: Optional[Tuple[str, ...]] = None
    window_size: int = 256
    bos_token_id: int = 50256
    eos_token_id: int = 50256
    pad_token_id: int = 50256
    tie_word_embeddings: bool = True
    dtype: Optional[str] = None
    param_dtype: str = "float32"
    # chunked cross-entropy (ops/losses.py); 0 = materialised loss
    loss_chunk: int = 0

    @property
    def inner(self) -> int:
        return self.intermediate_size or 4 * self.hidden_size

    @property
    def layer_types(self) -> Tuple[str, ...]:
        if self.attention_layers is not None:
            return tuple(self.attention_layers)
        return tuple("global" if i % 2 == 0 else "local"
                     for i in range(self.num_hidden_layers))

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
                 num_attention_heads=4, max_position_embeddings=128,
                 window_size=5)
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


class GPTNeoAttention(nnx.Module):
    """Separate unbiased q/k/v + biased out_proj; scores are UNSCALED raw
    dot products computed in float32 (HF GPTNeoSelfAttention)."""

    def __init__(self, cfg: GPTNeoConfig, *, rngs: nnx.Rngs):
        self.num_heads = cfg.num_attention_heads
        self.head_dim = cfg.head_width
        self.q_proj = _linear(cfg.hidden_size, cfg.hidden_size, rngs, cfg,
                              use_bias=False)
        self.k_proj = _linear(cfg.hidden_size, cfg.hidden_size, rngs, cfg,
                              use_bias=False)
        self.v_proj = _linear(cfg.hidden_size, cfg.hidden_size, rngs, cfg,
                              use_bias=False)
        self.out_proj = _linear(cfg.hidden_size, cfg.hidden_size, rngs, cfg)

    def __call__(self, x, attn_bias, cache=None):
        b, t, _ = x.shape
        q = self.q_proj(x).reshape(b, t, self.num_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, t, self.num_heads, self.head_dim)
        v = self.v_proj(x).reshape(b, t, self.num_heads, self.head_dim)
        if cache is not None:
            k_cache, v_cache, idx = cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k, idx, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v, idx, axis=1)
            k, v = k_cache, v_cache
            new_cache = (k_cache, v_cache)
        else:
            new_cache = None
        scores = jnp.einsum("bthd,bshd->bhts",
                            q.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores + attn_bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, -1)
        return self.out_proj(ctx), new_cache


class GPTNeoMLP(nnx.Module):
    def __init__(self, cfg: GPTNeoConfig, *, rngs: nnx.Rngs):
        self.c_fc = _linear(cfg.hidden_size, cfg.inner, rngs, cfg)
        self.c_proj = _linear(cfg.inner, cfg.hidden_size, rngs, cfg)

    def __call__(self, x):
        return self.c_proj(jax.nn.gelu(self.c_fc(x), approximate=True))


class GPTNeoBlock(nnx.Module):
    def __init__(self, cfg: GPTNeoConfig, *, rngs: nnx.Rngs):
        self.ln_1 = _ln(cfg, rngs)
        self.attention = GPTNeoAttention(cfg, rngs=rngs)
        self.ln_2 = _ln(cfg, rngs)
        self.mlp = GPTNeoMLP(cfg, rngs=rngs)

    def __call__(self, x, attn_bias, cache=None, hooks=None):
        hooks = hooks or {}
        if "block_input" in hooks:
            x = hooks["block_input"](x)
        attn_out, new_cache = self.attention(self.ln_1(x), attn_bias, cache)
        if "attention_output" in hooks:
            attn_out = hooks["attention_output"](attn_out)
        x = x + attn_out
        mlp_out = self.mlp(self.ln_2(x))
        if "mlp_output" in hooks:
            mlp_out = hooks["mlp_output"](mlp_out)
        x = x + mlp_out
        return x, new_cache


class GPTNeoModel(nnx.Module):
    def __init__(self, cfg: GPTNeoConfig, *, rngs: nnx.Rngs):
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
        self.h = nnx.List([GPTNeoBlock(cfg, rngs=rngs)
                           for _ in range(cfg.num_hidden_layers)])
        self.ln_f = _ln(cfg, rngs)

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

    def _local_window(self, causal_bool, t):
        """Sliding window over a (t, t)-shaped causal boolean: keep keys
        with q - k < window_size (HF builds this as
        ``bitwise_xor(bias, tril(bias, -window))``)."""
        offs = jnp.arange(t)
        return causal_bool & (
            offs[:, None] - offs[None, :] < self.config.window_size)

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
        x = self.wte(input_ids) + self.wpe(positions.astype(jnp.int32))
        types = self.config.layer_types
        if caches is None:
            causal = jnp.tril(jnp.ones((t, t), dtype=bool))
            extra = jnp.zeros((b, 1, 1, t), x.dtype)
            if attention_mask is not None:
                extra = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) \
                    * jnp.asarray(-1e9, x.dtype)
            if segment_ids is not None:
                same = (segment_ids[:, None, :, None]
                        == segment_ids[:, None, None, :])
                extra = extra + jnp.where(same, 0.0, -1e9).astype(x.dtype)
            bias_g = jnp.where(causal[None, None], 0.0, -1e9).astype(x.dtype) + extra
            bias_l = jnp.where(self._local_window(causal, t)[None, None],
                               0.0, -1e9).astype(x.dtype) + extra
            new_caches = None
            for i, blk in enumerate(self.h):
                bias = bias_l if types[i] == "local" else bias_g
                x, _ = blk(x, bias, hooks=inner_hooks.get(i))
                if i in block_hooks:
                    x = block_hooks[i](x)
        else:
            cache_len = caches[0][0].shape[1]
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (t, cache_len), 1)
            row_pos = cache_index + jax.lax.broadcasted_iota(
                jnp.int32, (t, cache_len), 0)
            causal = slot_ids <= row_pos
            valid = attention_mask[:, None, None, :] > 0
            ok_g = causal[None, None] & valid
            ok_l = (causal & (row_pos - slot_ids
                              < self.config.window_size))[None, None] & valid
            bias_g = jnp.where(ok_g, 0.0, -1e9).astype(x.dtype)
            bias_l = jnp.where(ok_l, 0.0, -1e9).astype(x.dtype)
            new_caches = []
            for i, (blk, (kc, vc)) in enumerate(zip(self.h, caches)):
                bias = bias_l if types[i] == "local" else bias_g
                x, nc = blk(x, bias, cache=(kc, vc, cache_index),
                            hooks=inner_hooks.get(i))
                if i in block_hooks:
                    x = block_hooks[i](x)
                new_caches.append(nc)
        return self.ln_f(x), new_caches


class GPTNeoForCausalLM(nnx.Module):
    """Causal LM; lm_head tied to wte (HF default tie_word_embeddings)."""

    def __init__(self, cfg: GPTNeoConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.transformer = GPTNeoModel(cfg, rngs=rngs)
        if cfg.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = _linear(cfg.hidden_size, cfg.vocab_size, rngs,
                                   cfg, use_bias=False)

    @property
    def model(self):
        return self.transformer

    def logits(self, hidden: Array) -> Array:
        if self.lm_head is None:
            emb = self.transformer.wte.embedding[...]
            return hidden @ emb.T.astype(hidden.dtype)
        return self.lm_head(hidden)

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
