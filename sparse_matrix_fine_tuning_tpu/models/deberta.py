"""TPU-native DeBERTa-v2/v3 (flax NNX).

Disentangled attention: content-content scores plus content-to-position and
position-to-content terms computed against shared log-bucketed relative
position embeddings (one table for the whole encoder, LayerNormed for v3).
Attribute names (``query_proj``/``key_proj``/``value_proj``) match HF so the
reference's deberta peft_config ports 1:1
(reference task_configs/deberta_glue/peft_monarch_deberta.json).

Numerics follow HF ``modeling_deberta_v2`` (verified by the parity test in
tests/models/test_hf_parity.py): all three score terms share the
1/sqrt(d * scale_factor) scale, c2p gathers at bucket(rel)+span, p2c gathers
at bucket(-rel)+span then transposes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DebertaV2Config:
    vocab_size: int = 128100
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 0
    layer_norm_eps: float = 1e-7
    pad_token_id: int = 0
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    relative_attention: bool = True
    position_buckets: int = 256
    max_relative_positions: int = -1
    pos_att_type: Sequence[str] = ("p2c", "c2p")
    share_att_key: bool = True
    norm_rel_ebd: str = "layer_norm"
    position_biased_input: bool = False
    num_labels: int = 2
    dtype: Optional[str] = None

    @property
    def compute_dtype(self):
        from sparse_matrix_fine_tuning_tpu.models.config import _resolve_dtype
        return _resolve_dtype(self.dtype)

    @property
    def pos_ebd_size(self) -> int:
        max_rel = self.max_relative_positions
        if max_rel < 1:
            max_rel = self.max_position_embeddings
        return self.position_buckets if self.position_buckets > 0 else max_rel

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=64, position_buckets=8)
        d.update(kw)
        return cls(**d)


def make_log_bucket_position(relative_pos: Array, bucket_size: int,
                             max_position: int) -> Array:
    """HF's log-bucketed relative positions (modeling_deberta_v2)."""
    sign = jnp.sign(relative_pos)
    mid = bucket_size // 2
    abs_pos = jnp.where(
        (relative_pos < mid) & (relative_pos > -mid),
        mid - 1,
        jnp.abs(relative_pos),
    )
    safe = jnp.maximum(abs_pos, 1).astype(jnp.float32)
    log_pos = jnp.ceil(
        jnp.log(safe / mid) / math.log((max_position - 1) / mid) * (mid - 1)
    ) + mid
    bucket_pos = jnp.where(abs_pos <= mid, relative_pos.astype(jnp.float32),
                           log_pos * sign)
    return bucket_pos.astype(jnp.int32)


def build_relative_position(query_size: int, key_size: int,
                            bucket_size: int = -1, max_position: int = -1) -> Array:
    q_ids = jnp.arange(query_size)
    k_ids = jnp.arange(key_size)
    rel = q_ids[:, None] - k_ids[None, :]
    if bucket_size > 0 and max_position > 0:
        rel = make_log_bucket_position(rel, bucket_size, max_position)
    return rel[None]  # (1, q, k)


def _linear(in_f, out_f, cfg, rngs, use_bias=True):
    return nnx.Linear(in_f, out_f, use_bias=use_bias, dtype=cfg.compute_dtype,
                      kernel_init=nnx.initializers.normal(stddev=0.02),
                      bias_init=nnx.initializers.zeros_init(), rngs=rngs)


class DisentangledSelfAttention(nnx.Module):
    def __init__(self, cfg: DebertaV2Config, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.num_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.query_proj = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.key_proj = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.value_proj = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.dropout = nnx.Dropout(cfg.attention_probs_dropout_prob,
                                   deterministic=True, rngs=rngs)
        self.pos_dropout = nnx.Dropout(cfg.hidden_dropout_prob,
                                       deterministic=True, rngs=rngs)
        if not cfg.share_att_key and cfg.relative_attention:
            if "c2p" in cfg.pos_att_type:
                self.pos_key_proj = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
            if "p2c" in cfg.pos_att_type:
                self.pos_query_proj = _linear(cfg.hidden_size, cfg.hidden_size,
                                              cfg, rngs, use_bias=False)

    def _split(self, x, b):
        # (b, t, h*d) -> (b, heads, t, d)
        return x.reshape(b, -1, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, x, attn_bias, rel_embeddings=None, relative_pos=None, *,
                 deterministic=None):
        cfg = self.cfg
        b, t, _ = x.shape
        q = self._split(self.query_proj(x), b)
        k = self._split(self.key_proj(x), b)
        v = self._split(self.value_proj(x), b)
        scale_factor = 1 + len(cfg.pos_att_type) if cfg.relative_attention else 1
        scale = math.sqrt(self.head_dim * scale_factor)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / scale

        if cfg.relative_attention and rel_embeddings is not None:
            scores = scores + self._disentangled_bias(
                q, k, rel_embeddings, relative_pos, scale,
                deterministic=deterministic)

        scores = scores + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        probs = self.dropout(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return ctx.transpose(0, 2, 1, 3).reshape(b, t, -1)

    def _disentangled_bias(self, q, k, rel_embeddings, relative_pos, scale, *,
                           deterministic=None):
        cfg = self.cfg
        b, h, t, d = q.shape
        att_span = cfg.pos_ebd_size
        if relative_pos is None:
            max_rel = cfg.max_relative_positions
            if max_rel < 1:
                max_rel = cfg.max_position_embeddings
            relative_pos = build_relative_position(t, t, cfg.position_buckets, max_rel)
        rel = rel_embeddings[: att_span * 2]  # (2*span, hidden)
        rel = self.pos_dropout(rel, deterministic=deterministic)
        if cfg.share_att_key:
            pos_q = self._split(self.query_proj(rel[None]), 1)  # (1, h, 2span, d)
            pos_k = self._split(self.key_proj(rel[None]), 1)
        else:
            pos_k = self._split(self.pos_key_proj(rel[None]), 1) \
                if "c2p" in cfg.pos_att_type else None
            pos_q = self._split(self.pos_query_proj(rel[None]), 1) \
                if "p2c" in cfg.pos_att_type else None

        score = 0.0
        if "c2p" in cfg.pos_att_type:
            c2p = jnp.einsum("bhqd,xhkd->bhqk", q, pos_k)  # (b, h, t, 2span)
            c2p_pos = jnp.clip(relative_pos + att_span, 0, att_span * 2 - 1)
            idx = jnp.broadcast_to(c2p_pos[:, None], (b, h, t, t))
            score = score + jnp.take_along_axis(c2p, idx, axis=-1) / scale
        if "p2c" in cfg.pos_att_type:
            p2c_pos = jnp.clip(-relative_pos + att_span, 0, att_span * 2 - 1)
            p2c = jnp.einsum("bhkd,xhqd->bhkq", k, pos_q)  # (b, h, t, 2span)
            idx = jnp.broadcast_to(p2c_pos[:, None], (b, h, t, t))
            p2c = jnp.take_along_axis(p2c, idx, axis=-1)
            score = score + p2c.transpose(0, 1, 3, 2) / scale
        return score


class DebertaSelfOutput(nnx.Module):
    def __init__(self, cfg, *, rngs):
        self.dense = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.LayerNorm = nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.compute_dtype, rngs=rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, deterministic=True, rngs=rngs)

    def __call__(self, x, residual, *, deterministic=None):
        return self.LayerNorm(self.dropout(self.dense(x), deterministic=deterministic)
                              + residual)


class DebertaLayer(nnx.Module):
    def __init__(self, cfg, *, rngs):
        self.attention_self = DisentangledSelfAttention(cfg, rngs=rngs)
        self.attention_output = DebertaSelfOutput(cfg, rngs=rngs)
        self.intermediate = _linear(cfg.hidden_size, cfg.intermediate_size, cfg, rngs)
        self.output_dense = _linear(cfg.intermediate_size, cfg.hidden_size, cfg, rngs)
        self.output_LayerNorm = nnx.LayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps, dtype=cfg.compute_dtype,
            rngs=rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, deterministic=True, rngs=rngs)

    def __call__(self, x, attn_bias, rel_embeddings, relative_pos, *,
                 deterministic=None):
        ctx = self.attention_self(x, attn_bias, rel_embeddings, relative_pos,
                                  deterministic=deterministic)
        x = self.attention_output(ctx, x, deterministic=deterministic)
        inter = jax.nn.gelu(self.intermediate(x), approximate=False)
        out = self.dropout(self.output_dense(inter), deterministic=deterministic)
        return self.output_LayerNorm(out + x)


class DebertaV2Model(nnx.Module):
    def __init__(self, cfg: DebertaV2Config, *, rngs: nnx.Rngs):
        self.config = cfg
        init = nnx.initializers.normal(stddev=0.02)
        self.word_embeddings = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                         dtype=cfg.compute_dtype,
                                         embedding_init=init, rngs=rngs)
        if cfg.position_biased_input:
            self.position_embeddings = nnx.Embed(
                cfg.max_position_embeddings, cfg.hidden_size,
                dtype=cfg.compute_dtype, embedding_init=init, rngs=rngs)
        else:
            self.position_embeddings = None
        self.emb_LayerNorm = nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                                           dtype=cfg.compute_dtype, rngs=rngs)
        self.emb_dropout = nnx.Dropout(cfg.hidden_dropout_prob,
                                       deterministic=True, rngs=rngs)
        self.layer = nnx.List([DebertaLayer(cfg, rngs=rngs)
                               for _ in range(cfg.num_hidden_layers)])
        if cfg.relative_attention:
            self.rel_embeddings = nnx.Embed(cfg.pos_ebd_size * 2, cfg.hidden_size,
                                            dtype=cfg.compute_dtype,
                                            embedding_init=init, rngs=rngs)
            if "layer_norm" in cfg.norm_rel_ebd:
                self.rel_LayerNorm = nnx.LayerNorm(
                    cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                    dtype=cfg.compute_dtype, rngs=rngs)
            else:
                self.rel_LayerNorm = None
        else:
            self.rel_embeddings = None
            self.rel_LayerNorm = None

    def get_rel_embedding(self):
        if self.rel_embeddings is None:
            return None
        rel = self.rel_embeddings.embedding[...]
        if self.rel_LayerNorm is not None:
            rel = self.rel_LayerNorm(rel)
        return rel

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, *,
                 deterministic=None, layer_hooks=None):
        cfg = self.config
        b, t = input_ids.shape
        if attention_mask is None:
            attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        x = self.word_embeddings(input_ids)
        if self.position_embeddings is not None:
            x = x + self.position_embeddings(jnp.arange(t)[None])
        x = self.emb_LayerNorm(x)
        # DeBERTa masks the embeddings too (HF: embeddings * mask)
        x = x * attention_mask[..., None].astype(x.dtype)
        x = self.emb_dropout(x, deterministic=deterministic)
        # 2D mask product: token i attends j iff both are valid
        m = attention_mask.astype(x.dtype)
        pair = m[:, None, :, None] * m[:, None, None, :]
        attn_bias = (1.0 - pair) * jnp.asarray(-1e9, x.dtype)
        max_rel = cfg.max_relative_positions
        if max_rel < 1:
            max_rel = cfg.max_position_embeddings
        relative_pos = build_relative_position(t, t, cfg.position_buckets, max_rel) \
            if cfg.relative_attention else None
        rel_embeddings = self.get_rel_embedding()
        for i, lyr in enumerate(self.layer):
            x = lyr(x, attn_bias, rel_embeddings, relative_pos,
                    deterministic=deterministic)
            if layer_hooks and i in layer_hooks:
                x = layer_hooks[i](x)
        return x


class DebertaV2ForSequenceClassification(nnx.Module):
    def __init__(self, cfg: DebertaV2Config, *, rngs: nnx.Rngs):
        self.config = cfg
        self.deberta = DebertaV2Model(cfg, rngs=rngs)
        # ContextPooler + classifier (HF names: pooler.dense, classifier)
        self.pooler = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.classifier = _linear(cfg.hidden_size, cfg.num_labels, cfg, rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, deterministic=True,
                                   rngs=rngs)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, *,
                 deterministic=None):
        hidden = self.deberta(input_ids, attention_mask, token_type_ids,
                              deterministic=deterministic)
        ctx = self.dropout(hidden[:, 0], deterministic=deterministic)
        pooled = jax.nn.gelu(self.pooler(ctx), approximate=False)
        pooled = self.dropout(pooled, deterministic=deterministic)
        return self.classifier(pooled)

    def loss(self, logits, labels, weights=None):
        if self.config.num_labels == 1:
            per_row = (logits.squeeze(-1) - labels) ** 2
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            per_row = -jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
        if weights is None:
            return jnp.mean(per_row)
        w = weights.astype(per_row.dtype)
        return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1)
