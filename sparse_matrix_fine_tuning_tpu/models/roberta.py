"""TPU-native RoBERTa (flax NNX).

A from-scratch encoder implementation with the HF module topology and
attribute names (``query``/``key``/``value``/``dense`` etc.) so the
reference's ``target_modules`` configs and module-surgery semantics port
1:1 (reference: src/models/modeling_roberta.py, train_utils.py:416-466).
All matmuls run through nnx.Linear (bf16-friendly, MXU-shaped); attention
uses a single fused softmax(QK^T)V with an additive mask.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.config import RobertaConfig

Array = jax.Array


def create_position_ids(input_ids: Array, padding_idx: int) -> Array:
    """RoBERTa's position ids: consecutive positions for non-pad tokens,
    offset past padding_idx; pad tokens get padding_idx."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=-1) * mask + padding_idx


def _linear(in_f, out_f, cfg, rngs):
    # HF BERT/RoBERTa init: truncated-normal std 0.02 is close enough to
    # normal for parity; biases zero.
    return nnx.Linear(
        in_f, out_f,
        dtype=cfg.compute_dtype,
        kernel_init=nnx.initializers.normal(stddev=0.02),
        bias_init=nnx.initializers.zeros_init(),
        rngs=rngs,
    )


class RobertaEmbeddings(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        init = nnx.initializers.normal(stddev=0.02)
        self.word_embeddings = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                         dtype=cfg.compute_dtype,
                                         embedding_init=init, rngs=rngs)
        self.position_embeddings = nnx.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                                             dtype=cfg.compute_dtype,
                                             embedding_init=init, rngs=rngs)
        self.token_type_embeddings = nnx.Embed(cfg.type_vocab_size, cfg.hidden_size,
                                               dtype=cfg.compute_dtype,
                                               embedding_init=init, rngs=rngs)
        self.LayerNorm = nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                                     dtype=cfg.compute_dtype, rngs=rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, deterministic=True, rngs=rngs)
        self.padding_idx = cfg.pad_token_id

    def __call__(self, input_ids, token_type_ids=None, *, deterministic=None):
        pos_ids = create_position_ids(input_ids, self.padding_idx)
        x = self.word_embeddings(input_ids) + self.position_embeddings(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + self.token_type_embeddings(token_type_ids)
        x = self.LayerNorm(x)
        return self.dropout(x, deterministic=deterministic)


class RobertaSelfAttention(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.num_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.query = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.key = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.value = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.dropout = nnx.Dropout(cfg.attention_probs_dropout_prob, deterministic=True, rngs=rngs)

    def __call__(self, x, attn_bias, *, deterministic=None):
        b, t, h = x.shape
        def split(z):
            return z.reshape(b, t, self.num_heads, self.head_dim)
        q, k, v = split(self.query(x)), split(self.key(x)), split(self.value(x))
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(self.head_dim)
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        probs = self.dropout(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhts,bshd->bthd", probs, v)
        return ctx.reshape(b, t, h)


class RobertaSelfOutput(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.dense = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.LayerNorm = nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                                     dtype=cfg.compute_dtype, rngs=rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, deterministic=True, rngs=rngs)

    def __call__(self, x, residual, *, deterministic=None):
        x = self.dropout(self.dense(x), deterministic=deterministic)
        return self.LayerNorm(x + residual)


class RobertaAttention(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.self = RobertaSelfAttention(cfg, rngs=rngs)
        self.output = RobertaSelfOutput(cfg, rngs=rngs)

    def __call__(self, x, attn_bias, *, deterministic=None):
        ctx = self.self(x, attn_bias, deterministic=deterministic)
        return self.output(ctx, x, deterministic=deterministic)


class RobertaIntermediate(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.dense = _linear(cfg.hidden_size, cfg.intermediate_size, cfg, rngs)

    def __call__(self, x):
        return jax.nn.gelu(self.dense(x), approximate=False)


class RobertaOutput(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.dense = _linear(cfg.intermediate_size, cfg.hidden_size, cfg, rngs)
        self.LayerNorm = nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                                     dtype=cfg.compute_dtype, rngs=rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, deterministic=True, rngs=rngs)

    def __call__(self, x, residual, *, deterministic=None):
        x = self.dropout(self.dense(x), deterministic=deterministic)
        return self.LayerNorm(x + residual)


class RobertaLayer(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.attention = RobertaAttention(cfg, rngs=rngs)
        self.intermediate = RobertaIntermediate(cfg, rngs=rngs)
        self.output = RobertaOutput(cfg, rngs=rngs)

    def __call__(self, x, attn_bias, *, deterministic=None):
        x = self.attention(x, attn_bias, deterministic=deterministic)
        return self.output(self.intermediate(x), x, deterministic=deterministic)


class RobertaModel(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.embeddings = RobertaEmbeddings(cfg, rngs=rngs)
        self.layer = nnx.List([RobertaLayer(cfg, rngs=rngs) for _ in range(cfg.num_hidden_layers)])

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, *,
                 deterministic=None, layer_hooks=None):
        """layer_hooks: optional {layer_idx_or_(layer, "block_output"/
        "block_input"): fn(hidden) -> hidden} activation-intervention hook
        points (pyvene component addressing; same convention as
        models/llama.py) -- enables the MoReFT GLUE flow (reference
        moreft_glue.sh intervenes on RoBERTa block outputs)."""
        if attention_mask is None:
            attention_mask = (input_ids != self.config.pad_token_id).astype(jnp.int32)
        x = self.embeddings(input_ids, token_type_ids, deterministic=deterministic)
        # additive mask (b, 1, 1, t)
        bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * jnp.asarray(
            -1e9, dtype=x.dtype)
        pre, post = {}, {}
        for key, fn in (layer_hooks or {}).items():
            if isinstance(key, tuple):
                i, comp = key
                assert comp in ("block_output", "block_input"), (
                    f"unsupported RoBERTa hook component {comp!r}")
                (post if comp == "block_output" else pre)[int(i)] = fn
            else:
                post[int(key)] = fn
        for i, lyr in enumerate(self.layer):
            if i in pre:
                x = pre[i](x)
            x = lyr(x, bias, deterministic=deterministic)
            if i in post:
                x = post[i](x)
        return x


class RobertaClassificationHead(nnx.Module):
    """HF RoBERTa head: <s> token -> dense -> tanh -> out_proj."""

    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.dense = _linear(cfg.hidden_size, cfg.hidden_size, cfg, rngs)
        self.out_proj = _linear(cfg.hidden_size, cfg.num_labels, cfg, rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, deterministic=True, rngs=rngs)

    def __call__(self, hidden, *, deterministic=None):
        x = hidden[:, 0]
        x = self.dropout(x, deterministic=deterministic)
        x = jnp.tanh(self.dense(x))
        x = self.dropout(x, deterministic=deterministic)
        return self.out_proj(x)


class RobertaForSequenceClassification(nnx.Module):
    def __init__(self, cfg: RobertaConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.roberta = RobertaModel(cfg, rngs=rngs)
        self.classifier = RobertaClassificationHead(cfg, rngs=rngs)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, *,
                 deterministic=None, layer_hooks=None):
        hidden = self.roberta(input_ids, attention_mask, token_type_ids,
                              deterministic=deterministic,
                              layer_hooks=layer_hooks)
        return self.classifier(hidden, deterministic=deterministic)

    def loss(self, logits: Array, labels: Array, weights: Array | None = None) -> Array:
        """Classification (CE) or regression (MSE, num_labels==1) loss.

        weights: optional (B,) 0/1 per-row mask -- padded ragged-tail rows
        must not contribute (mirrors HF Trainer's exact-length eval loop).
        """
        if self.config.num_labels == 1:
            per_row = (logits.squeeze(-1) - labels) ** 2
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            per_row = -jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
        if weights is None:
            return jnp.mean(per_row)
        w = weights.astype(per_row.dtype)
        return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1)
