"""TPU-native Backpack-GPT-2 (flax NNX).

The Backpack LM (Hewitt et al. 2023) factors each output hidden state as a
causal-attention-weighted sum over ``num_senses`` per-token "sense vectors":
a stock GPT-2 contextualization network produces per-sense causal weights
``(b, nv, s, s)`` while a small non-mixing network maps each token embedding
alone to its ``nv`` sense vectors ``(b, nv, s, d)``; the model output is
``sum_nv(weights @ senses)``.  The reference vendors it as one of pyvene's
per-arch aux models (pyreft/pyvene/pyvene/models/backpack_gpt2/
modelings_backpack_gpt2.py:59-270) with a single intervention anchor,
``sense_network_output`` (modelings_intervenable_backpack_gpt2.py:14-16) --
the architecture's whole point is that editing sense vectors edits the
word's meaning everywhere it attends.

This implementation reuses this repo's GPT2Model as the contextualization
network (which is why ``GPT2Config.scale_attn_by_inverse_layer_idx`` exists:
Backpack checkpoints train with it on) and exposes the same functional hook
contract as the other families: ``layer_hooks={"sense_network_output": fn}``
applies ``fn`` to the ``(b, nv, s, d)`` sense tensor, and
``run_with_custom_contextualization`` mirrors the reference's API for
contextualization-swap experiments.  Dropout probabilities are zero
(parity tests run the reference in eval mode; none of the aux-model flows
train with dropout).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.gpt2 import (
    GPT2Config,
    GPT2LMHeadModel,
    GPT2Model,
    _linear,
    _ln,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BackpackGPT2Config(GPT2Config):
    """GPT2Config + the two Backpack knobs (reference
    modelings_backpack_gpt2.py:17-56).  The reference's defaults flip
    ``scale_attn_by_inverse_layer_idx`` on; tiny() mirrors GPT2Config.tiny."""
    num_senses: int = 16
    sense_intermediate_scale: int = 4
    scale_attn_by_inverse_layer_idx: bool = True

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, max_position_embeddings=128,
                 num_senses=4)
        d.update(kw)
        return cls(**d)


class BackpackMLP(nnx.Module):
    """c_fc -> tanh-GELU -> c_proj with free in/inter/out widths
    (reference BackpackMLP, modelings_backpack_gpt2.py:78-95)."""

    def __init__(self, embed_dim: int, intermediate_dim: int, out_dim: int,
                 cfg: BackpackGPT2Config, *, rngs: nnx.Rngs):
        self.c_fc = _linear(embed_dim, intermediate_dim, rngs, cfg)
        self.c_proj = _linear(intermediate_dim, out_dim, rngs, cfg)

    def __call__(self, x: Array) -> Array:
        return self.c_proj(jax.nn.gelu(self.c_fc(x), approximate=True))


class BackpackNoMixBlock(nnx.Module):
    """Per-token (no attention) residual MLP block
    (reference BackpackNoMixBlock, modelings_backpack_gpt2.py:98-115)."""

    def __init__(self, cfg: BackpackGPT2Config, *, rngs: nnx.Rngs):
        self.ln_1 = _ln(cfg, rngs)
        self.ln_2 = _ln(cfg, rngs)
        self.mlp = BackpackMLP(cfg.hidden_size, 4 * cfg.hidden_size,
                               cfg.hidden_size, cfg, rngs=rngs)

    def __call__(self, hidden: Array, residual: Array) -> Array:
        residual = hidden + residual
        hidden = self.ln_1(residual)
        residual = self.mlp(hidden) + residual
        return self.ln_2(residual)


class BackpackSenseNetwork(nnx.Module):
    """Token embedding -> ``num_senses`` sense vectors, no token mixing
    (reference BackpackSenseNetwork, modelings_backpack_gpt2.py:118-136)."""

    def __init__(self, cfg: BackpackGPT2Config, *, rngs: nnx.Rngs):
        self.num_senses = cfg.num_senses
        self.n_embd = cfg.hidden_size
        self.block = BackpackNoMixBlock(cfg, rngs=rngs)
        self.ln = _ln(cfg, rngs)
        self.final_mlp = BackpackMLP(
            cfg.hidden_size, cfg.sense_intermediate_scale * cfg.hidden_size,
            cfg.hidden_size * cfg.num_senses, cfg, rngs=rngs)

    def __call__(self, input_embeds: Array) -> Array:
        residual = input_embeds
        hidden = self.ln(residual)
        hidden = self.block(hidden, residual)
        senses = self.final_mlp(hidden)
        b, s, _ = senses.shape
        # (b, s, nv*d) -> (b, nv, s, d)
        return senses.reshape(b, s, self.num_senses, self.n_embd) \
                     .transpose(0, 2, 1, 3)


class BackpackWeightNetwork(nnx.Module):
    """Contextualization weights: per-sense single-head causal attention
    probabilities over the GPT-2 hidden states (reference
    BackpackWeightNetwork, modelings_backpack_gpt2.py:139-162)."""

    def __init__(self, cfg: BackpackGPT2Config, *, rngs: nnx.Rngs):
        self.num_senses = cfg.num_senses
        self.embed_per_sense = cfg.hidden_size // cfg.num_senses
        self.c_attn = _linear(
            cfg.hidden_size, 2 * cfg.num_senses * self.embed_per_sense,
            rngs, cfg)

    def __call__(self, encoded: Array,
                 attention_mask: Array | None = None) -> Array:
        b, s, _ = encoded.shape
        qk = self.c_attn(encoded).reshape(
            b, s, 2, self.num_senses, self.embed_per_sense)
        q, k = qk[:, :, 0], qk[:, :, 1]
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.embed_per_sense, q.dtype))
        scores = jnp.einsum("bthd,bshd->bhts", q, k * scale)
        # the reference masks with an additive -10000 triu, not -inf
        causal = jnp.triu(jnp.full((s, s), -10000.0, scores.dtype), 1)
        bias = causal[None, None]
        if attention_mask is not None:
            # pad keys get the same additive -10000 as future positions (the
            # reference forward takes no mask; this extends it so padded
            # batches don't attend to pad tokens)
            pad = (1.0 - attention_mask.astype(scores.dtype)) * -10000.0
            bias = bias + pad[:, None, None, :]
        return jax.nn.softmax(scores + bias, axis=-1)


class BackpackGPT2Model(nnx.Module):
    """hidden = sum over senses of contextualization @ senses
    (reference BackpackGPT2Model.forward, modelings_backpack_gpt2.py:198-215).

    Returns ``(hidden_states, contextualization)``."""

    def __init__(self, cfg: BackpackGPT2Config, *, rngs: nnx.Rngs):
        self.config = cfg
        self.gpt2_model = GPT2Model(cfg, rngs=rngs)
        self.sense_network = BackpackSenseNetwork(cfg, rngs=rngs)
        self.sense_weight_net = BackpackWeightNetwork(cfg, rngs=rngs)

    @property
    def wte(self):
        # word embeddings are shared with the contextualization GPT-2
        return self.gpt2_model.wte

    def senses(self, input_ids: Array, layer_hooks=None) -> Array:
        """(b, nv, s, d) sense vectors, with the ``sense_network_output``
        hook applied -- pyvene's one Backpack anchor point
        (modelings_intervenable_backpack_gpt2.py:14-16)."""
        senses = self.sense_network(self.wte(input_ids))
        if layer_hooks and "sense_network_output" in layer_hooks:
            senses = layer_hooks["sense_network_output"](senses)
        return senses

    def __call__(self, input_ids: Array, attention_mask: Array | None = None,
                 positions: Array | None = None, layer_hooks=None,
                 segment_ids=None):
        if segment_ids is not None:
            raise NotImplementedError(
                "BackpackGPT2Model does not support packed segments: the "
                "sense-weight network attends across the whole sequence")
        senses = self.senses(input_ids, layer_hooks)
        gpt2_hooks = dict(layer_hooks or {})
        gpt2_hooks.pop("sense_network_output", None)
        contextl, _ = self.gpt2_model(input_ids, attention_mask,
                                      positions=positions,
                                      layer_hooks=gpt2_hooks or None)
        contextualization = self.sense_weight_net(contextl, attention_mask)
        hidden = jnp.einsum("bhts,bhsd->bthd", contextualization,
                            senses).sum(axis=2)
        return hidden, contextualization

    def run_with_custom_contextualization(self, input_ids: Array,
                                          contextualization: Array,
                                          layer_hooks=None):
        senses = self.senses(input_ids, layer_hooks)
        hidden = jnp.einsum("bhts,bhsd->bthd", contextualization,
                            senses).sum(axis=2)
        return hidden, contextualization


class BackpackGPT2LMHeadModel(nnx.Module):
    """LM head tied to wte (reference BackpackGPT2LMHeadModel,
    modelings_backpack_gpt2.py:236-270).  ``__call__`` returns logits (the
    shared harness contract); ``forward_with_contextualization`` returns
    ``(logits, contextualization)`` like the reference's ModelOutput."""

    def __init__(self, cfg: BackpackGPT2Config, *, rngs: nnx.Rngs):
        self.config = cfg
        self.backpack = BackpackGPT2Model(cfg, rngs=rngs)

    @property
    def model(self):
        return self.backpack

    def logits(self, hidden: Array) -> Array:
        emb = self.backpack.wte.embedding[...]
        return hidden @ emb.T.astype(hidden.dtype)

    def forward_with_contextualization(self, input_ids, attention_mask=None,
                                       positions=None, layer_hooks=None):
        hidden, ctx = self.backpack(input_ids, attention_mask,
                                    positions=positions,
                                    layer_hooks=layer_hooks)
        return self.logits(hidden), ctx

    def __call__(self, input_ids, attention_mask=None, positions=None,
                 layer_hooks=None, segment_ids=None):
        # explicit signature: unsupported kwargs fail loudly (the reference
        # model raises TypeError on unexpected args too)
        if segment_ids is not None:
            raise NotImplementedError(
                "BackpackGPT2LMHeadModel does not support packed segments")
        return self.forward_with_contextualization(
            input_ids, attention_mask=attention_mask, positions=positions,
            layer_hooks=layer_hooks)[0]

    def run_with_custom_contextualization(self, input_ids, contextualization,
                                          layer_hooks=None):
        hidden, ctx = self.backpack.run_with_custom_contextualization(
            input_ids, contextualization, layer_hooks=layer_hooks)
        return self.logits(hidden), ctx

    # shifted-CE loss shared with the GPT-2 head (the method is self-free)
    loss = GPT2LMHeadModel.loss

    def training_loss(self, input_ids, labels, attention_mask=None,
                      positions=None, layer_hooks=None, segment_ids=None,
                      weights=None, ignore_index: int = -100):
        """Forward + shifted CE via the shared causal-LM body
        (ops/losses.model_training_loss): chunked when
        ``config.loss_chunk > 0`` and the Trainer's pad-row ``weights``
        mask is honored (padded batches drop pad rows from the loss)."""
        from sparse_matrix_fine_tuning_tpu.ops.losses import (
            model_training_loss)
        return model_training_loss(
            self, input_ids, labels, attention_mask=attention_mask,
            positions=positions, layer_hooks=layer_hooks,
            segment_ids=segment_ids, weights=weights,
            ignore_index=ignore_index)
