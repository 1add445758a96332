"""TPU-native Llama (flax NNX).

Decoder-only transformer with RMSNorm, rotary embeddings, GQA and SwiGLU,
with HF attribute names (``q_proj``/``k_proj``/``v_proj``/``o_proj``,
``gate_proj``/``up_proj``/``down_proj``) so the reference's target_modules
configs port 1:1 (reference task_configs/llama/peft_config.json).

The attention supports an optional KV cache for autoregressive decode
(functional: the caller threads cache arrays + position, see generate.py);
training path uses a causal mask and one fused softmax(QK^T)V.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models.config import LlamaConfig
from sparse_matrix_fine_tuning_tpu.ops.activations import geglu, swiglu
from sparse_matrix_fine_tuning_tpu.parallel.annotate import shard_tokens

Array = jax.Array


class UnitOffsetRMSNorm(nnx.Module):
    """Gemma-style RMSNorm: ``out = normalize(x) * (1 + w)``, computed in
    float32 end-to-end (HF GemmaRMSNorm semantics); the stored ``scale`` is
    the checkpoint's offset weight, zero-initialized."""

    def __init__(self, dim: int, *, epsilon: float, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs | None = None):
        self.epsilon = epsilon
        self.dtype = dtype
        self.scale = nnx.Param(jnp.zeros((dim,), param_dtype))

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + self.epsilon)
        out = out * (1.0 + self.scale[...].astype(jnp.float32))
        return out.astype(self.dtype or x.dtype)


def _make_norm(cfg: LlamaConfig, *, rngs: nnx.Rngs):
    if cfg.rmsnorm_unit_offset:
        return UnitOffsetRMSNorm(cfg.hidden_size, epsilon=cfg.rms_norm_eps,
                                 dtype=cfg.compute_dtype,
                                 param_dtype=cfg.params_dtype, rngs=rngs)
    return nnx.RMSNorm(cfg.hidden_size, epsilon=cfg.rms_norm_eps,
                       dtype=cfg.compute_dtype,
                       param_dtype=cfg.params_dtype, rngs=rngs)


def _splash_attention(q: Array, k: Array, v: Array) -> Array:
    """Causal splash attention (Pallas TPU kernel): the flash-attention
    equivalent for right-padded causal-LM training.  Pad queries produce
    garbage that the loss masks; pad keys sit after every valid query under
    the causal mask, so pure-causal is exact for right-padded batches.

    q/k/v: (b, t, heads, head_dim) -> (b, t, heads, head_dim)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    mask = sm.MultiHeadMask([sm.CausalMask((t, t)) for _ in range(h)])
    kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1)
    qh = q.transpose(0, 2, 1, 3) * scale  # (b, h, t, d)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    out = jax.vmap(kernel)(qh, kh, vh)  # (b, h, t, d)
    return out.transpose(0, 2, 1, 3)


def _linear(in_f, out_f, rngs, use_bias=False, dtype=None, param_dtype=None):
    return nnx.Linear(
        in_f, out_f, use_bias=use_bias, dtype=dtype,
        param_dtype=param_dtype or jnp.float32,
        kernel_init=nnx.initializers.normal(stddev=0.02),
        rngs=rngs,
    )


def rope_freqs(head_dim: int, theta: float) -> Array:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def apply_rope(x: Array, positions: Array, theta: float) -> Array:
    """x: (b, t, heads, head_dim); positions: (b, t) int."""
    hd = x.shape[-1]
    freqs = rope_freqs(hd, theta)  # (hd/2,)
    angles = positions[..., None].astype(jnp.float32) * freqs  # (b, t, hd/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class LlamaAttention(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.num_heads = cfg.num_attention_heads
        self.num_kv = cfg.kv_heads
        self.head_dim = cfg.head_width
        qkv_bias = cfg.attention_qkv_bias
        self.q_proj = _linear(cfg.hidden_size, self.num_heads * self.head_dim, rngs, use_bias=qkv_bias, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        self.k_proj = _linear(cfg.hidden_size, self.num_kv * self.head_dim, rngs, use_bias=qkv_bias, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        self.v_proj = _linear(cfg.hidden_size, self.num_kv * self.head_dim, rngs, use_bias=qkv_bias, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        self.o_proj = _linear(self.num_heads * self.head_dim, cfg.hidden_size, rngs, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)

    def __call__(self, x, attn_bias, positions, cache=None):
        b, t, _ = x.shape
        q = self.q_proj(x).reshape(b, t, self.num_heads, self.head_dim)
        k = self.k_proj(x).reshape(b, t, self.num_kv, self.head_dim)
        v = self.v_proj(x).reshape(b, t, self.num_kv, self.head_dim)
        q = apply_rope(q, positions, self.cfg.rope_theta)
        k = apply_rope(k, positions, self.cfg.rope_theta)

        if cache is not None:
            # decode: write this step's k/v at `cache_index` and attend over
            # the whole cache (attn_bias must mask future/unfilled slots)
            k_cache, v_cache, idx = cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k, idx, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v, idx, axis=1)
            k, v = k_cache, v_cache
            new_cache = (k_cache, v_cache)
        else:
            new_cache = None

        groups = self.num_heads // self.num_kv
        kr = jnp.repeat(k, groups, axis=2) if groups > 1 else k
        vr = jnp.repeat(v, groups, axis=2) if groups > 1 else v
        impl = self.cfg.attention_impl
        if cache is None and impl == "splash":
            ctx = _splash_attention(q, kr, vr)
        elif cache is None and impl == "dpa":
            # XLA's fused attention path; bias carries causal+padding
            ctx = jax.nn.dot_product_attention(
                q, kr, vr, bias=attn_bias.astype(q.dtype),
                scale=1.0 / math.sqrt(self.head_dim))
        else:
            scores = jnp.einsum("bthd,bshd->bhts", q, kr) / math.sqrt(self.head_dim)
            scores = scores + attn_bias
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bhts,bshd->bthd", probs, vr)
        ctx = ctx.reshape(b, t, -1)
        return self.o_proj(ctx), new_cache


class LlamaMLP(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        if cfg.mlp_activation not in ("silu", "gelu_tanh"):
            raise ValueError(f"unknown mlp_activation {cfg.mlp_activation!r}"
                             " (silu | gelu_tanh)")
        self.mlp_activation = cfg.mlp_activation
        self.gate_proj = _linear(cfg.hidden_size, cfg.intermediate_size, rngs, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        self.up_proj = _linear(cfg.hidden_size, cfg.intermediate_size, rngs, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)
        self.down_proj = _linear(cfg.intermediate_size, cfg.hidden_size, rngs, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)

    def __call__(self, x):
        act = swiglu if self.mlp_activation == "silu" else geglu
        return self.down_proj(act(self.gate_proj(x), self.up_proj(x)))


class LlamaDecoderLayer(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        self.self_attn = LlamaAttention(cfg, rngs=rngs)
        self.mlp = LlamaMLP(cfg, rngs=rngs)
        self.input_layernorm = _make_norm(cfg, rngs=rngs)
        self.post_attention_layernorm = _make_norm(cfg, rngs=rngs)

    def __call__(self, x, attn_bias, positions, cache=None, hooks=None):
        """hooks: optional {component: fn} for this layer, component in
        {"block_input", "attention_output", "mlp_output"} -- the non-block
        intervention points of pyvene's component map (reference
        modelings_intervenable_llama.py:15-31); "block_output" is applied
        by the caller."""
        hooks = hooks or {}
        if "block_input" in hooks:
            x = hooks["block_input"](x)
        attn_out, new_cache = self.self_attn(
            self.input_layernorm(x), attn_bias, positions, cache)
        if "attention_output" in hooks:
            attn_out = hooks["attention_output"](attn_out)
        x = x + attn_out
        mlp_out = self.mlp(self.post_attention_layernorm(x))
        if "mlp_output" in hooks:
            mlp_out = hooks["mlp_output"](mlp_out)
        x = x + mlp_out
        return x, new_cache


class LlamaModel(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.embed_tokens = nnx.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.compute_dtype,
            param_dtype=cfg.params_dtype,
            embedding_init=nnx.initializers.normal(stddev=0.02), rngs=rngs)
        self.layers = nnx.List([LlamaDecoderLayer(cfg, rngs=rngs)
                                for _ in range(cfg.num_hidden_layers)])
        self.norm = _make_norm(cfg, rngs=rngs)

    @staticmethod
    def _split_hooks(layer_hooks):
        """Hook keys: plain int = block_output (back-compat), or
        (layer, component) with component in {"block_output", "block_input",
        "attention_output", "mlp_output"} -- pyvene's component addressing
        (reference modelings_intervenable_llama.py:15-31)."""
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

    def __call__(self, input_ids, attention_mask=None, positions=None, caches=None,
                 cache_index=None, layer_hooks=None, segment_ids=None):
        """layer_hooks: optional {layer_idx_or_(layer, component): fn(hidden)
        -> hidden} activation intervention hook points (the TPU-native
        analogue of pyvene's forward hooks).

        segment_ids: optional (b, t) int for SEQUENCE PACKING (several
        examples per row, data/alpaca.pack_causal_lm): tokens attend only
        within their own segment and RoPE positions restart at each segment
        boundary, so a packed forward is exactly equivalent to running each
        example alone.  Requires a bias-carrying attention impl
        (einsum/dpa -- the default; splash builds its own causal mask).
        Training-path only (decode never packs)."""
        block_hooks, inner_hooks = self._split_hooks(layer_hooks)
        b, t = input_ids.shape
        # sequence-parallel boundary annotations (parallel/annotate.py):
        # no-ops unless the Trainer installed a tp>1 mesh for this trace
        x = self.embed_tokens(input_ids)
        if self.config.scale_embeddings:
            # Gemma: normalizer is materialized IN the activation dtype before
            # the multiply (HF GemmaModel.forward), bf16-relevant rounding
            x = x * jnp.asarray(self.config.hidden_size ** 0.5, x.dtype)
        x = shard_tokens(x)
        if positions is None:
            if segment_ids is not None:
                # position = offset within the token's own segment
                idx = jnp.broadcast_to(jnp.arange(t), (b, t))
                boundary = jnp.concatenate(
                    [jnp.ones((b, 1), bool),
                     segment_ids[:, 1:] != segment_ids[:, :-1]], axis=1)
                seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0), axis=1)
                positions = idx - seg_start
            else:
                positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        if caches is None:
            # training/prefill: causal mask (+ sliding window + padding mask)
            causal = jnp.tril(jnp.ones((t, t), dtype=bool))
            if self.config.sliding_window is not None:
                if self.config.attention_impl == "splash":
                    # splash builds its own pure-causal mask and ignores the
                    # bias -- it would silently attend beyond the window
                    raise ValueError(
                        "sliding_window requires a bias-carrying "
                        "attention_impl (einsum or dpa)")
                # Mistral local attention: keep keys with q - k < window
                # (HF semantics -- the window counts the query token)
                offs = jnp.arange(t)
                causal = causal & (
                    offs[:, None] - offs[None, :] < self.config.sliding_window)
            bias = jnp.where(causal[None, None], 0.0, -1e9).astype(x.dtype)
            if attention_mask is not None:
                pad = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * jnp.asarray(
                    -1e9, x.dtype)
                bias = bias + pad
            if segment_ids is not None:
                if self.config.attention_impl == "splash":
                    # splash builds its own pure-causal mask and ignores the
                    # bias -- it would silently attend across segments
                    raise ValueError(
                        "sequence packing (segment_ids) requires a "
                        "bias-carrying attention_impl (einsum or dpa)")
                same = (segment_ids[:, None, :, None]
                        == segment_ids[:, None, None, :])
                bias = bias + jnp.where(same, 0.0, -1e9).astype(x.dtype)
            new_caches = None
            if self.config.remat:
                # recompute each decoder layer in the backward: activation
                # memory drops from O(layers) to O(1) layers.  remat_policy
                # "dots" keeps matmul outputs resident (recompute only the
                # cheap elementwise work) -- see models/config.py
                policy = None
                if self.config.remat_policy == "dots":
                    policy = (jax.checkpoint_policies
                              .dots_with_no_batch_dims_saveable)
                elif self.config.remat_policy != "nothing":
                    raise ValueError(
                        f"unknown remat_policy {self.config.remat_policy!r}"
                        " (nothing | dots)")

                def make_run(hooks_i):
                    def run_layer(lyr, x, bias, positions):
                        return lyr(x, bias, positions, hooks=hooks_i)[0]
                    return nnx.remat(run_layer, policy=policy)
                plain_run = make_run(None)
                for i, lyr in enumerate(self.layers):
                    run = plain_run if i not in inner_hooks \
                        else make_run(inner_hooks[i])
                    x = shard_tokens(run(lyr, x, bias, positions))
                    if i in block_hooks:
                        x = block_hooks[i](x)
            else:
                for i, lyr in enumerate(self.layers):
                    x, _ = lyr(x, bias, positions, hooks=inner_hooks.get(i))
                    x = shard_tokens(x)
                    if i in block_hooks:
                        x = block_hooks[i](x)
        else:
            # prefill/decode over a fixed-size cache; attention_mask is over
            # the cache (b, cache_len).  Query row i sits at cache slot
            # cache_index + i and may attend any valid slot at or before it.
            cache_len = caches[0][0].shape[1]
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (t, cache_len), 1)
            row_pos = cache_index + jax.lax.broadcasted_iota(jnp.int32, (t, cache_len), 0)
            causal = slot_ids <= row_pos  # (t, cache_len)
            if self.config.sliding_window is not None:
                causal = causal & (
                    row_pos - slot_ids < self.config.sliding_window)
            ok = causal[None, None] & (attention_mask[:, None, None, :] > 0)
            bias = jnp.where(ok, 0.0, -1e9).astype(x.dtype)
            new_caches = []
            for i, (lyr, (kc, vc)) in enumerate(zip(self.layers, caches)):
                x, nc = lyr(x, bias, positions, cache=(kc, vc, cache_index),
                            hooks=inner_hooks.get(i))
                if i in block_hooks:
                    x = block_hooks[i](x)
                new_caches.append(nc)
        x = shard_tokens(self.norm(x))
        return x, new_caches


class LlamaForCausalLM(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.model = LlamaModel(cfg, rngs=rngs)
        if cfg.tie_word_embeddings:
            self.lm_head = None
        else:
            self.lm_head = _linear(cfg.hidden_size, cfg.vocab_size, rngs, dtype=cfg.compute_dtype, param_dtype=cfg.params_dtype)

    def logits(self, hidden: Array) -> Array:
        if self.lm_head is None:
            emb = self.model.embed_tokens.embedding[...]
            return hidden @ emb.T.astype(hidden.dtype)
        return self.lm_head(hidden)

    def __call__(self, input_ids, attention_mask=None, positions=None, caches=None,
                 cache_index=None, layer_hooks=None, segment_ids=None):
        hidden, new_caches = self.model(
            input_ids, attention_mask, positions, caches, cache_index,
            layer_hooks=layer_hooks, segment_ids=segment_ids)
        out = self.logits(hidden)
        return (out, new_caches) if caches is not None else out

    def training_loss(self, input_ids, labels, attention_mask=None,
                      positions=None, layer_hooks=None, segment_ids=None,
                      weights: Array | None = None,
                      ignore_index: int = -100) -> Array:
        """Forward + shifted CE in one call.  When ``config.loss_chunk > 0``
        the loss is computed chunk-by-chunk over tokens (ops/losses.py) and
        the full (B, T, V) logits tensor is never materialised — strictly
        less peak memory and HBM traffic than ``loss(self(...), labels)``,
        with identical numerics (fp32 logsumexp).  Harness loss_fns call
        this; ``__call__`` keeps returning full logits for eval/decoding."""
        from sparse_matrix_fine_tuning_tpu.ops.losses import (
            model_training_loss)
        return model_training_loss(
            self, input_ids, labels, attention_mask=attention_mask,
            positions=positions, layer_hooks=layer_hooks,
            segment_ids=segment_ids, weights=weights,
            ignore_index=ignore_index)

    def loss(self, logits: Array, labels: Array, ignore_index: int = -100,
             weights: Array | None = None) -> Array:
        """Shifted causal-LM cross-entropy with IGNORE_INDEX masking
        (matches the reference's HF loss + label masking,
        pyreft/loreft/dataset.py:243-244).

        weights: optional (B,) 0/1 per-row mask for padded ragged-tail rows.
        """
        shift_logits = logits[:, :-1].astype(jnp.float32)
        shift_labels = labels[:, 1:]
        mask = shift_labels != ignore_index
        if weights is not None:
            mask = mask & (weights[:, None] != 0)
        safe = jnp.where(mask, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1).squeeze(-1)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def init_caches(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    """Allocate empty KV caches: list of (k, v) of (b, max_len, kv_heads, hd)."""
    hd = cfg.head_width
    return [
        (jnp.zeros((batch, max_len, cfg.kv_heads, hd), dtype),
         jnp.zeros((batch, max_len, cfg.kv_heads, hd), dtype))
        for _ in range(cfg.num_hidden_layers)
    ]
