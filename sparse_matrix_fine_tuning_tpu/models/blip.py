"""TPU-native BLIP (vision-language) aux models (flax NNX).

The reference vendors BLIP as one of pyvene's per-arch aux models: thin
wrappers over HF ``BlipForQuestionAnswering`` / ``BlipForImageTextRetrieval``
(pyreft/pyvene/pyvene/models/blip/modelings_blip.py:8-77,
modelings_blip_itm.py:8-81) whose intervention anchors live on the TEXT
ENCODER layers (modelings_intervenable_blip.py:14-51).  This module builds
the full stack from scratch, TPU-first:

- ``BlipVisionModel``: pre-LN ViT.  The patch embedding is a
  reshape-then-matmul (one big MXU dot over ``(b*patches, 3*p*p)``) rather
  than a strided conv -- identical math, explicit MXU mapping.
- ``BlipTextModel``: BERT-style post-LN encoder whose every layer carries a
  cross-attention block reading the image embeds (HF
  modeling_blip_text.py: crossattention exists when config.is_decoder,
  which BLIP checkpoints set for encoder AND decoder; causality is a
  *forward-time* flag).  The same class serves as the causal text decoder.
- ``BlipForQuestionAnswering`` / ``BlipForImageTextRetrieval`` assemble the
  flows, and ``BlipWrapper`` / ``BlipITMWrapper`` reproduce the reference
  wrappers' dict outputs (decoder_logits / itm_score + hidden states).

Intervention surface: the text encoder's layers speak this package's
functional ``layer_hooks`` contract -- keys ``layer`` (block_output) or
``(layer, comp)`` with comp in {"block_input", "attention_output",
"cross_attention_output", "mlp_output"} -- matching pyvene's BLIP
component map (modelings_intervenable_blip.py anchors every unit on
``text_encoder.encoder.layer[%s]``; its "block_output" row uses an INPUT
hook -- a mapping quirk we do not reproduce: block_output here is the
block's actual output, consistent with every other family in this repo).

Note: the reference BlipITMWrapper's contrastive branch references
``self.vision_proj`` which it never stores (modelings_blip_itm.py:71 --
it stores ``model_vis_proj``), so that path crashes upstream; here the
contrastive cosine path works.

Known upstream divergence: the installed transformers' refactored BLIP
(4.57) silently DROPS the cross-attention key-padding mask --
``BlipTextLayer`` passes ``encoder_attention_mask`` as the
``attention_mask`` arg of ``BlipTextAttention`` (which has no
``encoder_attention_mask`` param), and ``BlipTextSelfAttention`` then
replaces it with its own ``None`` whenever ``encoder_hidden_states`` is
given -- so padded question tokens ARE attended by the HF decoder's
cross-attention.  This module implements the ORIGINAL BLIP semantics
(pad keys masked); the parity tests compare padded batches everywhere
the upstream mask path is intact and pin this one divergence explicitly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx

Array = jax.Array


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BlipVisionConfig:
    """HF BlipVisionConfig surface (configuration_blip.py defaults)."""
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 384
    patch_size: int = 16
    layer_norm_eps: float = 1e-5

    @classmethod
    def tiny(cls, **kw):
        d = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                 num_attention_heads=4, image_size=24, patch_size=8)
        d.update(kw)
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class BlipTextConfig:
    """HF BlipTextConfig surface.  ``encoder_hidden_size`` is the width of
    the cross-attended image embeds."""
    vocab_size: int = 30524
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    encoder_hidden_size: int = 768
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    bos_token_id: int = 30522
    sep_token_id: int = 102

    @classmethod
    def tiny(cls, **kw):
        d = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                 num_hidden_layers=2, num_attention_heads=4,
                 encoder_hidden_size=32, max_position_embeddings=64,
                 bos_token_id=97, sep_token_id=98)
        d.update(kw)
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class BlipModelConfig:
    """HF BlipConfig: the (text, vision) pair plus the ITM projection
    width."""
    text_config: BlipTextConfig = dataclasses.field(
        default_factory=BlipTextConfig)
    vision_config: BlipVisionConfig = dataclasses.field(
        default_factory=BlipVisionConfig)
    image_text_hidden_size: int = 256

    @property
    def hidden_size(self) -> int:
        """Intervention width: the TEXT hidden size -- every pyvene BLIP
        anchor lives on the text encoder (modelings_intervenable_blip.py),
        so ReftModel sizes its interventions from it."""
        return self.text_config.hidden_size

    @classmethod
    def tiny(cls, **kw):
        d = dict(text_config=BlipTextConfig.tiny(),
                 vision_config=BlipVisionConfig.tiny(),
                 image_text_hidden_size=16)
        d.update(kw)
        return cls(**d)


def _linear(in_f, out_f, rngs, *, bias=True):
    return nnx.Linear(in_f, out_f, use_bias=bias,
                      kernel_init=nnx.initializers.normal(stddev=0.02),
                      rngs=rngs)


def _ln(width, eps, rngs):
    # two-pass variance: the default fast E[x^2]-E[x]^2 form loses ~1e-4
    # to cancellation, visible in the parity tests; BLIP is an aux test
    # model (never a hot training path), so exactness wins here
    return nnx.LayerNorm(width, epsilon=eps, use_fast_variance=False,
                         rngs=rngs)


# --------------------------------------------------------------------------
# vision (pre-LN ViT)
# --------------------------------------------------------------------------

class BlipVisionEmbeddings(nnx.Module):
    """cls token + patch matmul + learned positions (HF
    BlipVisionEmbeddings, modeling_blip.py).  ``patch_kernel`` is stored
    flat ``(3*p*p, d)`` -- the HF conv weight ``(d, 3, p, p)`` reshapes
    into it -- so the patch embed is one MXU dot over all patches."""

    def __init__(self, cfg: BlipVisionConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        d, p = cfg.hidden_size, cfg.patch_size
        self.class_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (1, 1, d)))
        self.patch_kernel = nnx.Param(
            jax.random.normal(rngs.params(), (3 * p * p, d)) * 0.02)
        self.patch_bias = nnx.Param(jnp.zeros((d,)))
        num_pos = (cfg.image_size // p) ** 2 + 1
        self.position_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (1, num_pos, d)))

    def __call__(self, pixel_values: Array) -> Array:
        """pixel_values: (b, 3, H, W) -- HF channel-first layout."""
        b, c, hh, ww = pixel_values.shape
        p = self.cfg.patch_size
        gh, gw = hh // p, ww // p
        # (b, c, gh, p, gw, p) -> (b, gh, gw, c, p, p): per-patch flatten
        # order (c, ph, pw) matches the HF conv-weight reshape
        x = pixel_values.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
        patches = x @ self.patch_kernel[...] + self.patch_bias[...]
        cls = jnp.broadcast_to(self.class_embedding[...],
                               (b, 1, patches.shape[-1]))
        emb = jnp.concatenate([cls, patches], axis=1)
        return emb + self.position_embedding[...][:, : emb.shape[1]]


class BlipVisionLayer(nnx.Module):
    """Pre-LN block: LN -> fused-qkv attention -> +res; LN -> MLP -> +res
    (HF BlipEncoderLayer)."""

    def __init__(self, cfg: BlipVisionConfig, *, rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.head_dim = d // cfg.num_attention_heads
        self.layer_norm1 = _ln(d, cfg.layer_norm_eps, rngs)
        self.qkv = _linear(d, 3 * d, rngs)
        self.projection = _linear(d, d, rngs)
        self.layer_norm2 = _ln(d, cfg.layer_norm_eps, rngs)
        self.fc1 = _linear(d, cfg.intermediate_size, rngs)
        self.fc2 = _linear(cfg.intermediate_size, d, rngs)

    def __call__(self, x: Array) -> Array:
        b, t, d = x.shape
        h = self.layer_norm1(x)
        qkv = self.qkv(h).reshape(b, t, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = jnp.asarray(self.head_dim, h.dtype) ** -0.5
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
        ctx = jnp.einsum("bhts,bshd->bthd",
                         jax.nn.softmax(scores, axis=-1), v)
        x = x + self.projection(ctx.reshape(b, t, d))
        h = self.layer_norm2(x)
        # HF "gelu" is the exact erf form
        return x + self.fc2(jax.nn.gelu(self.fc1(h), approximate=False))


class BlipVisionModel(nnx.Module):
    """ViT encoder + post_layernorm; returns (last_hidden, pooled)."""

    def __init__(self, cfg: BlipVisionConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.embeddings = BlipVisionEmbeddings(cfg, rngs=rngs)
        self.layers = nnx.List([BlipVisionLayer(cfg, rngs=rngs)
                                for _ in range(cfg.num_hidden_layers)])
        self.post_layernorm = _ln(cfg.hidden_size, cfg.layer_norm_eps, rngs)

    def __call__(self, pixel_values: Array):
        x = self.embeddings(pixel_values)
        for layer in self.layers:
            x = layer(x)
        last = self.post_layernorm(x)
        return last, last[:, 0]


# --------------------------------------------------------------------------
# text (BERT-style post-LN with cross-attention in every layer)
# --------------------------------------------------------------------------

class BlipTextAttention(nnx.Module):
    """q/k/v + dense-LN(residual) output (HF BlipTextAttention =
    BlipTextSelfAttention + BlipTextSelfOutput).  ``kv_width`` differs from
    the hidden width for cross-attention (keys/values read the image
    embeds)."""

    def __init__(self, cfg: BlipTextConfig, kv_width: int, *,
                 rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.head_dim = d // cfg.num_attention_heads
        self.query = _linear(d, d, rngs)
        self.key = _linear(kv_width, d, rngs)
        self.value = _linear(kv_width, d, rngs)
        self.dense = _linear(d, d, rngs)
        self.ln = _ln(d, cfg.layer_norm_eps, rngs)

    def __call__(self, x: Array, kv: Array, bias: Array | None) -> Array:
        b, t, d = x.shape
        s = kv.shape[1]
        q = self.query(x).reshape(b, t, self.num_heads, self.head_dim)
        k = self.key(kv).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(kv).reshape(b, s, self.num_heads, self.head_dim)
        scale = jnp.asarray(self.head_dim, x.dtype) ** -0.5
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
        if bias is not None:
            scores = scores + bias
        ctx = jnp.einsum("bhts,bshd->bthd",
                         jax.nn.softmax(scores, axis=-1), v)
        return self.ln(self.dense(ctx.reshape(b, t, d)) + x)


class BlipTextLayer(nnx.Module):
    """self-attn -> cross-attn (when image embeds given) -> MLP, each with
    post-LN residuals (HF BlipTextLayer.forward)."""

    def __init__(self, cfg: BlipTextConfig, *, rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.attention = BlipTextAttention(cfg, d, rngs=rngs)
        self.crossattention = BlipTextAttention(
            cfg, cfg.encoder_hidden_size, rngs=rngs)
        self.intermediate = _linear(d, cfg.intermediate_size, rngs)
        self.output = _linear(cfg.intermediate_size, d, rngs)
        self.output_ln = _ln(d, cfg.layer_norm_eps, rngs)

    def __call__(self, x, self_bias, enc=None, enc_bias=None, hooks=None):
        hooks = hooks or {}
        if "block_input" in hooks:
            x = hooks["block_input"](x)
        x = self.attention(x, x, self_bias)
        if "attention_output" in hooks:
            x = hooks["attention_output"](x)
        if enc is not None:
            x = self.crossattention(x, enc, enc_bias)
            if "cross_attention_output" in hooks:
                x = hooks["cross_attention_output"](x)
        mlp = self.output(jax.nn.gelu(self.intermediate(x),
                                      approximate=False))
        if "mlp_output" in hooks:
            mlp = hooks["mlp_output"](mlp)
        return self.output_ln(mlp + x)


def _additive_mask(attention_mask: Array | None, dtype, t: int,
                   causal: bool) -> Array | None:
    """(b, s) {0,1} mask -> (b, 1, t, s) additive bias; optionally causal."""
    bias = None
    if attention_mask is not None:
        bias = (1.0 - attention_mask[:, None, None, :].astype(dtype)) * -1e9
    if causal:
        tri = jnp.where(jnp.tril(jnp.ones((t, t), bool)), 0.0,
                        -1e9).astype(dtype)[None, None]
        bias = tri if bias is None else bias + tri
    return bias


class BlipTextModel(nnx.Module):
    """BERT-style embeddings + cross-attending layers.  ``is_decoder`` is a
    forward-time flag (causal self-attention), like HF's
    BlipTextModel.forward(is_decoder=...) -- the modules are identical.

    layer_hooks: {layer: fn} (block_output) or {(layer, comp): fn} with
    comp in {"block_input", "attention_output", "cross_attention_output",
    "mlp_output"} -- pyvene's BLIP anchors all live on these text-encoder
    layers (modelings_intervenable_blip.py:23-39).
    """

    def __init__(self, cfg: BlipTextConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.word_embeddings = nnx.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nnx.initializers.normal(stddev=0.02), rngs=rngs)
        self.position_embeddings = nnx.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=nnx.initializers.normal(stddev=0.02), rngs=rngs)
        self.emb_ln = _ln(cfg.hidden_size, cfg.layer_norm_eps, rngs)
        self.layer = nnx.List([BlipTextLayer(cfg, rngs=rngs)
                               for _ in range(cfg.num_hidden_layers)])

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

    def __call__(self, input_ids: Array, attention_mask=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 is_decoder: bool = False, layer_hooks=None):
        """Returns (last_hidden, hidden_states tuple) -- the wrappers
        forward with output_hidden_states=True always."""
        block_hooks, inner_hooks = self._split_hooks(layer_hooks)
        b, t = input_ids.shape
        pos = jnp.broadcast_to(jnp.arange(t), (b, t))
        x = self.emb_ln(self.word_embeddings(input_ids)
                        + self.position_embeddings(pos))
        self_bias = _additive_mask(attention_mask, x.dtype, t, is_decoder)
        enc_bias = None
        if encoder_hidden_states is not None:
            enc_bias = _additive_mask(
                encoder_attention_mask, x.dtype, t, False)
        hidden_states = (x,)
        for i, layer in enumerate(self.layer):
            x = layer(x, self_bias, encoder_hidden_states, enc_bias,
                      hooks=inner_hooks.get(i))
            if i in block_hooks:
                x = block_hooks[i](x)
            hidden_states += (x,)
        return x, hidden_states


class BlipTextLMHead(nnx.Module):
    """transform (dense+gelu+LN) -> vocab decoder with free bias (HF
    BlipTextLMPredictionHead)."""

    def __init__(self, cfg: BlipTextConfig, *, rngs: nnx.Rngs):
        d = cfg.hidden_size
        self.transform_dense = _linear(d, d, rngs)
        self.transform_ln = _ln(d, cfg.layer_norm_eps, rngs)
        self.decoder = _linear(d, cfg.vocab_size, rngs)

    def __call__(self, hidden: Array) -> Array:
        h = self.transform_ln(jax.nn.gelu(self.transform_dense(hidden),
                                          approximate=False))
        return self.decoder(h)


# --------------------------------------------------------------------------
# assembled flows + reference-parity wrappers
# --------------------------------------------------------------------------

class BlipForQuestionAnswering(nnx.Module):
    """vision -> text_encoder(question, cross=image) -> text_decoder
    (HF BlipForQuestionAnswering modules)."""

    def __init__(self, cfg: BlipModelConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.vision_model = BlipVisionModel(cfg.vision_config, rngs=rngs)
        self.text_encoder = BlipTextModel(cfg.text_config, rngs=rngs)
        self.text_decoder = BlipTextModel(cfg.text_config, rngs=rngs)
        self.lm_head = BlipTextLMHead(cfg.text_config, rngs=rngs)
        self.decoder_start_token_id = cfg.text_config.bos_token_id
        self.pad_token_id = cfg.text_config.pad_token_id


class BlipWrapper(nnx.Module):
    """The reference's pyvene aux model (modelings_blip.py:8-77): one
    forward returning {"decoder_logits", "image_embeds",
    "encoder_last_hidden_state", "encoder_hidden_states",
    "decoder_hidden_states"}.  The decoder sees only the BOS token and
    cross-attends to the question embeds, exactly like the reference
    (modelings_blip.py:57-69)."""

    def __init__(self, model: BlipForQuestionAnswering):
        self.m = model
        self.config = model.config
        self.eos_token_id = (model.config.text_config.sep_token_id,)
        self.pad_token_id = model.config.text_config.pad_token_id

    def __call__(self, input_ids: Array, pixel_values: Array,
                 attention_mask: Array | None = None, layer_hooks=None):
        m = self.m
        image_embeds, _ = m.vision_model(pixel_values)
        question_embeds, enc_hidden = m.text_encoder(
            input_ids, attention_mask=attention_mask,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=None,  # reference: all-ones image mask
            layer_hooks=layer_hooks)
        bos = jnp.full((question_embeds.shape[0], 1),
                       m.decoder_start_token_id, dtype=input_ids.dtype)
        dec_hidden_last, dec_hidden = m.text_decoder(
            bos, encoder_hidden_states=question_embeds,
            encoder_attention_mask=attention_mask, is_decoder=True)
        return {
            "decoder_logits": m.lm_head(dec_hidden_last),
            "image_embeds": image_embeds,
            "encoder_last_hidden_state": question_embeds,
            "encoder_hidden_states": enc_hidden,
            "decoder_hidden_states": dec_hidden,
        }


class BlipForImageTextRetrieval(nnx.Module):
    """vision + text encoder + itm head / contrastive projections (HF
    BlipForImageTextRetrieval modules)."""

    def __init__(self, cfg: BlipModelConfig, *, rngs: nnx.Rngs):
        self.config = cfg
        self.vision_model = BlipVisionModel(cfg.vision_config, rngs=rngs)
        self.text_encoder = BlipTextModel(cfg.text_config, rngs=rngs)
        self.vision_proj = _linear(cfg.vision_config.hidden_size,
                                   cfg.image_text_hidden_size, rngs)
        self.text_proj = _linear(cfg.text_config.hidden_size,
                                 cfg.image_text_hidden_size, rngs)
        self.itm_head = _linear(cfg.text_config.hidden_size, 2, rngs)


class BlipITMWrapper(nnx.Module):
    """The reference's ITM aux model (modelings_blip_itm.py:8-81):
    ``use_itm_head=True`` scores CLS through the 2-way itm head after a
    cross-attending encode; False returns the image@text.T contrastive
    cosine matrix (which crashes upstream -- see module docstring)."""

    def __init__(self, model: BlipForImageTextRetrieval,
                 use_itm_not_contrastive: bool = True):
        self.m = model
        self.config = model.config
        self.use_itm_head = use_itm_not_contrastive
        self.eos_token_id = (model.config.text_config.sep_token_id,)
        self.pad_token_id = model.config.text_config.pad_token_id

    def __call__(self, input_ids: Array, pixel_values: Array,
                 attention_mask: Array | None = None, layer_hooks=None):
        m = self.m
        image_embeds, _ = m.vision_model(pixel_values)
        if self.use_itm_head:
            caption_embeds, hidden = m.text_encoder(
                input_ids, attention_mask=attention_mask,
                encoder_hidden_states=image_embeds,
                layer_hooks=layer_hooks)
            output = m.itm_head(caption_embeds[:, 0])
        else:
            caption_embeds, hidden = m.text_encoder(
                input_ids, attention_mask=attention_mask,
                layer_hooks=layer_hooks)
            norm = lambda z: z / jnp.linalg.norm(z, axis=-1, keepdims=True)  # noqa: E731
            image_feat = norm(m.vision_proj(image_embeds[:, 0]))
            text_feat = norm(m.text_proj(caption_embeds[:, 0]))
            output = image_feat @ text_feat.T
        return {
            "itm_score": output,
            "image_embeds": image_embeds,
            "encoder_last_hidden_state": caption_embeds,
            "encoder_hidden_states": hidden,
        }


# --------------------------------------------------------------------------
# HF weight interop
# --------------------------------------------------------------------------

def blip_config_from_hf(hf: dict) -> BlipModelConfig:
    """HF BlipConfig dict -> BlipModelConfig."""
    tc, vc = hf["text_config"], hf["vision_config"]
    return BlipModelConfig(
        text_config=BlipTextConfig(
            vocab_size=tc["vocab_size"], hidden_size=tc["hidden_size"],
            intermediate_size=tc["intermediate_size"],
            num_hidden_layers=tc["num_hidden_layers"],
            num_attention_heads=tc["num_attention_heads"],
            encoder_hidden_size=tc.get("encoder_hidden_size",
                                       vc["hidden_size"]),
            max_position_embeddings=tc["max_position_embeddings"],
            layer_norm_eps=tc.get("layer_norm_eps", 1e-12),
            pad_token_id=tc.get("pad_token_id", 0),
            bos_token_id=tc.get("bos_token_id", 30522),
            sep_token_id=tc.get("sep_token_id", 102)),
        vision_config=BlipVisionConfig(
            hidden_size=vc["hidden_size"],
            intermediate_size=vc["intermediate_size"],
            num_hidden_layers=vc["num_hidden_layers"],
            num_attention_heads=vc["num_attention_heads"],
            image_size=vc["image_size"], patch_size=vc["patch_size"],
            layer_norm_eps=vc.get("layer_norm_eps", 1e-5)),
        image_text_hidden_size=hf.get("image_text_hidden_size", 256))


def _load_vision(vis: BlipVisionModel, sd, np_, set_linear, set_ln,
                 prefix="vision_model"):
    emb = vis.embeddings
    emb.class_embedding.set_value(jnp.asarray(
        np_(sd[f"{prefix}.embeddings.class_embedding"])))
    w = np_(sd[f"{prefix}.embeddings.patch_embedding.weight"])  # (d,3,p,p)
    emb.patch_kernel.set_value(jnp.asarray(w.reshape(w.shape[0], -1).T))
    emb.patch_bias.set_value(jnp.asarray(
        np_(sd[f"{prefix}.embeddings.patch_embedding.bias"])))
    emb.position_embedding.set_value(jnp.asarray(
        np_(sd[f"{prefix}.embeddings.position_embedding"])))
    for i, layer in enumerate(vis.layers):
        p = f"{prefix}.encoder.layers.{i}"
        set_ln(layer.layer_norm1, sd, f"{p}.layer_norm1")
        set_linear(layer.qkv, sd, f"{p}.self_attn.qkv")
        set_linear(layer.projection, sd, f"{p}.self_attn.projection")
        set_ln(layer.layer_norm2, sd, f"{p}.layer_norm2")
        set_linear(layer.fc1, sd, f"{p}.mlp.fc1")
        set_linear(layer.fc2, sd, f"{p}.mlp.fc2")
    set_ln(vis.post_layernorm, sd, f"{prefix}.post_layernorm")


def _load_text(txt: BlipTextModel, sd, np_, set_linear, set_ln, prefix):
    txt.word_embeddings.embedding.set_value(jnp.asarray(
        np_(sd[f"{prefix}.embeddings.word_embeddings.weight"])))
    txt.position_embeddings.embedding.set_value(jnp.asarray(
        np_(sd[f"{prefix}.embeddings.position_embeddings.weight"])))
    set_ln(txt.emb_ln, sd, f"{prefix}.embeddings.LayerNorm")
    for i, layer in enumerate(txt.layer):
        p = f"{prefix}.encoder.layer.{i}"
        set_linear(layer.attention.query, sd, f"{p}.attention.self.query")
        set_linear(layer.attention.key, sd, f"{p}.attention.self.key")
        set_linear(layer.attention.value, sd, f"{p}.attention.self.value")
        set_linear(layer.attention.dense, sd, f"{p}.attention.output.dense")
        set_ln(layer.attention.ln, sd, f"{p}.attention.output.LayerNorm")
        if f"{p}.crossattention.self.query.weight" in sd:
            ca = layer.crossattention
            set_linear(ca.query, sd, f"{p}.crossattention.self.query")
            set_linear(ca.key, sd, f"{p}.crossattention.self.key")
            set_linear(ca.value, sd, f"{p}.crossattention.self.value")
            set_linear(ca.dense, sd, f"{p}.crossattention.output.dense")
            set_ln(ca.ln, sd, f"{p}.crossattention.output.LayerNorm")
        set_linear(layer.intermediate, sd, f"{p}.intermediate.dense")
        set_linear(layer.output, sd, f"{p}.output.dense")
        set_ln(layer.output_ln, sd, f"{p}.output.LayerNorm")


def load_blip_qa(model: BlipForQuestionAnswering, state_dict) -> None:
    """Load an HF BlipForQuestionAnswering state_dict (torch tensors or
    numpy)."""
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
        _np, _set_linear, _set_ln)
    sd = dict(state_dict)
    _load_vision(model.vision_model, sd, _np, _set_linear, _set_ln)
    _load_text(model.text_encoder, sd, _np, _set_linear, _set_ln,
               "text_encoder")
    _load_text(model.text_decoder, sd, _np, _set_linear, _set_ln,
               "text_decoder.bert")
    head = model.lm_head
    _set_linear(head.transform_dense, sd,
                "text_decoder.cls.predictions.transform.dense")
    _set_ln(head.transform_ln, sd,
            "text_decoder.cls.predictions.transform.LayerNorm")
    head.decoder.kernel.set_value(jnp.asarray(
        _np(sd["text_decoder.cls.predictions.decoder.weight"]).T))
    bias_key = ("text_decoder.cls.predictions.bias"
                if "text_decoder.cls.predictions.bias" in sd
                else "text_decoder.cls.predictions.decoder.bias")
    head.decoder.bias.set_value(jnp.asarray(_np(sd[bias_key])))


def load_blip_itm(model: BlipForImageTextRetrieval, state_dict) -> None:
    """Load an HF BlipForImageTextRetrieval state_dict."""
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
        _np, _set_linear, _set_ln)
    sd = dict(state_dict)
    _load_vision(model.vision_model, sd, _np, _set_linear, _set_ln)
    _load_text(model.text_encoder, sd, _np, _set_linear, _set_ln,
               "text_encoder")
    _set_linear(model.vision_proj, sd, "vision_proj")
    _set_linear(model.text_proj, sd, "text_proj")
    _set_linear(model.itm_head, sd, "itm_head")
