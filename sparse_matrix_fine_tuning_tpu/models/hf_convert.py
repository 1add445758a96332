"""Load HF (PyTorch) checkpoints into the TPU-native NNX models.

The reference fine-tunes stock HF roberta-large / deberta-v3 / Llama-2-7b
(run_glue.py:376-382, loreft/train.py:116-123); here the pretrained weights
are converted tensor-by-tensor into the NNX modules (Linear kernels are
transposed: torch stores (out, in), flax stores (in, out)).

Accepts either a live ``transformers`` model / state_dict or a local
checkpoint directory (pytorch_model.bin / model.safetensors).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    # explicit copy: .numpy() SHARES memory with the torch tensor and jax's
    # CPU backend can alias numpy buffers zero-copy, so without this a live
    # torch model's in-place optimizer updates would silently mutate the
    # converted jax weights (observed in training-parity tests)
    return np.array(t, copy=True)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a state dict from an HF checkpoint dir or a single
    ``.safetensors`` / ``.bin`` / ``.pt`` file."""
    if os.path.isfile(path):
        if path.endswith(".safetensors"):
            from safetensors.numpy import load_file
            return load_file(path)
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: _np(v) for k, v in sd.items()}
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file
        return load_file(st_path)
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: _np(v) for k, v in sd.items()}
    raise FileNotFoundError(f"no checkpoint found under {path}")


def _set_linear(mod, sd, prefix):
    mod.kernel.set_value(jnp.asarray(_np(sd[prefix + ".weight"]).T))
    if prefix + ".bias" in sd and mod.bias is not None:
        mod.bias.set_value(jnp.asarray(_np(sd[prefix + ".bias"])))


def _set_ln(mod, sd, prefix):
    mod.scale.set_value(jnp.asarray(_np(sd[prefix + ".weight"])))
    if prefix + ".bias" in sd and getattr(mod, "bias", None) is not None:
        mod.bias.set_value(jnp.asarray(_np(sd[prefix + ".bias"])))


def _set_embed(mod, sd, key):
    mod.embedding.set_value(jnp.asarray(_np(sd[key])))


def load_roberta(model, state_dict: Dict) -> None:
    """Populate a RobertaForSequenceClassification (or its .roberta) from an
    HF ``roberta-*`` state dict, in place."""
    sd = {k.removeprefix("roberta."): v for k, v in state_dict.items()}
    rob = model.roberta if hasattr(model, "roberta") else model
    emb = rob.embeddings
    _set_embed(emb.word_embeddings, sd, "embeddings.word_embeddings.weight")
    _set_embed(emb.position_embeddings, sd, "embeddings.position_embeddings.weight")
    _set_embed(emb.token_type_embeddings, sd, "embeddings.token_type_embeddings.weight")
    _set_ln(emb.LayerNorm, sd, "embeddings.LayerNorm")
    for i, lyr in enumerate(rob.layer):
        p = f"encoder.layer.{i}"
        _set_linear(lyr.attention.self.query, sd, f"{p}.attention.self.query")
        _set_linear(lyr.attention.self.key, sd, f"{p}.attention.self.key")
        _set_linear(lyr.attention.self.value, sd, f"{p}.attention.self.value")
        _set_linear(lyr.attention.output.dense, sd, f"{p}.attention.output.dense")
        _set_ln(lyr.attention.output.LayerNorm, sd, f"{p}.attention.output.LayerNorm")
        _set_linear(lyr.intermediate.dense, sd, f"{p}.intermediate.dense")
        _set_linear(lyr.output.dense, sd, f"{p}.output.dense")
        _set_ln(lyr.output.LayerNorm, sd, f"{p}.output.LayerNorm")
    if hasattr(model, "classifier") and "classifier.dense.weight" in state_dict:
        _set_linear(model.classifier.dense, state_dict, "classifier.dense")
        _set_linear(model.classifier.out_proj, state_dict, "classifier.out_proj")


def causal_lm_config_from_hf(hf: Dict, **overrides):
    """Map an HF ``config.json`` dict for any supported decoder-only family
    (llama / mistral / gemma / qwen2) onto a :class:`LlamaConfig`.

    The reference's causal flows are Llama-2-only (qlora_monarch.py:231,
    loreft/train.py:116); its vendored pyvene additionally ships per-arch
    component maps for these siblings (pyreft/pyvene/pyvene/models/
    {mistral,gemma,qwen2}/modelings_intervenable_*.py) -- here one
    parameterized stack covers them (models/config.py)."""
    from sparse_matrix_fine_tuning_tpu.models import LlamaConfig
    mt = hf.get("model_type", "llama")
    kw = dict(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads"),
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        head_dim=hf.get("head_dim"),
        pad_token_id=hf.get("pad_token_id") or 0,
        bos_token_id=hf.get("bos_token_id", 1),
        eos_token_id=hf.get("eos_token_id", 2),
    )
    if mt == "mistral":
        kw["sliding_window"] = hf.get("sliding_window")
    elif mt == "qwen2":
        kw["attention_qkv_bias"] = True
        if hf.get("use_sliding_window"):
            kw["sliding_window"] = hf.get("sliding_window")
    elif mt == "gemma":
        # HF GemmaMLP defaults to the tanh-approx gelu regardless of the
        # checkpoint's legacy "gelu" string (transformers#29402)
        kw["mlp_activation"] = "gelu_tanh"
        kw["rmsnorm_unit_offset"] = True
        kw["scale_embeddings"] = True
        kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", True)
    elif mt != "llama":
        raise ValueError(f"unsupported causal-LM model_type {mt!r} "
                         "(llama | mistral | gemma | qwen2)")
    kw.update(overrides)
    return LlamaConfig(**kw)


def load_llama(model, state_dict: Dict) -> None:
    """Populate a LlamaForCausalLM from an HF ``llama``-family state dict
    (llama / mistral / gemma / qwen2 share tensor names; qkv biases are set
    when present, tied checkpoints simply lack ``lm_head.weight``)."""
    sd = state_dict
    _set_embed(model.model.embed_tokens, sd, "model.embed_tokens.weight")
    for i, lyr in enumerate(model.model.layers):
        p = f"model.layers.{i}"
        _set_linear(lyr.self_attn.q_proj, sd, f"{p}.self_attn.q_proj")
        _set_linear(lyr.self_attn.k_proj, sd, f"{p}.self_attn.k_proj")
        _set_linear(lyr.self_attn.v_proj, sd, f"{p}.self_attn.v_proj")
        _set_linear(lyr.self_attn.o_proj, sd, f"{p}.self_attn.o_proj")
        _set_linear(lyr.mlp.gate_proj, sd, f"{p}.mlp.gate_proj")
        _set_linear(lyr.mlp.up_proj, sd, f"{p}.mlp.up_proj")
        _set_linear(lyr.mlp.down_proj, sd, f"{p}.mlp.down_proj")
        _set_ln(lyr.input_layernorm, sd, f"{p}.input_layernorm")
        _set_ln(lyr.post_attention_layernorm, sd, f"{p}.post_attention_layernorm")
    _set_ln(model.model.norm, sd, "model.norm")
    if model.lm_head is not None and "lm_head.weight" in sd:
        _set_linear(model.lm_head, sd, "lm_head")


def from_pretrained_roberta(path: str, num_labels: int = 2, dtype=None, *, rngs=None):
    """Build + load a RobertaForSequenceClassification from a local HF dir."""
    import json
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models import (
        RobertaConfig, RobertaForSequenceClassification)
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = RobertaConfig(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 1),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        pad_token_id=hf.get("pad_token_id", 1),
        num_labels=num_labels, dtype=dtype)
    model = RobertaForSequenceClassification(cfg, rngs=rngs or nnx.Rngs(0))
    load_roberta(model, load_state_dict(path))
    return model


def from_pretrained_llama(path: str, dtype="bfloat16", *, rngs=None,
                          remat: bool = False, param_dtype=None,
                          remat_policy: str = "nothing"):
    """remat: rematerialise decoder layers in the backward (the reference
    qlora flow defaults gradient_checkpointing=True, qlora_monarch.py:144).
    remat_policy: "nothing" (full recompute, minimum memory -- the
    single-chip 7B choice) or "dots" (keep matmul outputs, recompute only
    elementwise work -- faster when memory allows; models/config.py)."""
    import json
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models import LlamaForCausalLM
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = causal_lm_config_from_hf(
        hf, remat=remat, remat_policy=remat_policy,
        param_dtype=param_dtype or dtype, dtype=dtype)
    model = LlamaForCausalLM(cfg, rngs=rngs or nnx.Rngs(0))
    load_llama(model, load_state_dict(path))
    return model


def load_deberta(model, state_dict: Dict) -> None:
    """Populate a DebertaV2ForSequenceClassification from an HF
    ``deberta-v2/v3`` state dict."""
    sd = state_dict
    deb = model.deberta if hasattr(model, "deberta") else model
    _set_embed(deb.word_embeddings, sd, "deberta.embeddings.word_embeddings.weight")
    _set_ln(deb.emb_LayerNorm, sd, "deberta.embeddings.LayerNorm")
    if deb.rel_embeddings is not None:
        _set_embed(deb.rel_embeddings, sd, "deberta.encoder.rel_embeddings.weight")
    if deb.rel_LayerNorm is not None:
        _set_ln(deb.rel_LayerNorm, sd, "deberta.encoder.LayerNorm")
    for i, lyr in enumerate(deb.layer):
        p = f"deberta.encoder.layer.{i}"
        _set_linear(lyr.attention_self.query_proj, sd, f"{p}.attention.self.query_proj")
        _set_linear(lyr.attention_self.key_proj, sd, f"{p}.attention.self.key_proj")
        _set_linear(lyr.attention_self.value_proj, sd, f"{p}.attention.self.value_proj")
        _set_linear(lyr.attention_output.dense, sd, f"{p}.attention.output.dense")
        _set_ln(lyr.attention_output.LayerNorm, sd, f"{p}.attention.output.LayerNorm")
        _set_linear(lyr.intermediate, sd, f"{p}.intermediate.dense")
        _set_linear(lyr.output_dense, sd, f"{p}.output.dense")
        _set_ln(lyr.output_LayerNorm, sd, f"{p}.output.LayerNorm")
    if hasattr(model, "pooler") and "pooler.dense.weight" in sd:
        _set_linear(model.pooler, sd, "pooler.dense")
        _set_linear(model.classifier, sd, "classifier")


def from_pretrained_deberta(path: str, num_labels: int = 2, dtype=None, *, rngs=None):
    import json
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models.deberta import (
        DebertaV2Config, DebertaV2ForSequenceClassification)
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = DebertaV2Config(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 0),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-7),
        pad_token_id=hf.get("pad_token_id", 0),
        relative_attention=hf.get("relative_attention", True),
        position_buckets=hf.get("position_buckets", 256),
        max_relative_positions=hf.get("max_relative_positions", -1),
        pos_att_type=tuple(hf.get("pos_att_type", ["p2c", "c2p"])),
        share_att_key=hf.get("share_att_key", True),
        norm_rel_ebd=hf.get("norm_rel_ebd", "layer_norm"),
        position_biased_input=hf.get("position_biased_input", False),
        num_labels=num_labels, dtype=dtype)
    model = DebertaV2ForSequenceClassification(cfg, rngs=rngs or nnx.Rngs(0))
    load_deberta(model, load_state_dict(path))
    return model


def _set_conv1d(mod, sd, prefix):
    """HF GPT-2 Conv1D stores its weight as (in, out) -- already the
    nnx.Linear kernel layout, so no transpose (unlike _set_linear)."""
    mod.kernel.set_value(jnp.asarray(_np(sd[prefix + ".weight"])))
    if prefix + ".bias" in sd and mod.bias is not None:
        mod.bias.set_value(jnp.asarray(_np(sd[prefix + ".bias"])))


def gpt2_config_from_hf(hf: Dict, **overrides):
    """Map an HF GPT-2 ``config.json`` (n_embd/n_layer/n_head/n_positions
    naming) onto a :class:`GPT2Config`."""
    from sparse_matrix_fine_tuning_tpu.models.gpt2 import GPT2Config
    kw = dict(
        vocab_size=hf["vocab_size"],
        hidden_size=hf.get("n_embd", hf.get("hidden_size", 768)),
        num_hidden_layers=hf.get("n_layer", hf.get("num_hidden_layers", 12)),
        num_attention_heads=hf.get("n_head", hf.get("num_attention_heads", 12)),
        intermediate_size=hf.get("n_inner"),
        max_position_embeddings=hf.get("n_positions",
                                       hf.get("max_position_embeddings", 1024)),
        layer_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        bos_token_id=hf.get("bos_token_id", 50256),
        eos_token_id=hf.get("eos_token_id", 50256),
        scale_attn_by_inverse_layer_idx=hf.get(
            "scale_attn_by_inverse_layer_idx", False),
    )
    kw["pad_token_id"] = hf.get("pad_token_id") or kw["eos_token_id"]
    kw.update(overrides)
    return GPT2Config(**kw)


def load_gpt2(model, state_dict: Dict) -> None:
    """Populate a GPT2LMHeadModel from an HF ``gpt2`` state dict.  Accepts
    both bare-``transformer.``-prefixed (GPT2LMHeadModel) and unprefixed
    (GPT2Model) key layouts; ``lm_head`` is tied to wte so it is never
    read."""
    sd = state_dict
    pfx = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    tr = model.transformer
    _set_embed(tr.wte, sd, f"{pfx}wte.weight")
    _set_embed(tr.wpe, sd, f"{pfx}wpe.weight")
    for i, blk in enumerate(tr.h):
        p = f"{pfx}h.{i}"
        _set_ln(blk.ln_1, sd, f"{p}.ln_1")
        _set_conv1d(blk.attn.c_attn, sd, f"{p}.attn.c_attn")
        _set_conv1d(blk.attn.c_proj, sd, f"{p}.attn.c_proj")
        _set_ln(blk.ln_2, sd, f"{p}.ln_2")
        _set_conv1d(blk.mlp.c_fc, sd, f"{p}.mlp.c_fc")
        _set_conv1d(blk.mlp.c_proj, sd, f"{p}.mlp.c_proj")
    _set_ln(tr.ln_f, sd, f"{pfx}ln_f")


def from_pretrained_gpt2(path: str, dtype=None, *, rngs=None):
    """Build + load a GPT2LMHeadModel from a local HF dir."""
    import json
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models.gpt2 import GPT2LMHeadModel
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = gpt2_config_from_hf(hf, dtype=dtype)
    model = GPT2LMHeadModel(cfg, rngs=rngs or nnx.Rngs(0))
    load_gpt2(model, load_state_dict(path))
    return model


def backpack_gpt2_config_from_hf(hf: Dict, **overrides):
    """Map a Backpack-GPT-2 ``config.json`` (GPT-2 naming + num_senses /
    sense_intermediate_scale) onto a BackpackGPT2Config."""
    from sparse_matrix_fine_tuning_tpu.models.backpack_gpt2 import (
        BackpackGPT2Config)
    base = gpt2_config_from_hf(hf)
    kw = {f.name: getattr(base, f.name)
          for f in dataclasses.fields(base)}
    kw.update(
        num_senses=hf.get("num_senses", 16),
        sense_intermediate_scale=hf.get("sense_intermediate_scale", 4),
        scale_attn_by_inverse_layer_idx=hf.get(
            "scale_attn_by_inverse_layer_idx", True),
    )
    kw.update(overrides)
    return BackpackGPT2Config(**kw)


def load_backpack_gpt2(model, state_dict: Dict) -> None:
    """Populate a BackpackGPT2LMHeadModel from the reference Backpack state
    dict (modelings_backpack_gpt2.py key layout: ``backpack.gpt2_model.*``
    GPT-2 body, ``backpack.sense_network.*`` / ``backpack.sense_weight_net.*``
    heads; lm_head / word_embeddings are tied aliases of wte, never read)."""
    sd = state_dict
    bp = model.backpack
    gpt2 = bp.gpt2_model
    _set_embed(gpt2.wte, sd, "backpack.gpt2_model.wte.weight")
    _set_embed(gpt2.wpe, sd, "backpack.gpt2_model.wpe.weight")
    for i, blk in enumerate(gpt2.h):
        p = f"backpack.gpt2_model.h.{i}"
        _set_ln(blk.ln_1, sd, f"{p}.ln_1")
        _set_conv1d(blk.attn.c_attn, sd, f"{p}.attn.c_attn")
        _set_conv1d(blk.attn.c_proj, sd, f"{p}.attn.c_proj")
        _set_ln(blk.ln_2, sd, f"{p}.ln_2")
        _set_conv1d(blk.mlp.c_fc, sd, f"{p}.mlp.c_fc")
        _set_conv1d(blk.mlp.c_proj, sd, f"{p}.mlp.c_proj")
    _set_ln(gpt2.ln_f, sd, "backpack.gpt2_model.ln_f")
    sn = bp.sense_network
    _set_ln(sn.ln, sd, "backpack.sense_network.ln")
    _set_ln(sn.block.ln_1, sd, "backpack.sense_network.block.ln_1")
    _set_ln(sn.block.ln_2, sd, "backpack.sense_network.block.ln_2")
    _set_conv1d(sn.block.mlp.c_fc, sd, "backpack.sense_network.block.mlp.c_fc")
    _set_conv1d(sn.block.mlp.c_proj, sd,
                "backpack.sense_network.block.mlp.c_proj")
    _set_conv1d(sn.final_mlp.c_fc, sd, "backpack.sense_network.final_mlp.c_fc")
    _set_conv1d(sn.final_mlp.c_proj, sd,
                "backpack.sense_network.final_mlp.c_proj")
    # sense_weight_net.c_attn is an nn.Linear in the reference (the one
    # non-Conv1D projection), so it DOES transpose
    _set_linear(bp.sense_weight_net.c_attn, sd,
                "backpack.sense_weight_net.c_attn")


def from_pretrained_backpack_gpt2(path: str, dtype=None, *, rngs=None):
    """Build + load a BackpackGPT2LMHeadModel from a local checkpoint dir."""
    import json
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models.backpack_gpt2 import (
        BackpackGPT2LMHeadModel)
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = backpack_gpt2_config_from_hf(hf, dtype=dtype)
    model = BackpackGPT2LMHeadModel(cfg, rngs=rngs or nnx.Rngs(0))
    load_backpack_gpt2(model, load_state_dict(path))
    return model


def from_pretrained_causal_lm(path: str, dtype="bfloat16", *, rngs=None,
                              remat: bool = False,
                              remat_policy: str = "nothing",
                              param_dtype=None):
    """Model_type-routing loader for any supported decoder-only checkpoint
    dir: gpt2 -> GPT2LMHeadModel, llama/mistral/gemma/qwen2 ->
    LlamaForCausalLM.  The harnesses use this so ``--model /path`` accepts
    every causal-LM family (the reference gets this via HF
    AutoModelForCausalLM -- qlora_monarch.py:231, loreft/train.py:116).
    GPT-2 sizes never need remat, so those knobs are ignored for gpt2."""
    import json
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    if any("Backpack" in a for a in hf.get("architectures") or []):
        # Backpack configs keep model_type "gpt2" (the config class inherits
        # GPT2Config); the architectures list is the discriminator
        return from_pretrained_backpack_gpt2(path, dtype=dtype, rngs=rngs)
    if hf.get("model_type") == "gpt2":
        return from_pretrained_gpt2(path, dtype=dtype, rngs=rngs)
    if hf.get("model_type") == "gpt_neox":
        return from_pretrained_gpt_neox(path, dtype=dtype, rngs=rngs)
    if hf.get("model_type") == "gpt_neo":
        return from_pretrained_gpt_neo(path, dtype=dtype, rngs=rngs)
    return from_pretrained_llama(path, dtype=dtype, rngs=rngs, remat=remat,
                                 remat_policy=remat_policy,
                                 param_dtype=param_dtype)


def gpt_neox_config_from_hf(hf: Dict, **overrides):
    """Map an HF GPT-NeoX/Pythia ``config.json`` onto a GPTNeoXConfig."""
    from sparse_matrix_fine_tuning_tpu.models.gpt_neox import GPTNeoXConfig
    kw = dict(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        rotary_pct=hf.get("rotary_pct", 0.25),
        rope_theta=hf.get("rotary_emb_base", hf.get("rope_theta", 10000.0)),
        use_parallel_residual=hf.get("use_parallel_residual", True),
        hidden_act=hf.get("hidden_act", "gelu"),
        bos_token_id=hf.get("bos_token_id", 0),
        eos_token_id=hf.get("eos_token_id", 0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )
    kw["pad_token_id"] = hf.get("pad_token_id") or kw["eos_token_id"]
    kw.update(overrides)
    return GPTNeoXConfig(**kw)


def load_gpt_neox(model, state_dict: Dict) -> None:
    """Populate a GPTNeoXForCausalLM from an HF ``gpt_neox`` state dict
    (rotary inv_freq / causal-mask buffers are derived, never read)."""
    sd = state_dict
    nx = model.gpt_neox
    _set_embed(nx.embed_in, sd, "gpt_neox.embed_in.weight")
    for i, lyr in enumerate(nx.layers):
        p = f"gpt_neox.layers.{i}"
        _set_ln(lyr.input_layernorm, sd, f"{p}.input_layernorm")
        _set_ln(lyr.post_attention_layernorm, sd, f"{p}.post_attention_layernorm")
        _set_linear(lyr.attention.query_key_value, sd,
                    f"{p}.attention.query_key_value")
        _set_linear(lyr.attention.dense, sd, f"{p}.attention.dense")
        _set_linear(lyr.mlp.dense_h_to_4h, sd, f"{p}.mlp.dense_h_to_4h")
        _set_linear(lyr.mlp.dense_4h_to_h, sd, f"{p}.mlp.dense_4h_to_h")
    _set_ln(nx.final_layer_norm, sd, "gpt_neox.final_layer_norm")
    _set_linear(model.embed_out, sd, "embed_out")


def from_pretrained_gpt_neox(path: str, dtype=None, *, rngs=None):
    """Build + load a GPTNeoXForCausalLM from a local HF dir."""
    import json
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models.gpt_neox import GPTNeoXForCausalLM
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = gpt_neox_config_from_hf(hf, dtype=dtype)
    model = GPTNeoXForCausalLM(cfg, rngs=rngs or nnx.Rngs(0))
    load_gpt_neox(model, load_state_dict(path))
    return model


def gpt_neo_config_from_hf(hf: Dict, **overrides):
    """Map an HF GPT-Neo ``config.json`` (num_layers/num_heads naming,
    nested attention_types) onto a GPTNeoConfig."""
    from sparse_matrix_fine_tuning_tpu.models.gpt_neo import GPTNeoConfig
    layers = hf.get("attention_layers")
    if layers is None and hf.get("attention_types"):
        layers = []
        for types, n in hf["attention_types"]:
            layers += list(types) * n
    kw = dict(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf.get("num_layers", hf.get("num_hidden_layers", 24)),
        num_attention_heads=hf.get("num_heads", hf.get("num_attention_heads", 16)),
        intermediate_size=hf.get("intermediate_size"),
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        layer_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        attention_layers=tuple(layers) if layers else None,
        window_size=hf.get("window_size", 256),
        bos_token_id=hf.get("bos_token_id", 50256),
        eos_token_id=hf.get("eos_token_id", 50256),
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
    )
    kw["pad_token_id"] = hf.get("pad_token_id") or kw["eos_token_id"]
    kw.update(overrides)
    return GPTNeoConfig(**kw)


def load_gpt_neo(model, state_dict: Dict) -> None:
    """Populate a GPTNeoForCausalLM from an HF ``gpt_neo`` state dict (the
    HF module nests the self-attention as ``attn.attention``; here it is
    flat ``attention``)."""
    sd = state_dict
    tr = model.transformer
    _set_embed(tr.wte, sd, "transformer.wte.weight")
    _set_embed(tr.wpe, sd, "transformer.wpe.weight")
    for i, blk in enumerate(tr.h):
        p = f"transformer.h.{i}"
        _set_ln(blk.ln_1, sd, f"{p}.ln_1")
        _set_linear(blk.attention.q_proj, sd, f"{p}.attn.attention.q_proj")
        _set_linear(blk.attention.k_proj, sd, f"{p}.attn.attention.k_proj")
        _set_linear(blk.attention.v_proj, sd, f"{p}.attn.attention.v_proj")
        _set_linear(blk.attention.out_proj, sd, f"{p}.attn.attention.out_proj")
        _set_ln(blk.ln_2, sd, f"{p}.ln_2")
        _set_linear(blk.mlp.c_fc, sd, f"{p}.mlp.c_fc")
        _set_linear(blk.mlp.c_proj, sd, f"{p}.mlp.c_proj")
    _set_ln(tr.ln_f, sd, "transformer.ln_f")
    if model.lm_head is not None and "lm_head.weight" in sd:
        _set_linear(model.lm_head, sd, "lm_head")


def from_pretrained_gpt_neo(path: str, dtype=None, *, rngs=None):
    """Build + load a GPTNeoForCausalLM from a local HF dir."""
    import json
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models.gpt_neo import GPTNeoForCausalLM
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = gpt_neo_config_from_hf(hf, dtype=dtype)
    model = GPTNeoForCausalLM(cfg, rngs=rngs or nnx.Rngs(0))
    load_gpt_neo(model, load_state_dict(path))
    return model
