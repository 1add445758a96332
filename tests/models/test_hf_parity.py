"""Numerical parity of the NNX models vs HF transformers (torch, CPU).

Tiny random HF models are instantiated offline from config, converted via
hf_convert, and logits compared -- validating both the architecture and the
weight mapping without any network access.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import (
    LlamaConfig,
    LlamaForCausalLM,
    RobertaConfig,
    RobertaForSequenceClassification,
)
from sparse_matrix_fine_tuning_tpu.models.hf_convert import load_llama, load_roberta
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


def test_roberta_matches_hf():
    hf_cfg = transformers.RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        num_labels=3, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf_model = transformers.RobertaForSequenceClassification(hf_cfg).eval()

    cfg = RobertaConfig.tiny(num_labels=3, hidden_dropout_prob=0.0,
                             attention_probs_dropout_prob=0.0)
    model = fresh_model(RobertaForSequenceClassification, cfg)
    load_roberta(model, {k: v for k, v in hf_model.state_dict().items()})
    model.eval()

    ids = np.random.default_rng(0).integers(2, 128, size=(2, 10))
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask)).logits.numpy()
    ours = np.asarray(model(jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, hf_out, rtol=2e-3, atol=2e-3)


def test_llama_matches_hf():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, rms_norm_eps=1e-5, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    load_llama(model, {k: v for k, v in hf_model.state_dict().items()})
    model.eval()

    ids = np.random.default_rng(1).integers(2, 256, size=(2, 12))
    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(ours, hf_out, rtol=3e-3, atol=3e-3)


def _family_parity(hf_model, hf_cfg, seq_len=12, rtol=3e-3, atol=3e-3):
    """Convert an HF decoder-only model via the model_type-aware mapper and
    compare fp32 logits."""
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
        causal_lm_config_from_hf)
    cfg = causal_lm_config_from_hf(hf_cfg.to_dict())
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    load_llama(model, {k: v for k, v in hf_model.state_dict().items()})
    model.eval()
    ids = np.random.default_rng(2).integers(2, hf_cfg.vocab_size,
                                            size=(2, seq_len))
    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(ours, hf_out, rtol=rtol, atol=atol)


def test_mistral_matches_hf():
    # sliding_window=5 < seq_len=12 so the local mask actually bites
    hf_cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, sliding_window=5,
        attn_implementation="eager")
    torch.manual_seed(0)
    _family_parity(transformers.MistralForCausalLM(hf_cfg).eval(), hf_cfg)


def test_gemma_matches_hf():
    # head_dim (16) decoupled from hidden/heads (32/4=8), GeGLU, (1+w)
    # RMSNorm, sqrt(hidden)-scaled embeddings, tied lm_head
    hf_cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=1, head_dim=16,
        intermediate_size=64, max_position_embeddings=128,
        attn_implementation="eager")
    torch.manual_seed(0)
    _family_parity(transformers.GemmaForCausalLM(hf_cfg).eval(), hf_cfg)


def test_qwen2_matches_hf():
    # qkv biases present, o_proj bias-free
    hf_cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, attn_implementation="eager")
    torch.manual_seed(0)
    _family_parity(transformers.Qwen2ForCausalLM(hf_cfg).eval(), hf_cfg)


def test_deberta_matches_hf():
    hf_cfg = transformers.DebertaV2Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=0,
        relative_attention=True, position_buckets=8,
        pos_att_type=["p2c", "c2p"], share_att_key=True,
        norm_rel_ebd="layer_norm", position_biased_input=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pooler_dropout=0.0, num_labels=3, pad_token_id=0)
    torch.manual_seed(0)
    hf_model = transformers.DebertaV2ForSequenceClassification(hf_cfg).eval()

    from sparse_matrix_fine_tuning_tpu.models.deberta import (
        DebertaV2Config, DebertaV2ForSequenceClassification)
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import load_deberta

    cfg = DebertaV2Config.tiny(num_labels=3, hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    model = fresh_model(DebertaV2ForSequenceClassification, cfg)
    load_deberta(model, {k: v for k, v in hf_model.state_dict().items()})
    model.eval()

    rng = np.random.default_rng(3)
    ids = rng.integers(2, 128, size=(2, 12))
    mask = np.ones_like(ids)
    mask[1, 9:] = 0  # exercise the 2D mask path
    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask)).logits.numpy()
    import jax.numpy as jnp
    ours = np.asarray(model(jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, hf_out, rtol=3e-3, atol=3e-3)
