"""End-to-end checkpoint-DIRECTORY loading: HF ``save_pretrained`` output on
disk -> ``from_pretrained_llama`` (config.json model_type mapping +
safetensors tensor conversion) -> logit parity.

This is the exact path the harnesses take with real weights
(run_alpaca.py/run_reasoning.py ``--model /path``; the reference loads the
same dirs through HF from_pretrained -- qlora_monarch.py:231,
loreft/train.py:116).  The live-state-dict parity tests (test_hf_parity.py)
skip ``load_state_dict``/config-file parsing entirely; this one certifies
them.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
    from_pretrained_llama,
)

FAMILIES = {
    "llama": lambda: transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, attn_implementation="eager"),
    "mistral": lambda: transformers.MistralConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, sliding_window=5,
        attn_implementation="eager"),
    "gemma": lambda: transformers.GemmaConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=1, head_dim=16,
        intermediate_size=64, max_position_embeddings=128,
        attn_implementation="eager"),
    "qwen2": lambda: transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, attn_implementation="eager"),
}

HF_CLS = {
    "llama": "LlamaForCausalLM", "mistral": "MistralForCausalLM",
    "gemma": "GemmaForCausalLM", "qwen2": "Qwen2ForCausalLM",
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_checkpoint_dir_roundtrip(tmp_path, family):
    hf_cfg = FAMILIES[family]()
    torch.manual_seed(0)
    hf_model = getattr(transformers, HF_CLS[family])(hf_cfg).eval()
    ckpt = tmp_path / family
    hf_model.save_pretrained(ckpt)  # config.json + model.safetensors

    model = from_pretrained_llama(str(ckpt), dtype=None,
                                  param_dtype="float32")
    model.eval()
    assert model.config.vocab_size == hf_cfg.vocab_size
    if family == "mistral":
        assert model.config.sliding_window == 5
    if family == "gemma":
        assert model.config.rmsnorm_unit_offset and model.lm_head is None

    ids = np.random.default_rng(5).integers(2, hf_cfg.vocab_size,
                                            size=(2, 12))
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
