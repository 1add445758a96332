"""Chunked causal-LM cross-entropy: parity with the materialised loss.

The chunked path (ops/losses.py) must match ``LlamaForCausalLM.loss``
bit-closely in both value and gradients -- same fp32 logsumexp numerics,
same shifted-label + ignore_index + row-weight masking semantics -- while
never materialising the full (B, T, V) logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.ops.losses import chunked_causal_lm_loss


def _model_and_batch(seed=0, b=2, t=33, vocab=97, tie=False, loss_chunk=0):
    cfg = LlamaConfig.tiny(vocab_size=vocab, max_position_embeddings=64,
                           tie_word_embeddings=tie, loss_chunk=loss_chunk)
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(seed))
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, size=(b, t)).astype(np.int32)
    labels = ids.copy()
    labels[:, : t // 3] = -100          # masked prompt tokens
    labels[0, -2:] = -100               # ragged tail
    mask = np.ones((b, t), np.int32)
    return model, jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask)


@pytest.mark.parametrize("chunk", [7, 16, 1000])
@pytest.mark.parametrize("tie", [False, True])
def test_chunked_matches_materialised(chunk, tie):
    model, ids, labels, mask = _model_and_batch(tie=tie)
    hidden, _ = model.model(ids, mask)
    ref = model.loss(model.logits(hidden), labels)
    got = chunked_causal_lm_loss(hidden, model.logits, labels,
                                 chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_row_weights_match():
    model, ids, labels, mask = _model_and_batch(b=3, t=21)
    w = jnp.asarray([1, 0, 1], jnp.int32)
    hidden, _ = model.model(ids, mask)
    ref = model.loss(model.logits(hidden), labels, weights=w)
    got = chunked_causal_lm_loss(hidden, model.logits, labels, weights=w,
                                 chunk_size=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match_including_head():
    """Grads through BOTH the hidden states and the lm_head params must
    match the materialised path (head grads accumulate across scan chunks)."""
    model, ids, labels, mask = _model_and_batch()
    hidden, _ = model.model(ids, mask)
    kernel = model.lm_head.kernel[...]

    def ref_loss(h, k):
        logits = h @ k.astype(h.dtype)
        return model.loss(logits, labels)

    def chunked(h, k):
        return chunked_causal_lm_loss(
            h, lambda x: x @ k.astype(x.dtype), labels, chunk_size=8)

    r, (gh_r, gk_r) = jax.value_and_grad(ref_loss, argnums=(0, 1))(hidden, kernel)
    c, (gh_c, gk_c) = jax.value_and_grad(chunked, argnums=(0, 1))(hidden, kernel)
    np.testing.assert_allclose(np.asarray(c), np.asarray(r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gh_c), np.asarray(gh_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gk_r),
                               rtol=1e-5, atol=1e-6)


def test_training_loss_dispatch():
    """model.training_loss == model.loss(model(...)) for both settings of
    config.loss_chunk (the chunked flag changes memory, not numerics)."""
    for lc in (0, 8):
        model, ids, labels, mask = _model_and_batch(loss_chunk=lc)
        ref = model.loss(model(ids, attention_mask=mask), labels)
        got = model.training_loss(ids, labels, attention_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_all_masked_rows_safe():
    model, ids, labels, mask = _model_and_batch()
    labels = jnp.full_like(labels, -100)
    hidden, _ = model.model(ids, mask)
    got = chunked_causal_lm_loss(hidden, model.logits, labels, chunk_size=8)
    assert np.isfinite(np.asarray(got))
    assert np.asarray(got) == 0.0


@pytest.mark.parametrize("family", ["gpt2", "gpt_neo", "gpt_neox"])
def test_gpt_families_training_loss(family):
    """training_loss (incl. chunked) matches the materialised loss on the
    GPT-2 sibling families too."""
    if family == "gpt2":
        from sparse_matrix_fine_tuning_tpu.models.gpt2 import (
            GPT2Config as Cfg, GPT2LMHeadModel as Cls)
    elif family == "gpt_neo":
        from sparse_matrix_fine_tuning_tpu.models.gpt_neo import (
            GPTNeoConfig as Cfg, GPTNeoForCausalLM as Cls)
    else:
        from sparse_matrix_fine_tuning_tpu.models.gpt_neox import (
            GPTNeoXConfig as Cfg, GPTNeoXForCausalLM as Cls)
    cfg = Cfg.tiny(loss_chunk=8) if hasattr(Cfg, "tiny") else Cfg(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, loss_chunk=8)
    model = Cls(cfg, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 17)).astype(np.int32))
    labels = ids.at[:, :5].set(-100)
    mask = jnp.ones_like(ids)
    ref = model.loss(model(ids, attention_mask=mask), labels)
    got = model.training_loss(ids, labels, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
